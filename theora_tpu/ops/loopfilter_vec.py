"""Exact-order VECTORIZED loop filter.

The reference applies edge filters in a strange sequential order
(state.c:1078-1104): per fragment in raster order -- left edge, top edge,
right edge (if right neighbor uncoded), bottom edge (if below uncoded) --
and filters read pixels earlier filters wrote. This module reproduces that
order exactly while vectorizing across a whole fragment row, by decomposing
each row's filters into phases whose cross-couplings only ever need either
snapshot values or values computable independently of the apparent chain:

Per fragment row r (pixel rows y0=8r..y0+7), with
  h(c)  = vertical-edge filter E_v(r,c) (fires iff coded(r,c)|coded(r,c-1)),
  vL(c) = horizontal-edge filter E_h(r,c) fired late (iff coded(r,c), r>0),
  vE(c) = E_h(r+1,c) fired early/bottom (iff coded(r,c)&!coded(r+1,c)),
the true emission order interleaves ... h(c), vL(c), vE(c), h(c+1) ...
Analysis of the read/write sets shows:
  - h rows y0+1..y0+6 touch nothing any same-row filter writes (phase P1).
  - The row-y0 chain h(c) <- vL(c-1) <- h(c-1) dissolves: vL's outputs at
    its two rightmost columns depend only on pre-row (snapshot) values, and
    h's row-y0 inputs at its two right columns are snapshot values.
  - The row-y0+7 chain has one data-dependent ordering: whether E_v(r,c)
    fired left (at c, after vE(c-1)) or right (at c-1, before vE(c-1)),
    selected by coded(r,c); both orders are computed and masked.
Validated by exhaustive fuzzing against the scalar-order implementation.
"""
from __future__ import annotations

import numpy as np


def _resp(f: np.ndarray, bv: np.ndarray) -> np.ndarray:
    return bv[((f + 4) >> 3) + 127]


def _f(p0, p1, p2, p3):
    return (
        p0.astype(np.int32)
        - p3.astype(np.int32)
        + 3 * (p2.astype(np.int32) - p1.astype(np.int32))
    )


def _clamp(x):
    return np.clip(x, 0, 255)


def loop_filter_plane_vec(
    plane: np.ndarray, coded: np.ndarray, bv: np.ndarray,
    r0: int = 0, r1: int | None = None,
) -> None:
    """In-place loop filter of one padded plane, bit-exact with
    loop_filter_plane (theora_tpu/ops/loopfilter_np.py).

    `r0`/`r1` restrict processing to fragment rows [r0, r1); calling with
    contiguous ranges reproduces the full-plane result exactly (the outer
    loop is sequential in r), which is what striped decode uses
    (decode.c:2858-2943 delivers rows incrementally with a one-row filter
    delay)."""
    nv, nh = coded.shape
    if r1 is None:
        r1 = nv
    # Vertical and horizontal UMV paddings differ on 4:2:2 chroma planes
    # (16 vs 8, state.c:778-809) -- derive each from its own axis.
    pad = (plane.shape[1] - nh * 8) // 2
    vpad = (plane.shape[0] - nv * 8) // 2
    W = plane.shape[1]
    for r in range(r0, r1):
        y0 = vpad + r * 8
        row = coded[r]
        # Edge firing masks.
        hfire = np.zeros(nh, dtype=bool)          # E_v(r,c), c>=1
        hfire[1:] = row[1:] | row[:-1]
        left_fired = np.zeros(nh, dtype=bool)     # h(c) fired at step c
        left_fired[1:] = row[1:]
        vL = row.copy() if r > 0 else np.zeros(nh, dtype=bool)
        vE = (
            row & ~coded[r + 1] if r + 1 < nv else np.zeros(nh, dtype=bool)
        )
        if not (hfire.any() or vL.any() or vE.any()):
            continue

        S0 = plane[y0, :].copy()       # snapshots (pre-row values)
        S1 = plane[y0 + 1, :].copy()
        S6 = plane[y0 + 6, :].copy()
        S7 = plane[y0 + 7, :].copy()

        ecols = pad + 8 * np.arange(nh)   # x of each fragment's left edge

        # ---- P1: h filters, rows y0+1..y0+6 -------------------------------
        hc = np.where(hfire)[0]
        if len(hc) > 0:
            x = ecols[hc]
            rows = plane[y0 + 1 : y0 + 7, :]
            f = _f(
                rows[:, x - 2], rows[:, x - 1], rows[:, x], rows[:, x + 1]
            )
            rsp = _resp(f, bv)
            rows[:, x - 1] = _clamp(rows[:, x - 1].astype(np.int32) + rsp)
            rows[:, x] = _clamp(rows[:, x].astype(np.int32) - rsp)

        # ---- Chain A: row y0 (h row 0 + vL) -------------------------------
        # vL border outputs at columns 8c+6, 8c+7 (needed by h(c+1)).
        # Inputs: rows y0-2, y0-1 current; rows y0, y0+1 snapshot.
        vb_out6 = vb_out7 = None
        vlc = np.where(vL)[0]
        if len(vlc) > 0:
            for off, store in ((6, "o6"), (7, "o7")):
                x = ecols[vlc] + off
                f = _f(
                    plane[y0 - 2, x], plane[y0 - 1, x], S0[x], S1[x]
                )
                rsp = _resp(f, bv)
                o_m1 = _clamp(plane[y0 - 1, x].astype(np.int32) + rsp)
                o_0 = _clamp(S0[x].astype(np.int32) - rsp)
                if off == 6:
                    vb_out6 = (x, o_m1, o_0)
                else:
                    vb_out7 = (x, o_m1, o_0)

        # h row-y0 filters: inputs col 8c-2, 8c-1 post-vL(c-1), cols 8c,
        # 8c+1 snapshot.
        h0_out = None
        if len(hc) > 0:
            x = ecols[hc]
            in_m2 = S0[x - 2].astype(np.int32)
            in_m1 = S0[x - 1].astype(np.int32)
            # Patch with vL(c-1) outputs where it fired.
            prev_fired = np.zeros(nh, dtype=bool)
            prev_fired[1:] = vL[:-1]
            m = prev_fired[hc]
            if m.any() and len(vlc) > 0:
                # map: for h at c, vL(c-1) border cols are 8(c-1)+6=8c-2 and
                # 8c-1.
                lookup6 = np.full(W, -1, dtype=np.int64)
                lookup6[vb_out6[0]] = np.arange(len(vlc))
                idx = lookup6[x[m] - 2]
                in_m2[m] = vb_out6[2][idx]      # row y0 output at col 8c-2
                lookup7 = np.full(W, -1, dtype=np.int64)
                lookup7[vb_out7[0]] = np.arange(len(vlc))
                idx7 = lookup7[x[m] - 1]
                in_m1[m] = vb_out7[2][idx7]     # row y0 output at col 8c-1
            f = _f(in_m2, in_m1, S0[x], S0[x + 1])
            rsp = _resp(f, bv)
            h0_out = (
                x,
                _clamp(in_m1 + rsp),            # col 8c-1
                _clamp(S0[x].astype(np.int32) - rsp),  # col 8c
            )

        # vL full application.
        if len(vlc) > 0:
            x0 = ecols[vlc]
            cols = x0[:, None] + np.arange(8)[None, :]
            r_m2 = plane[y0 - 2, :][cols].astype(np.int32)
            r_m1 = plane[y0 - 1, :][cols].astype(np.int32)
            r_0 = S0[cols].astype(np.int32)
            r_1 = S1[cols].astype(np.int32)
            # col 8c: post h(c) (row y0 from h0_out, row y0+1 from P1).
            if h0_out is not None:
                lookup = np.full(W, -1, dtype=np.int64)
                lookup[h0_out[0]] = np.arange(len(hc))
                hidx = lookup[x0]
                hm = hidx >= 0
                r_0[hm, 0] = h0_out[2][hidx[hm]]
            r_1[:, 0] = plane[y0 + 1, x0]  # post-P1 current value
            f = _f(r_m2, r_m1, r_0, r_1)
            rsp = _resp(f, bv)
            out_m1 = _clamp(r_m1 + rsp)
            out_0 = _clamp(r_0 - rsp)
            # Apply: vL writes rows y0-1 and y0.
            plane[y0 - 1, :][cols] = out_m1
            plane[y0, :][cols] = out_0
        # Apply h row-y0 writes: col 8c-1 always wins over vL(c-1); col 8c
        # loses to vL(c) (only write where vL(c) not fired).
        if h0_out is not None:
            x = h0_out[0]
            plane[y0, x - 1] = h0_out[1]
            keep = ~vL[hc]
            plane[y0, x[keep]] = h0_out[2][keep]

        # ---- Chain B: row y0+7 (h row 7 + vE) -----------------------------
        vec = np.where(vE)[0]
        # hrow7 with snapshot inputs (right-fired variant).
        h7_S = None
        if len(hc) > 0:
            x = ecols[hc]
            f = _f(S7[x - 2], S7[x - 1], S7[x], S7[x + 1])
            rsp = _resp(f, bv)
            h7_S = (
                x,
                _clamp(S7[x - 1].astype(np.int32) + rsp),
                _clamp(S7[x].astype(np.int32) - rsp),
            )
        # vE border outputs at cols 8c+6 (static) and 8c+7 (masked).
        ve_out6 = ve_out7 = None
        if len(vec) > 0:
            x = ecols[vec] + 6
            f = _f(S6[x], S7[x], plane[y0 + 8, x], plane[y0 + 9, x])
            rsp = _resp(f, bv)
            ve_out6 = (
                x,
                _clamp(S7[x].astype(np.int32) + rsp),
                _clamp(plane[y0 + 8, x].astype(np.int32) - rsp),
            )
            # col 8c+7: inputs depend on whether h(c+1) fired right
            # (!coded(r,c+1): post-h values) or left (snapshot).
            x7 = ecols[vec] + 7
            nxt_coded = np.zeros(len(vec), dtype=bool)
            in_range = vec + 1 < nh
            nxt_coded[in_range] = row[np.minimum(vec + 1, nh - 1)][in_range]
            # pre (snapshot) inputs:
            in6_pre = S6[x7].astype(np.int32)
            in7_pre = S7[x7].astype(np.int32)
            # post inputs: row y0+6 current (post-P1), row y0+7 from h7_S of
            # edge c+1.
            in6_post = plane[y0 + 6, x7].astype(np.int32)
            in7_post = in7_pre.copy()
            if h7_S is not None:
                lookup = np.full(W, -1, dtype=np.int64)
                lookup[h7_S[0]] = np.arange(len(hc))
                # h(c+1) left edge col is 8(c+1) = x7+1; its col-(8c+7)
                # output is h7_S[1] (the "col-1" output).
                hidx = lookup[np.minimum(x7 + 1, W - 1)]
                hm = (hidx >= 0) & ~nxt_coded
                in7_post[hm] = h7_S[1][hidx[hm]]
            use_post = ~nxt_coded
            in6 = np.where(use_post, in6_post, in6_pre)
            in7 = np.where(use_post, in7_post, in7_pre)
            f = _f(in6, in7, plane[y0 + 8, x7], plane[y0 + 9, x7])
            rsp = _resp(f, bv)
            ve_out7 = (
                x7,
                _clamp(in7 + rsp),
                _clamp(plane[y0 + 8, x7].astype(np.int32) - rsp),
            )
        # hrow7 with post-vE(c-1) inputs (left-fired variant).
        h7_final = None
        if len(hc) > 0:
            x = ecols[hc]
            in_m2 = S7[x - 2].astype(np.int32)
            in_m1 = S7[x - 1].astype(np.int32)
            prev_ve = np.zeros(nh, dtype=bool)
            prev_ve[1:] = vE[:-1]
            m = prev_ve[hc] & left_fired[hc]
            if m.any() and len(vec) > 0:
                lookup6 = np.full(W, -1, dtype=np.int64)
                lookup6[ve_out6[0]] = np.arange(len(vec))
                idx = lookup6[x[m] - 2]
                in_m2[m] = ve_out6[1][idx]      # row y0+7 output
                lookup7 = np.full(W, -1, dtype=np.int64)
                lookup7[ve_out7[0]] = np.arange(len(vec))
                idx7 = lookup7[x[m] - 1]
                in_m1[m] = ve_out7[1][idx7]
            f = _f(in_m2, in_m1, S7[x], S7[x + 1])
            rsp = _resp(f, bv)
            o1 = _clamp(in_m1 + rsp)
            o0 = _clamp(S7[x].astype(np.int32) - rsp)
            # Select: left-fired -> post variant; right-fired -> S variant.
            lf = left_fired[hc]
            h7_final = (
                x,
                np.where(lf, o1, h7_S[1]),
                np.where(lf, o0, h7_S[2]),
            )
        # vE full application.
        if len(vec) > 0:
            x0 = ecols[vec]
            cols = x0[:, None] + np.arange(8)[None, :]
            r_6 = S6[cols].astype(np.int32)
            r_7 = S7[cols].astype(np.int32)
            r_8 = plane[y0 + 8, :][cols].astype(np.int32)
            r_9 = plane[y0 + 9, :][cols].astype(np.int32)
            # col 8c: post h(c): row y0+6 post-P1, row y0+7 from h7_final.
            r_6[:, 0] = plane[y0 + 6, x0]
            if h7_final is not None:
                lookup = np.full(W, -1, dtype=np.int64)
                lookup[h7_final[0]] = np.arange(len(hc))
                hidx = lookup[x0]
                hm = hidx >= 0
                r_7[hm, 0] = h7_final[2][hidx[hm]]
            # col 8c+7: masked pre/post (same mask as border calc).
            nxt_coded = np.zeros(len(vec), dtype=bool)
            in_range = vec + 1 < nh
            nxt_coded[in_range] = row[np.minimum(vec + 1, nh - 1)][in_range]
            use_post = ~nxt_coded
            r_6[:, 7] = np.where(use_post, plane[y0 + 6, x0 + 7], S6[x0 + 7])
            if h7_final is not None:
                lookup = np.full(W, -1, dtype=np.int64)
                lookup[h7_final[0]] = np.arange(len(hc))
                hidx = lookup[np.minimum(x0 + 8, W - 1)]
                hm = (hidx >= 0) & use_post
                r_7[hm, 7] = h7_final[1][hidx[hm]]
            f = _f(r_6, r_7, r_8, r_9)
            rsp = _resp(f, bv)
            out_7 = _clamp(r_7 + rsp)
            out_8 = _clamp(r_8 - rsp)
            plane[y0 + 7, :][cols] = out_7
            plane[y0 + 8, :][cols] = out_8
        # Apply h row-y0+7 writes: col 8c-1 wins over vE(c-1) iff left-fired;
        # col 8c loses to vE(c) when vE(c) fired.
        if h7_final is not None:
            x = h7_final[0]
            lf = left_fired[hc]
            prev_ve = np.zeros(nh, dtype=bool)
            prev_ve[1:] = vE[:-1]
            pv = prev_ve[hc]
            # col 8c-1: write unless (right-fired and vE(c-1) fired) -- in
            # that case vE(c-1) came after and wins.
            keep_m1 = ~(pv & ~lf)
            plane[y0 + 7, x[keep_m1] - 1] = h7_final[1][keep_m1]
            keep_0 = ~vE[hc]
            plane[y0 + 7, x[keep_0]] = h7_final[2][keep_0]
