"""Out-of-loop postprocessor (deblock + dering), batched numpy.

Capability twin of the reference's optional postprocessor
(decode.c:1610-1957), redesigned as whole-plane array passes instead of
the reference's interleaved per-block raster walk:

* **Deblock** runs in two phases.  Phase H filters every horizontal
  block boundary at once: boundaries are independent because they read
  the unfiltered source and write a separate destination.  Phase V then
  sweeps vertical boundaries column-strip by column-strip (left to
  right, vectorized over all rows); the sweep order matters because
  vertical filtering is in-place and a boundary reads one column that
  the boundary 8px to its left may have written.  The 10-sample
  boundary smoother is expressed as what it actually is: a 7-tap
  [1,1,1,2,1,1,1] convolution over the replicate-padded window,
  emitting the middle 8 samples.  (The reference unrolls the padded
  taps into 4 distinct expressions per side; the convolution form is
  equivalent and vectorizes.)

* **Dering** is a weighted 4-neighbour IIR smoother whose weights are
  derived from the block's pre-pass pixel gradients.  In-block and
  cross-block data flow is strictly "north/west filtered, south/east
  original", so blocks on the same anti-diagonal (by+bx == const) are
  independent; we process one anti-diagonal of blocks at a time,
  vectorized, and inside a block run the 15-step pixel anti-diagonal
  wavefront.  Border replication at the plane edge is handled by
  extracting each block's 10x10 neighbourhood from an edge-padded
  plane, which removes the per-side special cases entirely.

Bit-exact against the reference decoder's postprocessor output
(tests/test_decode.py::test_postprocessor_bit_exact).
"""
from __future__ import annotations

import numpy as np

# Dering block-selection thresholds on the deblock variance sums
# (decode.c:1966-1977 semantics).
_T1 = 384
_T2 = 4 * _T1
_T3 = 5 * _T1
_T4 = 10 * _T1


def _tap7(window: np.ndarray) -> np.ndarray:
    """[..., 10] boundary window -> [..., 8] smoothed samples.

    Replicate-pad the 10-sample window by 2 on each side and convolve
    with [1,1,1,2,1,1,1] (sum 8, +4 rounding, >>3)."""
    p = np.concatenate(
        [window[..., :1], window[..., :1], window,
         window[..., -1:], window[..., -1:]], axis=-1)
    acc = 2 * p[..., 3:11]
    for t in (0, 1, 2, 4, 5, 6):
        acc = acc + p[..., t : t + 8]
    return (acc + 4) >> 3


def _edge_stats(window: np.ndarray):
    """Per-boundary activity sums over a [..., 10] window: the first four
    absolute neighbour differences (outer side) and the last four
    (inner side)."""
    d = np.abs(np.diff(window, axis=-1))
    return d[..., 0:4].sum(axis=-1), d[..., 5:9].sum(axis=-1)


def deblock_plane(src: np.ndarray, dc_qis: np.ndarray,
                  dc_scale_table: np.ndarray):
    """Deblock one plane.

    src: [h, w] uint8 (h, w multiples of 8); dc_qis: [nv, nh] uint8 last
    DC qi per block; dc_scale_table: [64] int.  Returns (dst, variances)
    where variances is the [nv, nh] int32 activity accumulator the
    dering stage selects blocks with.
    """
    h, w = src.shape
    nv, nh = h >> 3, w >> 3
    s32 = src.astype(np.int32)
    dst = src.copy()
    variances = np.zeros((nv, nh), dtype=np.int32)
    qstep_b = dc_scale_table[dc_qis].astype(np.int32)  # [nv, nh]

    # --- Phase H: all horizontal boundaries, src -> dst. -------------
    if nv > 1:
        k = np.arange(nv - 1)
        rows = (k << 3)[:, None] + 3 + np.arange(10)[None, :]  # [nv-1,10]
        win = np.swapaxes(s32[rows], 1, 2)  # [nv-1, w, 10]
        outer, inner = _edge_stats(win)  # [nv-1, w] each
        variances[:-1] += np.minimum(outer, 255).reshape(nv - 1, nh, 8).sum(2)
        variances[1:] += np.minimum(inner, 255).reshape(nv - 1, nh, 8).sum(2)
        q = np.repeat(qstep_b[:-1], 8, axis=1)  # block above the boundary
        ok = ((outer < (q * 3) >> 2) & (inner < (q * 3) >> 2)
              & (np.abs(win[..., 5] - win[..., 4]) < q))
        sm = _tap7(win)  # [nv-1, w, 8]
        body = np.where(ok[..., None], sm, win[..., 1:9])
        wrows = (k << 3)[:, None] + 4 + np.arange(8)[None, :]
        dst[wrows] = np.swapaxes(body, 1, 2).astype(np.uint8)

    # --- Phase V: vertical boundaries, in-place, left to right. ------
    for bx in range(1, nh):
        x = bx << 3
        win = dst[:, x - 5 : x + 5].astype(np.int32)  # [h, 10]
        outer, inner = _edge_stats(win)
        variances[:, bx - 1] += np.minimum(outer, 255).reshape(nv, 8).sum(1)
        variances[:, bx] += np.minimum(inner, 255).reshape(nv, 8).sum(1)
        q = np.repeat(qstep_b[:, bx], 8)  # block right of the boundary
        ok = ((outer < (q * 3) >> 2) & (inner < (q * 3) >> 2)
              & (np.abs(win[:, 5] - win[:, 4]) < q))
        sm = _tap7(win)
        dst[:, x - 4 : x + 4] = np.where(
            ok[:, None], sm, win[:, 1:9]).astype(np.uint8)
    return dst, variances


def _neighbour_weights(g: np.ndarray, dc: np.ndarray, sharp: np.ndarray,
                       mod_hi: np.ndarray, shift: np.ndarray):
    """Dering weights from a [K, 10, 10] neighbourhood stack.

    Returns (vw, hw): vw[k, i, j] weighs the edge between rows i-1 and i
    of the padded grid at interior column j; hw[k, i, j] the edge
    between columns j-1 and j at interior row i.  Weight of an absolute
    difference d is clamp(32 + dc - (d << shift), 0, mod_hi), except
    that values below -64 select the (negative) sharpening weight."""
    def wf(d):
        m = 32 + dc - (d << shift)
        return np.where(m < -64, sharp, np.clip(m, 0, mod_hi))

    vw = wf(np.abs(g[:, 1:, 1:9] - g[:, :-1, 1:9]))  # [K, 9, 8]
    hw = wf(np.abs(g[:, 1:9, 1:] - g[:, 1:9, :-1]))  # [K, 8, 9]
    return vw, hw


def _diag_indices():
    """Flat index tables for the 15 pixel anti-diagonals of an 8x8
    block: per diagonal, the positions of (centre, N, W, S, E) in the
    flattened [10, 10] grid and of the four edge weights in the
    flattened vw [9, 8] / hw [8, 9] tables."""
    out = []
    for d in range(15):
        ys = np.arange(max(0, d - 7), min(7, d) + 1)
        xs = d - ys
        out.append((
            (ys + 1) * 10 + xs + 1,      # centre
            ys * 10 + xs + 1,            # north
            (ys + 1) * 10 + xs,          # west
            (ys + 2) * 10 + xs + 1,      # south
            (ys + 1) * 10 + xs + 2,      # east
            ys * 8 + xs,                 # wn in vw
            (ys + 1) * 8 + xs,           # ws in vw
            ys * 9 + xs,                 # ww in hw
            ys * 9 + xs + 1,             # we in hw
        ))
    return out


_DIAGS = _diag_indices()


def _dering_pass(g: np.ndarray, dc, sharp, mod_hi, shift) -> np.ndarray:
    """One dering pass over a [K, 10, 10] stack; returns the updated
    stack (interior rewritten, borders preserved)."""
    vw, hw = _neighbour_weights(g, dc, sharp, mod_hi, shift)
    vw = vw.reshape(len(g), 72)
    hw = hw.reshape(len(g), 72)
    cur = g.reshape(len(g), 100)
    out = cur.copy()
    for ic, inn, iw, iso, ie, iwn, iws, iww, iwe in _DIAGS:
        wn = vw[:, iwn]
        ws = vw[:, iws]
        ww = hw[:, iww]
        we = hw[:, iwe]
        acc = ((128 - wn - ws - ww - we) * cur[:, ic] + 64
               + wn * out[:, inn] + ww * out[:, iw]
               + ws * cur[:, iso] + we * cur[:, ie])
        out[:, ic] = np.clip(acc >> 7, 0, 255)
    return out.reshape(g.shape)


def dering_plane(plane: np.ndarray, qi_per_frag: np.ndarray,
                 dc_scale_table: np.ndarray, sharp_table: np.ndarray,
                 variances: np.ndarray, strong_level: bool,
                 pli: int) -> None:
    """Dering one plane in place.

    plane: [h, w] uint8 post-deblock; qi_per_frag: [nv, nh] frame qi per
    block; variances: [nv, nh] from deblock_plane.  strong_level: the pp
    level requested strong dering for this plane.
    """
    h, w = plane.shape
    nv, nh = h >> 3, w >> 3
    var = variances

    # Pass plan per block: 0 = skip, else (npasses, strong?).
    npass = np.zeros((nv, nh), dtype=np.int32)
    strong = np.zeros((nv, nh), dtype=bool)
    if strong_level:
        hit = var > (_T4 if pli else _T3)
        if pli:
            ring = np.ones((nv, nh), dtype=bool)
        else:
            ring = np.zeros((nv, nh), dtype=bool)
            ring[:, 1:] |= var[:, :-1] > _T4
            ring[:, :-1] |= var[:, 1:] > _T4
            ring[1:, :] |= var[:-1, :] > _T4
            ring[:-1, :] |= var[1:, :] > _T4
        npass[hit] = np.where(ring[hit], 3, 1)
        strong |= hit
        rest = ~hit
    else:
        rest = np.ones((nv, nh), dtype=bool)
    m = rest & (var > _T2)
    npass[m] = 1
    strong |= m
    m = rest & ~m & (var > _T1)
    npass[m] = 1
    if not npass.any():
        return

    qs = dc_scale_table[qi_per_frag].astype(np.int32)
    sharp = sharp_table[qi_per_frag].astype(np.int32)
    mod_hi = np.minimum(3 * qs, np.where(strong, 32, 24))
    shift = np.where(strong, 0, 1)

    # Dependency waves: a filtered block reads the *final* pixels of
    # filtered blocks above/left of it and the *initial* pixels of
    # blocks below/right, so adjacent filtered blocks must run
    # north/west-first.  wave = longest such chain; blocks in the same
    # wave are independent and run batched.  (With sparse filtering
    # most blocks land in wave 0.)
    wave = np.full((nv, nh), -1, dtype=np.int32)
    by_all, bx_all = np.nonzero(npass)
    for by, bx in zip(by_all.tolist(), bx_all.tolist()):
        up = wave[by - 1, bx] if by else -1
        lf = wave[by, bx - 1] if bx else -1
        wave[by, bx] = max(up, lf) + 1

    waves = wave[by_all, bx_all]
    order = np.argsort(waves, kind="stable")
    by_all, bx_all, waves = by_all[order], bx_all[order], waves[order]
    starts = np.searchsorted(waves, np.arange(waves[-1] + 2))

    from numpy.lib.stride_tricks import sliding_window_view

    for d in range(int(waves[-1]) + 1):
        lo, hi = starts[d], starts[d + 1]
        bys, bxs = by_all[lo:hi], bx_all[lo:hi]
        padded = np.pad(plane, 1, mode="edge")
        g = sliding_window_view(padded, (10, 10))[bys << 3, bxs << 3]
        g = np.ascontiguousarray(g, dtype=np.int32)
        dcd = qs[bys, bxs][:, None, None]
        shd = sharp[bys, bxs][:, None, None]
        mhd = mod_hi[bys, bxs][:, None, None]
        sfd = shift[bys, bxs][:, None, None]
        np_d = npass[bys, bxs]
        top, bot = bys == 0, bys == nv - 1
        left, right = bxs == 0, bxs == nh - 1
        for p in range(int(np_d.max())):
            act = np.nonzero(np_d > p)[0]
            g[act] = _dering_pass(g[act], dcd[act], shd[act],
                                  mhd[act], sfd[act])
            # Refresh replicated borders of plane-edge blocks so the
            # next pass sees its own updated pixels there.
            g[act[top[act]], 0] = g[act[top[act]], 1]
            g[act[bot[act]], 9] = g[act[bot[act]], 8]
            g[act[left[act]], :, 0] = g[act[left[act]], :, 1]
            g[act[right[act]], :, 9] = g[act[right[act]], :, 8]
        blocks = g[:, 1:9, 1:9].astype(np.uint8)
        for i in range(len(bys)):
            y, x = int(bys[i]) << 3, int(bxs[i]) << 3
            plane[y : y + 8, x : x + 8] = blocks[i]


def postprocess_plane(src: np.ndarray, dc_qis: np.ndarray,
                      qi_per_frag: np.ndarray, dc_scale_table: np.ndarray,
                      sharp_table: np.ndarray, dering: bool,
                      strong: bool, pli: int) -> np.ndarray:
    """Deblock (always) then optionally dering one plane; returns the
    new plane."""
    dst, variances = deblock_plane(src, dc_qis, dc_scale_table)
    if dering:
        dering_plane(dst, qi_per_frag, dc_scale_table, sharp_table,
                     variances, strong, pli)
    return dst
