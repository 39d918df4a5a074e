"""JAX/TPU port of the exact-order vectorized loop filter.

Same phase decomposition as ops/loopfilter_vec.py (see its docstring for the
derivation), restructured for static shapes: every per-edge quantity is
computed for ALL fragment columns and applied through masks, and fragment
rows advance through a lax.scan carrying the padded plane. Bit-exact with
the scalar VP3 edge ordering (state.c:1055-1105); validated against the
numpy implementation by fuzzing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _resp(f, bv):
    return bv[((f + 4) >> 3) + 127]


def _f4(p0, p1, p2, p3):
    return (
        p0.astype(jnp.int32)
        - p3.astype(jnp.int32)
        + 3 * (p2.astype(jnp.int32) - p1.astype(jnp.int32))
    )


def _clamp(x):
    return jnp.clip(x, 0, 255)


@functools.partial(jax.jit, static_argnames=("nv", "nh", "pad_y", "pad_x"))
def loop_filter_plane_jax(plane, coded, bv, nv, nh, pad_y, pad_x):
    """plane: [Hp, Wp] uint8; coded: [nv, nh] bool; bv: [256] int32.
    Returns the filtered plane."""
    W = plane.shape[1]
    ecols = pad_x + 8 * np.arange(nh)           # static
    col8 = ecols[:, None] + np.arange(8)[None, :]  # [nh, 8] static

    def row_step(plane, r):
        y0 = pad_y + 8 * r
        row_c = coded[r]
        hfire = jnp.concatenate(
            [jnp.zeros(1, bool), row_c[1:] | row_c[:-1]]
        )
        left_fired = jnp.concatenate([jnp.zeros(1, bool), row_c[1:]])
        vL = jnp.where(r > 0, row_c, jnp.zeros_like(row_c))
        below = jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([coded, jnp.zeros((1, nh), bool)]), r + 1, 1, 0
        )[0]
        vE = jnp.where(r + 1 < nv, row_c & ~below, jnp.zeros_like(row_c))

        # Working band: rows y0-2 .. y0+9 (12 rows).
        band = jax.lax.dynamic_slice(
            plane, (y0 - 2, 0), (12, W)
        ).astype(jnp.int32)
        # Band row indices: 0=y0-2, 1=y0-1, 2=y0, 3=y0+1 .. 8=y0+6,
        # 9=y0+7, 10=y0+8, 11=y0+9.
        S0 = band[2]
        S1 = band[3]
        S6 = band[8]
        S7 = band[9]

        # ---- P1: h filters rows y0+1..y0+6 (band rows 3..8) -------------
        rows16 = band[3:9]                       # [6, W]
        p = rows16[:, ecols - 2], rows16[:, ecols - 1], rows16[:, ecols], rows16[:, ecols + 1]
        f = _f4(p[0], p[1], p[2], p[3])
        rsp = _resp(f, bv)
        m = hfire[None, :]
        new_m1 = jnp.where(m, _clamp(p[1] + rsp), p[1])
        new_0 = jnp.where(m, _clamp(p[2] - rsp), p[2])
        rows16 = rows16.at[:, ecols - 1].set(new_m1)
        rows16 = rows16.at[:, ecols].set(new_0)
        band = band.at[3:9].set(rows16)

        # ---- Chain A: row y0 --------------------------------------------
        # vL border outputs at cols 8c+6, 8c+7 (inputs: rows y0-2, y0-1
        # current; y0, y0+1 snapshot).
        x6 = ecols + 6
        x7 = ecols + 7
        f6 = _f4(band[0, x6], band[1, x6], S0[x6], S1[x6])
        r6 = _resp(f6, bv)
        vb6_row0 = _clamp(S0[x6] - r6)            # row y0 value at col 8c+6
        f7 = _f4(band[0, x7], band[1, x7], S0[x7], S1[x7])
        r7 = _resp(f7, bv)
        vb7_row0 = _clamp(S0[x7] - r7)            # row y0 value at col 8c+7
        # h row-y0: inputs cols 8c-2, 8c-1 post-vL(c-1), cols 8c, 8c+1 S.
        prev_vL = jnp.concatenate([jnp.zeros(1, bool), vL[:-1]])
        in_m2 = jnp.where(prev_vL, jnp.roll(vb6_row0, 1), S0[ecols - 2])
        in_m1 = jnp.where(prev_vL, jnp.roll(vb7_row0, 1), S0[ecols - 1])
        fh0 = _f4(in_m2, in_m1, S0[ecols], S0[ecols + 1])
        rh0 = _resp(fh0, bv)
        h0_m1 = _clamp(in_m1 + rh0)               # col 8c-1 output
        h0_0 = _clamp(S0[ecols] - rh0)            # col 8c output
        # vL full: all 8 columns.
        r_m2 = band[0][col8]
        r_m1 = band[1][col8]
        r_0 = S0[col8]
        r_1 = S1[col8]
        r_0 = r_0.at[:, 0].set(jnp.where(hfire, h0_0, r_0[:, 0]))
        r_1 = r_1.at[:, 0].set(band[3][ecols])    # post-P1 row y0+1 col 8c
        fv = _f4(r_m2, r_m1, r_0, r_1)
        rv = _resp(fv, bv)
        out_m1 = _clamp(r_m1 + rv)
        out_0 = _clamp(r_0 - rv)
        mvl = vL[:, None]
        row_b1 = band[1].at[col8].set(jnp.where(mvl, out_m1, band[1][col8]))
        row_b2 = band[2].at[col8].set(jnp.where(mvl, out_0, band[2][col8]))
        # h writes: col 8c-1 always wins over vL(c-1); col 8c only where vL
        # didn't fire.
        row_b2 = row_b2.at[ecols - 1].set(
            jnp.where(hfire, h0_m1, row_b2[ecols - 1])
        )
        row_b2 = row_b2.at[ecols].set(
            jnp.where(hfire & ~vL, h0_0, row_b2[ecols])
        )
        band = band.at[1].set(row_b1)
        band = band.at[2].set(row_b2)

        # ---- Chain B: row y0+7 ------------------------------------------
        # hrow7 with snapshot inputs (right-fired variant).
        fS = _f4(S7[ecols - 2], S7[ecols - 1], S7[ecols], S7[ecols + 1])
        rS = _resp(fS, bv)
        h7S_m1 = _clamp(S7[ecols - 1] + rS)
        h7S_0 = _clamp(S7[ecols] - rS)
        # vE border at col 8c+6 (static inputs).
        fe6 = _f4(S6[x6], S7[x6], band[10, x6], band[11, x6])
        re6 = _resp(fe6, bv)
        ve6_row7 = _clamp(S7[x6] + re6)
        # vE border at col 8c+7 (masked pre/post h(c+1)).
        nxt_coded = jnp.concatenate([row_c[1:], jnp.zeros(1, bool)])
        in6 = jnp.where(nxt_coded, S6[x7], band[8, x7])   # post-P1 row y0+6
        in7 = jnp.where(
            nxt_coded,
            S7[x7],
            jnp.concatenate([h7S_m1[1:], S7[x7[-1:]]]),
        )
        fe7 = _f4(in6, in7, band[10, x7], band[11, x7])
        re7 = _resp(fe7, bv)
        ve7_row7 = _clamp(in7 + re7)
        # hrow7 with post-vE(c-1) inputs (left-fired variant).
        prev_vE = jnp.concatenate([jnp.zeros(1, bool), vE[:-1]])
        use_post = prev_vE & left_fired
        in_m2b = jnp.where(use_post, jnp.roll(ve6_row7, 1), S7[ecols - 2])
        in_m1b = jnp.where(use_post, jnp.roll(ve7_row7, 1), S7[ecols - 1])
        fP = _f4(in_m2b, in_m1b, S7[ecols], S7[ecols + 1])
        rP = _resp(fP, bv)
        h7P_m1 = _clamp(in_m1b + rP)
        h7P_0 = _clamp(S7[ecols] - rP)
        h7_m1 = jnp.where(left_fired, h7P_m1, h7S_m1)
        h7_0 = jnp.where(left_fired, h7P_0, h7S_0)
        # vE full application.
        r_6 = S6[col8]
        r_7 = S7[col8]
        r_8 = band[10][col8]
        r_9 = band[11][col8]
        r_6 = r_6.at[:, 0].set(band[8][ecols])     # post-P1
        r_7 = r_7.at[:, 0].set(jnp.where(hfire, h7_0, r_7[:, 0]))
        r_6 = r_6.at[:, 7].set(
            jnp.where(~nxt_coded, band[8][x7], S6[x7])
        )
        h_next_m1 = jnp.concatenate([h7_m1[1:], S7[x7[-1:]]])
        hfire_next = jnp.concatenate([hfire[1:], jnp.zeros(1, bool)])
        r_7 = r_7.at[:, 7].set(
            jnp.where(~nxt_coded & hfire_next, h_next_m1, r_7[:, 7])
        )
        fe = _f4(r_6, r_7, r_8, r_9)
        re = _resp(fe, bv)
        out_7 = _clamp(r_7 + re)
        out_8 = _clamp(r_8 - re)
        mve = vE[:, None]
        row_b9 = band[9].at[col8].set(jnp.where(mve, out_7, band[9][col8]))
        row_b10 = band[10].at[col8].set(jnp.where(mve, out_8, band[10][col8]))
        # h row-y0+7 writes: col 8c-1 wins unless right-fired with vE(c-1);
        # col 8c loses to vE(c).
        keep_m1 = hfire & ~(prev_vE & ~left_fired)
        row_b9 = row_b9.at[ecols - 1].set(
            jnp.where(keep_m1, h7_m1, row_b9[ecols - 1])
        )
        row_b9 = row_b9.at[ecols].set(
            jnp.where(hfire & ~vE, h7_0, row_b9[ecols])
        )
        band = band.at[9].set(row_b9)
        band = band.at[10].set(row_b10)

        plane = jax.lax.dynamic_update_slice(
            plane, band.astype(jnp.uint8), (y0 - 2, 0)
        )
        return plane, None

    plane, _ = jax.lax.scan(row_step, plane, jnp.arange(nv))
    return plane
