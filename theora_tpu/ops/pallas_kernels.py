"""Pallas TPU kernels for the hot transform ops.

Structure-of-arrays layout: coefficients along sublanes (64 rows), blocks
along lanes, so every butterfly line of the 1-D transforms is a full-width
VPU op over 512 blocks per grid step with zero lane shuffles — the
TPU-native counterpart of the reference's per-block SIMD kernels
(lib/x86/mmxfdct.c, sse2idct.c).

All arithmetic is int32 with explicit int16 wraparound, bit-exact against
ops/idct_np.py / fdct_np.py (and therefore the C reference). The XLA (jnp)
twins in transforms_jax.py remain the fallback; benchmarks pick the faster
path per platform.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from theora_tpu.constants import (
    C1S7,
    C2S6,
    C3S5,
    C4S4,
    C5S3,
    C6S2,
    C7S1,
    ZIGZAG_TO_NAT,
)

_LANES = 512  # blocks per grid step


def _i16(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _m16(c, x):
    return (c * x) >> 16


def _idct8_list(x):
    """1-D 8-point iDCT over a list of 8 row vectors (idct.c:30-81)."""
    t0 = _m16(C4S4, _i16(x[0] + x[4]))
    t1 = _m16(C4S4, _i16(x[0] - x[4]))
    t2 = _m16(C6S2, x[2]) - _m16(C2S6, x[6])
    t3 = _m16(C2S6, x[2]) + _m16(C6S2, x[6])
    t4 = _m16(C7S1, x[1]) - _m16(C1S7, x[7])
    t5 = _m16(C3S5, x[5]) - _m16(C5S3, x[3])
    t6 = _m16(C5S3, x[5]) + _m16(C3S5, x[3])
    t7 = _m16(C1S7, x[1]) + _m16(C7S1, x[7])
    r = t4 + t5
    t5 = _m16(C4S4, _i16(t4 - t5))
    t4 = r
    r = t7 + t6
    t6 = _m16(C4S4, _i16(t7 - t6))
    t7 = r
    r = t0 + t3
    t3 = t0 - t3
    t0 = r
    r = t1 + t2
    t2 = t1 - t2
    t1 = r
    r = t6 + t5
    t5 = t6 - t5
    t6 = r
    return [
        _i16(t0 + t7), _i16(t1 + t6), _i16(t2 + t5), _i16(t3 + t4),
        _i16(t3 - t4), _i16(t2 - t5), _i16(t1 - t6), _i16(t0 - t7),
    ]


def _fdct8_list(x):
    """1-D 8-point fDCT over a list of 8 row vectors (fdct.c:27-120)."""
    t0 = x[0] + x[7]
    t7 = x[0] - x[7]
    t1 = x[1] + x[6]
    t6 = x[1] - x[6]
    t2 = x[2] + x[5]
    t5 = x[2] - x[5]
    t3 = x[3] + x[4]
    t4 = x[3] - x[4]
    r = t0 + t3
    t3 = t0 - t3
    t0 = r
    r = t1 + t2
    t2 = t1 - t2
    t1 = r
    r = t6 + t5
    t5 = t6 - t5
    t6 = r
    nz = lambda t: (t != 0).astype(jnp.int32)
    s = ((27146 * t5 + 0xB500) >> 16) + t5 + nz(t5) >> 1
    r = t4 + s
    t5 = t4 - s
    t4 = r
    s = ((27146 * t6 + 0xB500) >> 16) + t6 + nz(t6) >> 1
    r = t7 + s
    t6 = t7 - s
    t7 = r
    r = ((27146 * t0 + 0x4000) >> 16) + t0 + nz(t0)
    s = ((27146 * t1 + 0xB500) >> 16) + t1 + nz(t1)
    u = r + s >> 1
    v = r - u
    y0, y4 = u, v
    u = ((C6S2 * t2 + C2S6 * t3 + 0x6CB7) >> 16) + nz(t3)
    s = _m16(C6S2, u) - t2
    v = ((s * 21600 + 0x2800) >> 18) + s + nz(s)
    y2, y6 = u, v
    u = ((C5S3 * t6 + C3S5 * t5 + 0x0E3D) >> 16) + nz(t5)
    s = t6 - _m16(C5S3, u)
    v = ((s * 26568 + 0x3400) >> 17) + s + nz(s)
    y5, y3 = u, v
    u = ((C7S1 * t4 + C1S7 * t7 + 0x7B1B) >> 16) + nz(t7)
    s = _m16(C7S1, u) - t4
    v = ((s * 20539 + 0x3000) >> 20) + s + nz(s)
    y1, y7 = u, v
    return [_i16(y) for y in (y0, y1, y2, y3, y4, y5, y6, y7)]


def _idct_kernel(x_ref, out_ref):
    # x: [64, L] natural-order dequantized coefficients.
    rows = [x_ref[k, :] for k in range(64)]
    # Row pass (within-block rows are groups of 8 consecutive entries).
    w = [None] * 64
    for i in range(8):
        o = _idct8_list(rows[8 * i : 8 * i + 8])
        for j in range(8):
            w[8 * i + j] = o[j]
    # Column pass (stride 8).
    for j in range(8):
        o = _idct8_list([w[8 * i + j] for i in range(8)])
        for i in range(8):
            out_ref[8 * i + j, :] = _i16(o[i] + 8 >> 4)


def _fdct_quant_kernel(res_ref, dq_ref, out_ref):
    # res: [64, L] residual pixels; dq: [64, L] zig-zag dequant rows
    # broadcast along lanes; out: [64, L] zig-zag quantized.
    x = [res_ref[k, :] << 2 for k in range(64)]
    # Systematic-error biases (fdct.c:134-141).
    x[0] = x[0] + (x[0] != 0).astype(jnp.int32) + 1
    x[1] = x[1] + 1
    x[8] = x[8] - 1
    # Columns of x -> rows of y (oc_fdct8 reads stride 8, writes stride 1).
    y = [None] * 64
    for i in range(8):
        o = _fdct8_list([x[8 * k + i] for k in range(8)])
        for j in range(8):
            y[8 * i + j] = o[j]
    w = [None] * 64
    for i in range(8):
        o = _fdct8_list([y[8 * k + i] for k in range(8)])
        for j in range(8):
            w[8 * i + j] = o[j]
    for zzi in range(64):
        v = _i16(w[int(ZIGZAG_TO_NAT[zzi])] + 2 >> 2)
        d = dq_ref[zzi, :]
        av2 = jnp.abs(v) << 1
        q = jnp.where(av2 >= d, (av2 + d) // (d << 1), 0)
        out_ref[zzi, :] = jnp.sign(v) * q


def _pad_lanes(x, lanes):
    n = x.shape[1]
    pad = (-n) % lanes
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x, n


@functools.partial(jax.jit, static_argnames=("interpret",))
def idct8x8_soa(coeffs_nat, interpret=False):
    """[64, N] int32 natural-order dequantized coefficients -> [64, N]
    residuals (idct.c:285-296), Pallas grid over lane tiles."""
    from jax.experimental import pallas as pl

    x, n = _pad_lanes(coeffs_nat, _LANES)
    grid = (x.shape[1] // _LANES,)
    out = pl.pallas_call(
        _idct_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        in_specs=[pl.BlockSpec((64, _LANES), lambda i: (0, i))],
        out_specs=pl.BlockSpec((64, _LANES), lambda i: (0, i)),
        grid=grid,
        interpret=interpret,
    )(x)
    return out[:, :n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fdct_quantize_soa(res, dq, interpret=False):
    """[64, N] int32 residuals + [64] zig-zag dequant -> [64, N] zig-zag
    quantized coefficients (fdct.c + enquant.c fused)."""
    from jax.experimental import pallas as pl

    x, n = _pad_lanes(res, _LANES)
    dqb = jnp.broadcast_to(dq.astype(jnp.int32)[:, None], x.shape)
    grid = (x.shape[1] // _LANES,)
    out = pl.pallas_call(
        _fdct_quant_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        in_specs=[
            pl.BlockSpec((64, _LANES), lambda i: (0, i)),
            pl.BlockSpec((64, _LANES), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((64, _LANES), lambda i: (0, i)),
        grid=grid,
        interpret=interpret,
    )(x, dqb)
    return out[:, :n]


def blocks_to_soa(blocks):
    """[N, 8, 8] -> [64, N]."""
    return blocks.reshape(len(blocks), 64).T


def soa_to_blocks(soa):
    """[64, N] -> [N, 8, 8]."""
    return soa.T.reshape(-1, 8, 8)
