"""Batched forward 8x8 DCT matching the reference encoder's integer
transform (fdct.c:20-154). Host/numpy tier; JAX twin in fdct_jax.py.

Output is in ZIG-ZAG order, scaled x4 vs orthonormal, with the reference's
working-precision biases and rounding.
"""
from __future__ import annotations

import numpy as np

from theora_tpu.constants import (
    C1S7,
    C2S6,
    C3S5,
    C5S3,
    C6S2,
    C7S1,
    ZIGZAG_TO_NAT,
)


def _i16(x: np.ndarray) -> np.ndarray:
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def fdct8(x: np.ndarray) -> np.ndarray:
    """1-D 8-point fDCT over the last axis (fdct.c:27-120).

    int64 in (int16-range values), int64 out (int16 wrapped)."""
    t0 = x[..., 0] + x[..., 7]
    t7 = x[..., 0] - x[..., 7]
    t1 = x[..., 1] + x[..., 6]
    t6 = x[..., 1] - x[..., 6]
    t2 = x[..., 2] + x[..., 5]
    t5 = x[..., 2] - x[..., 5]
    t3 = x[..., 3] + x[..., 4]
    t4 = x[..., 3] - x[..., 4]
    # Stage 2
    r = t0 + t3
    t3 = t0 - t3
    t0 = r
    r = t1 + t2
    t2 = t1 - t2
    t1 = r
    r = t6 + t5
    t5 = t6 - t5
    t6 = r
    # Stage 3
    s = ((27146 * t5 + 0xB500) >> 16) + t5 + (t5 != 0) >> 1
    r = t4 + s
    t5 = t4 - s
    t4 = r
    s = ((27146 * t6 + 0xB500) >> 16) + t6 + (t6 != 0) >> 1
    r = t7 + s
    t6 = t7 - s
    t7 = r
    # Stage 4
    r = ((27146 * t0 + 0x4000) >> 16) + t0 + (t0 != 0)
    s = ((27146 * t1 + 0xB500) >> 16) + t1 + (t1 != 0)
    u = r + s >> 1
    v = r - u
    y0 = u
    y4 = v
    u = ((C6S2 * t2 + C2S6 * t3 + 0x6CB7) >> 16) + (t3 != 0)
    s = ((C6S2 * u) >> 16) - t2
    v = ((s * 21600 + 0x2800) >> 18) + s + (s != 0)
    y2 = u
    y6 = v
    u = ((C5S3 * t6 + C3S5 * t5 + 0x0E3D) >> 16) + (t5 != 0)
    s = t6 - ((C5S3 * u) >> 16)
    v = ((s * 26568 + 0x3400) >> 17) + s + (s != 0)
    y5 = u
    y3 = v
    u = ((C7S1 * t4 + C1S7 * t7 + 0x7B1B) >> 16) + (t7 != 0)
    s = ((C7S1 * u) >> 16) - t4
    v = ((s * 20539 + 0x3000) >> 20) + s + (s != 0)
    y1 = u
    y7 = v
    return _i16(np.stack([y0, y1, y2, y3, y4, y5, y6, y7], axis=-1))


def fdct8x8_batch(res: np.ndarray) -> np.ndarray:
    """[N, 8, 8] residuals -> [N, 64] zig-zag-order DCT coefficients
    (fdct.c:128-154)."""
    w = res.astype(np.int64) << 2
    # Systematic-error biases (fdct.c:134-141); w is [N, row, col], the C
    # flat indices 0, 1, 8 are (0,0), (0,1), (1,0).
    w[:, 0, 0] += (w[:, 0, 0] != 0) + 1
    w[:, 0, 1] += 1
    w[:, 1, 0] -= 1
    # Transform columns of w into rows of y: oc_fdct8 reads every 8th entry
    # (a column) and writes 8 consecutive entries (a row).
    y = fdct8(np.swapaxes(w, -1, -2))      # y[i] = fdct(col i of w)
    # y currently [N, col_index, 8]; C's _y layout: row i = transform of
    # column i, i.e. _y[i*8+j]. Second pass transforms columns of _y.
    w2 = fdct8(np.swapaxes(y, -1, -2))     # w2[i] = fdct(col i of y)
    # w2[i][j] == C w[i*8+j]; final: out[zzi] = w[ZIGZAG_TO_NAT[zzi]] + 2 >> 2
    flat = w2.reshape(w2.shape[0], 64)
    out = _i16(flat[:, ZIGZAG_TO_NAT[:64]] + 2 >> 2)
    return out.astype(np.int32)


# Approximate token bit costs per coefficient magnitude (VP31 tables,
# averaged): index min(|q|, 8). Used by the fast R/D quantizer, which plays
# the role of the reference's trellis tokenizer cost model
# (tokenize.c:457-744) with static biases.
_MAG_BITS = np.array([0.0, 4.5, 5.5, 6.5, 6.5, 7.5, 7.5, 8.5, 9.5])


def quantize_rd_batch(
    dct_zz: np.ndarray, dequant_zz: np.ndarray, lam: float
) -> np.ndarray:
    """Rate/distortion-aware quantizer: per AC coefficient, choose between
    the round-to-nearest value and its magnitude reduced by one (possibly
    zero), minimizing d^2 + lambda*bits. A vectorized one-step version of
    the reference's per-block trellis (tokenize.c:746-975).
    """
    q0 = quantize_batch(dct_zz, dequant_zz)
    d = dequant_zz.astype(np.int64)
    v = dct_zz.astype(np.int64)
    a0 = np.abs(q0)
    a1 = np.maximum(a0 - 1, 0)
    err0 = (a0 * d - np.abs(v)) ** 2
    err1 = (a1 * d - np.abs(v)) ** 2
    bits0 = _MAG_BITS[np.minimum(a0, 8)]
    bits1 = _MAG_BITS[np.minimum(a1, 8)]
    take1 = err1 + lam * bits1 <= err0 + lam * bits0
    out = np.where(take1, np.sign(q0) * a1, q0)
    out[:, 0] = q0[:, 0]  # never degrade DC
    out = out.astype(np.int32)
    # Isolated kill: a lone +-1 surrounded by zeros costs a whole
    # run+value token (~10-14 bits); killing it extends the zero run for
    # free. Two sweeps so newly-isolated coefficients get a chance.
    ISO_BITS = 11.0
    av = np.abs(v)
    for _ in range(2):
        nz = out != 0
        left_zero = np.ones_like(nz)
        left_zero[:, 2:] = ~nz[:, 1:-1]
        right_zero = np.ones_like(nz)
        right_zero[:, :-1] = ~nz[:, 1:]
        iso = nz & left_zero & right_zero & (np.abs(out) == 1)
        iso[:, 0] = False
        if not iso.any():
            break
        d2 = np.broadcast_to(d, out.shape)
        err_coded = (d2 - av) ** 2
        err_zero = av.astype(np.int64) ** 2
        kill = iso & (err_zero - err_coded <= lam * ISO_BITS)
        if not kill.any():
            break
        out[kill] = 0
    # Tail kill: dropping the last nonzero coefficient of a block removes a
    # whole token and usually merges EOB runs -- worth far more bits than a
    # magnitude step (the trellis's biggest win, tokenize.c:457-744).
    TAIL_BITS = 14.0
    for _ in range(4):
        nz = out != 0
        nz[:, 0] = False  # never the DC
        has = nz.any(axis=1)
        if not has.any():
            break
        last = 63 - np.argmax(nz[:, ::-1], axis=1)
        rows = np.arange(len(out))
        q_at = out[rows, last]
        d_at = d[last] if d.ndim == 1 else d[rows, last]
        v_at = av[rows, last]
        err_coded = (np.abs(q_at) * d_at - v_at) ** 2
        err_zero = v_at**2
        kill = (
            has
            & (np.abs(q_at) == 1)
            & (err_zero - err_coded <= lam * TAIL_BITS)
        )
        if not kill.any():
            break
        out[rows[kill], last[kill]] = 0
    return out


def rd_lambda(qi: int, dequant_ac: int) -> float:
    """Lambda for the R/D quantizer, following the reference's model
    lambda ~= 0.2125 * qavg^2 (rate.c:151-202) with qavg the typical AC
    quantizer in the x4-scaled domain."""
    return 0.2125 * float(dequant_ac) * float(dequant_ac) / 16.0


def quantize_batch(dct_zz: np.ndarray, dequant_zz: np.ndarray) -> np.ndarray:
    """Round-to-nearest quantizer, ties away from zero (enquant.c:220-249).

    dct_zz: [N, 64] zig-zag coefficients; dequant_zz: [64] or [N, 64].
    Returns [N, 64] quantized values.
    """
    d = dequant_zz.astype(np.int64)
    v2 = np.abs(dct_zz.astype(np.int64)) << 1
    q = (v2 + d) // (2 * d)
    q = np.where(v2 >= d, q, 0)
    return (np.sign(dct_zz) * q).astype(np.int32)
