"""Bit-exact batched 8x8 inverse DCT (numpy host tier).

Reproduces the integer arithmetic of the spec's iDCT (idct.c:30-330) over a
batch of blocks. A single dense kernel is bit-identical to all of the
reference's sparse dispatch variants whenever the variants' ignored
coefficients are zero -- which the `last_zzi` semantics guarantee for any
stream (only pure zero runs can leave `last_zzi` below the support of the
written coefficients). The one observable special case is `last_zzi < 2`,
where the reference skips the transform entirely and fills the block with
`(dc*dc_quant + 15) >> 5` (state.c:967-975); callers handle that outside.

All arithmetic: products in int32, `>>16` arithmetic shifts, int16 wraparound
casts exactly where the reference has them.
"""
from __future__ import annotations

import numpy as np

from theora_tpu.constants import C1S7, C2S6, C3S5, C4S4, C5S3, C6S2, C7S1


def _i16(x: np.ndarray) -> np.ndarray:
    """int16 wraparound cast, kept in int32 domain."""
    return ((x.astype(np.int64) + 0x8000) % 0x10000 - 0x8000).astype(np.int32)


def idct8(x: np.ndarray) -> np.ndarray:
    """1-D 8-point iDCT over the last axis; int32 in, int32 out
    (idct.c:30-81). Output scaled by 2 vs orthonormal."""
    x = x.astype(np.int64)
    t0 = C4S4 * _i16(x[..., 0] + x[..., 4]).astype(np.int64) >> 16
    t1 = C4S4 * _i16(x[..., 0] - x[..., 4]).astype(np.int64) >> 16
    t2 = (C6S2 * x[..., 2] >> 16) - (C2S6 * x[..., 6] >> 16)
    t3 = (C2S6 * x[..., 2] >> 16) + (C6S2 * x[..., 6] >> 16)
    t4 = (C7S1 * x[..., 1] >> 16) - (C1S7 * x[..., 7] >> 16)
    t5 = (C3S5 * x[..., 5] >> 16) - (C5S3 * x[..., 3] >> 16)
    t6 = (C5S3 * x[..., 5] >> 16) + (C3S5 * x[..., 3] >> 16)
    t7 = (C1S7 * x[..., 1] >> 16) + (C7S1 * x[..., 7] >> 16)
    # Stage 2
    r = t4 + t5
    t5 = C4S4 * _i16(t4 - t5).astype(np.int64) >> 16
    t4 = r
    r = t7 + t6
    t6 = C4S4 * _i16(t7 - t6).astype(np.int64) >> 16
    t7 = r
    # Stage 3
    r = t0 + t3
    t3 = t0 - t3
    t0 = r
    r = t1 + t2
    t2 = t1 - t2
    t1 = r
    r = t6 + t5
    t5 = t6 - t5
    t6 = r
    # Stage 4 (int16 casts on every output)
    y = np.stack(
        [
            _i16(t0 + t7),
            _i16(t1 + t6),
            _i16(t2 + t5),
            _i16(t3 + t4),
            _i16(t3 - t4),
            _i16(t2 - t5),
            _i16(t1 - t6),
            _i16(t0 - t7),
        ],
        axis=-1,
    )
    return y


def idct8x8_batch(coeffs: np.ndarray) -> np.ndarray:
    """Dense 2-D iDCT over a batch: [N, 8, 8] int -> [N, 8, 8] int32.

    Input in natural (row-major) order, scaled x4 vs orthonormal; output is
    the residual with the reference's `(t + 8) >> 4` rounding (idct.c:293).
    """
    coeffs = coeffs.astype(np.int32)
    # Rows of x -> columns of w: idct8 along rows, results transposed.
    w = idct8(coeffs)                 # transform last axis (rows)
    w = np.swapaxes(w, -1, -2)        # columns of w = transformed rows
    y = idct8(w)
    y = np.swapaxes(y, -1, -2)
    return _i16(y + 8 >> 4)


def dc_fill_batch(dc: np.ndarray, dc_quant: np.ndarray) -> np.ndarray:
    """DC-only reconstruction for blocks with last_zzi < 2: the whole block
    becomes (dc*dc_quant + 15) >> 5 as int16 (state.c:967-975).

    dc, dc_quant: [N] ints -> [N, 8, 8] int32.
    """
    p = _i16(dc.astype(np.int64) * dc_quant.astype(np.int64) + 15 >> 5)
    return np.broadcast_to(p[:, None, None], (len(p), 8, 8)).copy()
