"""Motion estimation (host/numpy tier; JAX twin planned in ops/).

Batched over all macro blocks: a coarse-to-fine full-pel SAD search against
the *original* (un-reconstructed) previous/golden frames -- the reference
does the same (mcenc.c:314-316), which decouples ME from reconstruction and
is what makes the search embarrassingly parallel -- followed by half-pel
refinement using the codec's exact two-offset averaging prediction.

MV convention: (dx, dy) in half-pel units, range [-31, 31], applied in
bitstream orientation (positive dy moves toward higher internal rows).
"""
from __future__ import annotations

import numpy as np


def _mb_sads(cur: np.ndarray, ref: np.ndarray, offsets, mb_y, mb_x):
    """SAD for every MB at each full-pel offset.

    cur: [H, W] uint8 (unpadded); ref: padded [H+2p, W+2p]; offsets: list of
    (dy, dx) full-pel; mb_y/mb_x: [nmbs] top-left coords (unpadded).
    Returns [len(offsets), nmbs] int64.
    """
    H, W = cur.shape
    pad = (ref.shape[0] - H) // 2
    curi = cur.astype(np.int32)
    out = np.empty((len(offsets), len(mb_y)), dtype=np.int64)
    ay = mb_y[:, None, None] + np.arange(16)[None, :, None]
    ax = mb_x[:, None, None] + np.arange(16)[None, None, :]
    for i, (dy, dx) in enumerate(offsets):
        r = ref[pad + dy : pad + dy + H, pad + dx : pad + dx + W].astype(np.int32)
        d = np.abs(curi - r)
        # Sum per MB via gather.
        out[i] = d[ay, ax].reshape(len(mb_y), -1).sum(axis=1)
    return out


def full_pel_search(cur, ref, mb_y, mb_x, max_mv=15):
    """Two-stage full-pel search. Returns (mvs [nmbs, 2] full-pel (dx, dy),
    sads [nmbs])."""
    # Stage 1: step-2 grid.
    cands = [
        (dy, dx)
        for dy in range(-max_mv + 1, max_mv, 2)
        for dx in range(-max_mv + 1, max_mv, 2)
    ]
    cands.insert(0, (0, 0))
    sads = _mb_sads(cur, ref, cands, mb_y, mb_x)
    best = np.argmin(sads, axis=0)
    best_dy = np.array([cands[i][0] for i in best])
    best_dx = np.array([cands[i][1] for i in best])
    best_sad = sads[best, np.arange(len(mb_y))]
    # Stage 2: +-1 refinement.
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            ny = np.clip(best_dy + dy, -max_mv, max_mv)
            nx = np.clip(best_dx + dx, -max_mv, max_mv)
            s = _per_mb_sad(cur, ref, ny, nx, mb_y, mb_x)
            better = s < best_sad
            best_sad = np.where(better, s, best_sad)
            best_dy = np.where(better, ny, best_dy)
            best_dx = np.where(better, nx, best_dx)
    return np.stack([best_dx, best_dy], axis=1), best_sad


def _per_mb_sad(cur, ref, dy, dx, mb_y, mb_x):
    """SAD with per-MB offsets. dy/dx: [nmbs]."""
    H, W = cur.shape
    pad = (ref.shape[0] - H) // 2
    ay = (mb_y + dy + pad)[:, None, None] + np.arange(16)[None, :, None]
    ax = (mb_x + dx + pad)[:, None, None] + np.arange(16)[None, None, :]
    ry = mb_y[:, None, None] + np.arange(16)[None, :, None]
    rx = mb_x[:, None, None] + np.arange(16)[None, None, :]
    d = np.abs(
        cur[ry, rx].astype(np.int32) - ref[ay, ax].astype(np.int32)
    )
    return d.reshape(len(mb_y), -1).sum(axis=1).astype(np.int64)


def _halfpel_pred(ref, mvx, mvy, mb_y, mb_x, size=16):
    """Prediction block per MB for a half-pel MV, using the codec's
    two-offset averaging (state.c:846-957, luma precision)."""
    from theora_tpu.decode.decoder import mv_offsets

    H2, W2 = ref.shape
    pad = (W2 - (mb_x.max() + size)) and 0  # unused; pad passed via coords
    n = len(mb_y)
    out = np.empty((n, size, size), dtype=np.int32)
    for i in range(n):
        o1, o2 = mv_offsets(int(mvx[i]), int(mvy[i]), 0, 0)
        y0 = mb_y[i] + o1[0]
        x0 = mb_x[i] + o1[1]
        b = ref[y0 : y0 + size, x0 : x0 + size].astype(np.int32)
        if o2 is not None:
            y1 = mb_y[i] + o2[0]
            x1 = mb_x[i] + o2[1]
            b = (b + ref[y1 : y1 + size, x1 : x1 + size].astype(np.int32)) >> 1
        out[i] = b
    return out


def half_pel_refine(cur, ref, full_mvs, mb_y, mb_x):
    """Refine full-pel MVs to half-pel. cur: [H, W]; ref: padded.

    Returns (mvs [nmbs, 2] half-pel (dx, dy), sads [nmbs]).
    """
    H, W = cur.shape
    pad = (ref.shape[0] - H) // 2
    n = len(mb_y)
    ry = mb_y[:, None, None] + np.arange(16)[None, :, None]
    rx = mb_x[:, None, None] + np.arange(16)[None, None, :]
    curblks = cur[ry, rx].astype(np.int32)
    pmb_y = mb_y + pad
    pmb_x = mb_x + pad
    best_dx = full_mvs[:, 0] * 2
    best_dy = full_mvs[:, 1] * 2
    pred = _halfpel_pred(ref, best_dx, best_dy, pmb_y, pmb_x)
    best_sad = np.abs(curblks - pred).reshape(n, -1).sum(axis=1)
    for ddy in (-1, 0, 1):
        for ddx in (-1, 0, 1):
            if ddy == 0 and ddx == 0:
                continue
            ndx = np.clip(best_dx + ddx, -31, 31)
            ndy = np.clip(best_dy + ddy, -31, 31)
            pred = _halfpel_pred(ref, ndx, ndy, pmb_y, pmb_x)
            s = np.abs(curblks - pred).reshape(n, -1).sum(axis=1)
            better = s < best_sad
            best_sad = np.where(better, s, best_sad)
            best_dx = np.where(better, ndx, best_dx)
            best_dy = np.where(better, ndy, best_dy)
    return np.stack([best_dx, best_dy], axis=1), best_sad
