"""Motion estimation (host/numpy tier; the JAX twin mirrors this over the
same batched layout).

Batched over all macro blocks: a 3-level pyramid full-pel SAD search against
the *original* (un-reconstructed) previous/golden frames -- the reference
searches originals too (mcenc.c:314-316), which decouples ME from
reconstruction and keeps the search embarrassingly parallel -- followed by
half-pel refinement using the codec's exact two-offset averaging prediction.

MV convention: (dx, dy) in half-pel units, range [-31, 31], applied in
bitstream orientation (positive dy moves toward higher internal rows).
"""
from __future__ import annotations

import numpy as np

# MV offset tables (state.c:901-928); shared with the decoder.
from theora_tpu.decode.decoder import _MVMAP, _MVMAP2


def _downsample(img: np.ndarray) -> np.ndarray:
    h, w = img.shape
    i = img[: h & ~1, : w & ~1].astype(np.uint16)
    return ((i[0::2, 0::2] + i[0::2, 1::2] + i[1::2, 0::2] + i[1::2, 1::2] + 2) >> 2).astype(
        np.uint8
    )


def _block_sads(cur, ref, offsets, by, bx, bs):
    """SAD of bs x bs blocks at given top-left coords for each (dy, dx)
    offset; ref padded by `pad`. Returns [noffsets, nblocks]."""
    pad = (ref.shape[0] - cur.shape[0]) // 2
    H, W = cur.shape
    ay = by[:, None, None] + np.arange(bs)[None, :, None]
    ax = bx[:, None, None] + np.arange(bs)[None, None, :]
    curblk = cur[ay, ax].astype(np.int32).reshape(len(by), -1)
    out = np.empty((len(offsets), len(by)), dtype=np.int64)
    for i, (dy, dx) in enumerate(offsets):
        r = ref[
            pad + dy : pad + dy + H, pad + dx : pad + dx + W
        ]
        rblk = r[ay, ax].astype(np.int32).reshape(len(by), -1)
        out[i] = np.abs(curblk - rblk).sum(axis=1)
    return out


def _refine(cur, ref, by, bx, bs, dy, dx, best_sad, max_mv, radius=1):
    """+-radius refinement of per-block offsets."""
    pad = (ref.shape[0] - cur.shape[0]) // 2
    ay = by[:, None, None] + np.arange(bs)[None, :, None]
    ax = bx[:, None, None] + np.arange(bs)[None, None, :]
    curblk = cur[ay, ax].astype(np.int32).reshape(len(by), -1)
    for ddy in range(-radius, radius + 1):
        for ddx in range(-radius, radius + 1):
            if ddy == 0 and ddx == 0:
                continue
            ny = np.clip(dy + ddy, -max_mv, max_mv)
            nx = np.clip(dx + ddx, -max_mv, max_mv)
            gy = (by + ny + pad)[:, None, None] + np.arange(bs)[None, :, None]
            gx = (bx + nx + pad)[:, None, None] + np.arange(bs)[None, None, :]
            s = (
                np.abs(curblk - ref[gy, gx].astype(np.int32).reshape(len(by), -1))
                .sum(axis=1)
                .astype(np.int64)
            )
            better = s < best_sad
            best_sad = np.where(better, s, best_sad)
            dy = np.where(better, ny, dy)
            dx = np.where(better, nx, dx)
    return dy, dx, best_sad


def full_pel_search(cur, ref, mb_y, mb_x, max_mv=15):
    """Pyramid full-pel search. cur: [H, W]; ref: padded by 16.
    Returns (mvs [nmbs, 2] full-pel (dx, dy), sads [nmbs])."""
    pad = (ref.shape[0] - cur.shape[0]) // 2
    # Level 2: quarter resolution, exhaustive +-4.
    cur2 = _downsample(_downsample(cur))
    ref2 = _downsample(_downsample(ref))
    cands = [(dy, dx) for dy in range(-4, 5) for dx in range(-4, 5)]
    pad2 = pad // 4
    H2, W2 = cur2.shape
    ay = (mb_y // 4)[:, None, None] + np.arange(4)[None, :, None]
    ax = (mb_x // 4)[:, None, None] + np.arange(4)[None, None, :]
    curblk = cur2[ay, ax].astype(np.int32).reshape(len(mb_y), -1)
    sads = np.empty((len(cands), len(mb_y)), dtype=np.int64)
    for i, (dy, dx) in enumerate(cands):
        r = ref2[pad2 + dy : pad2 + dy + H2, pad2 + dx : pad2 + dx + W2]
        sads[i] = np.abs(
            curblk - r[ay, ax].astype(np.int32).reshape(len(mb_y), -1)
        ).sum(axis=1)
    besti = np.argmin(sads, axis=0)
    dy = np.array([cands[i][0] for i in besti]) * 4
    dx = np.array([cands[i][1] for i in besti]) * 4
    dy = np.clip(dy, -max_mv, max_mv)
    dx = np.clip(dx, -max_mv, max_mv)
    # Level 1: half resolution, +-1 around the upscaled candidate.
    cur1 = _downsample(cur)
    ref1 = _downsample(ref)
    sad1 = _per_block_sad(cur1, ref1, mb_y // 2, mb_x // 2, 8, dy // 2, dx // 2)
    dy1, dx1, _ = _refine(
        cur1, ref1, mb_y // 2, mb_x // 2, 8, dy // 2, dx // 2, sad1,
        max_mv // 2, radius=1,
    )
    dy, dx = dy1 * 2, dx1 * 2
    # Level 0: full resolution, +-1 (and compare against (0, 0)).
    sad0 = _per_block_sad(cur, ref, mb_y, mb_x, 16, dy, dx)
    zsad = _per_block_sad(
        cur, ref, mb_y, mb_x, 16, np.zeros_like(dy), np.zeros_like(dx)
    )
    zero_better = zsad < sad0
    dy = np.where(zero_better, 0, dy)
    dx = np.where(zero_better, 0, dx)
    sad0 = np.minimum(sad0, zsad)
    dy, dx, sad0 = _refine(cur, ref, mb_y, mb_x, 16, dy, dx, sad0, max_mv, 1)
    dy, dx, sad0 = _refine(cur, ref, mb_y, mb_x, 16, dy, dx, sad0, max_mv, 2)
    dy = np.clip(dy, -max_mv, max_mv)
    dx = np.clip(dx, -max_mv, max_mv)
    return np.stack([dx, dy], axis=1), sad0


def _per_block_sad(cur, ref, by, bx, bs, dy, dx):
    pad = (ref.shape[0] - cur.shape[0]) // 2
    ay = by[:, None, None] + np.arange(bs)[None, :, None]
    ax = bx[:, None, None] + np.arange(bs)[None, None, :]
    gy = (by + dy + pad)[:, None, None] + np.arange(bs)[None, :, None]
    gx = (bx + dx + pad)[:, None, None] + np.arange(bs)[None, None, :]
    d = np.abs(cur[ay, ax].astype(np.int32) - ref[gy, gx].astype(np.int32))
    return d.reshape(len(by), -1).sum(axis=1).astype(np.int64)


def _per_mb_sad(cur, ref, dy, dx, mb_y, mb_x):
    """Back-compat wrapper: SAD with per-MB offsets (16x16)."""
    return _per_block_sad(cur, ref, mb_y, mb_x, 16, dy, dx)


def _halfpel_pred_batch(ref, mvx, mvy, by, bx, bs=16):
    """Vectorized half-pel prediction blocks (two-offset averaging,
    state.c:846-957, luma precision). by/bx are padded coords."""
    mx = _MVMAP[0][mvx + 31]
    mx2 = _MVMAP2[0][mvx + 31]
    my = _MVMAP[0][mvy + 31]
    my2 = _MVMAP2[0][mvy + 31]
    gy = (by + my)[:, None, None] + np.arange(bs)[None, :, None]
    gx = (bx + mx)[:, None, None] + np.arange(bs)[None, None, :]
    b1 = ref[gy, gx].astype(np.int32)
    use2 = (mx2 != 0) | (my2 != 0)
    if use2.any():
        g2y = (by + my + my2)[:, None, None] + np.arange(bs)[None, :, None]
        g2x = (bx + mx + mx2)[:, None, None] + np.arange(bs)[None, None, :]
        b2 = ref[g2y, g2x].astype(np.int32)
        b1 = np.where(use2[:, None, None], (b1 + b2) >> 1, b1)
    return b1


def half_pel_refine(cur, ref, full_mvs, mb_y, mb_x):
    """Refine full-pel MVs to half-pel (mcenc.c:666-761 analogue).

    Returns (mvs [nmbs, 2] half-pel (dx, dy), sads [nmbs])."""
    pad = (ref.shape[0] - cur.shape[0]) // 2
    n = len(mb_y)
    ay = mb_y[:, None, None] + np.arange(16)[None, :, None]
    ax = mb_x[:, None, None] + np.arange(16)[None, None, :]
    curblks = cur[ay, ax].astype(np.int32)
    pby = mb_y + pad
    pbx = mb_x + pad
    best_dx = full_mvs[:, 0] * 2
    best_dy = full_mvs[:, 1] * 2
    pred = _halfpel_pred_batch(ref, best_dx, best_dy, pby, pbx)
    best_sad = np.abs(curblks - pred).reshape(n, -1).sum(axis=1)
    for ddy in (-1, 0, 1):
        for ddx in (-1, 0, 1):
            if ddy == 0 and ddx == 0:
                continue
            ndx = np.clip(best_dx + ddx, -31, 31)
            ndy = np.clip(best_dy + ddy, -31, 31)
            pred = _halfpel_pred_batch(ref, ndx, ndy, pby, pbx)
            s = np.abs(curblks - pred).reshape(n, -1).sum(axis=1)
            better = s < best_sad
            best_sad = np.where(better, s, best_sad)
            best_dx = np.where(better, ndx, best_dx)
            best_dy = np.where(better, ndy, best_dy)
    return np.stack([best_dx, best_dy], axis=1), best_sad


def half_pel_refine_blocks(cur, ref, full_mvs, by, bx, bs):
    """Half-pel refinement for arbitrary block size (the 4MV per-block
    variant, mcenc.c:763-791)."""
    pad = (ref.shape[0] - cur.shape[0]) // 2
    n = len(by)
    ay = by[:, None, None] + np.arange(bs)[None, :, None]
    ax = bx[:, None, None] + np.arange(bs)[None, None, :]
    curblks = cur[ay, ax].astype(np.int32)
    pby = by + pad
    pbx = bx + pad
    best_dx = full_mvs[:, 0] * 2
    best_dy = full_mvs[:, 1] * 2
    pred = _halfpel_pred_batch(ref, best_dx, best_dy, pby, pbx, bs)
    best_sad = np.abs(curblks - pred).reshape(n, -1).sum(axis=1)
    for ddy in (-1, 0, 1):
        for ddx in (-1, 0, 1):
            if ddy == 0 and ddx == 0:
                continue
            ndx = np.clip(best_dx + ddx, -31, 31)
            ndy = np.clip(best_dy + ddy, -31, 31)
            pred = _halfpel_pred_batch(ref, ndx, ndy, pby, pbx, bs)
            s = np.abs(curblks - pred).reshape(n, -1).sum(axis=1)
            better = s < best_sad
            best_sad = np.where(better, s, best_sad)
            best_dx = np.where(better, ndx, best_dx)
            best_dy = np.where(better, ndy, best_dy)
    return np.stack([best_dx, best_dy], axis=1), best_sad


def propagate_mvs(cur, ref, mb_y, mb_x, mvs, sads, max_mv=15, iters=2):
    """Spatial MV candidate propagation: each MB tries its neighbors' best
    full-pel MVs (the batched analogue of the reference's candidate Set A,
    mcenc.c:90-165), then re-refines locally."""
    # Build the MB grid from coordinates (MBs are on a 16px lattice).
    rows = mb_y // 16
    cols = mb_x // 16
    R, C = int(rows.max()) + 1, int(cols.max()) + 1
    grid = np.full((R, C), -1, dtype=np.int64)
    grid[rows, cols] = np.arange(len(mb_y))
    dy = mvs[:, 1].copy()
    dx = mvs[:, 0].copy()
    best = sads.copy()
    for _ in range(iters):
        for dr, dc in ((0, -1), (-1, 0), (-1, -1), (0, 1), (1, 0)):
            nr = np.clip(rows + dr, 0, R - 1)
            nc = np.clip(cols + dc, 0, C - 1)
            ni = grid[nr, nc]
            valid = ni >= 0
            cdy = np.where(valid, dy[np.maximum(ni, 0)], dy)
            cdx = np.where(valid, dx[np.maximum(ni, 0)], dx)
            same = (cdy == dy) & (cdx == dx)
            if same.all():
                continue
            s = _per_block_sad(cur, ref, mb_y, mb_x, 16, cdy, cdx)
            better = (s < best) & ~same
            best = np.where(better, s, best)
            dy = np.where(better, cdy, dy)
            dx = np.where(better, cdx, dx)
        dy, dx, best = _refine(cur, ref, mb_y, mb_x, 16, dy, dx, best, max_mv, 1)
    dy = np.clip(dy, -max_mv, max_mv)
    dx = np.clip(dx, -max_mv, max_mv)
    return np.stack([dx, dy], axis=1), best
