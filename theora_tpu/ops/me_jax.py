"""Batched device motion estimation (JAX/XLA).

TPU-native replacement for the reference's per-MB scalar search
(mcenc.c:268-548): every macroblock of every frame of a GOP is searched
in one jitted dispatch.  Three stages, all integer and deterministic
(ties break on a fixed candidate order, so results are identical on any
backend or mesh sharding):

  1. coarse: exhaustive +-7 full-pel search on a 2x sum-pooled pyramid,
     evaluated as whole-plane shifted absolute differences box-summed per
     MB (one lax.scan over the 225 displacements);
  2. refine: +-2 full-pel window around the doubled coarse vector at
     full resolution (per-MB gathers, scan over the 25 displacements);
  3. half-pel: the 8 half-pel neighbours scored with the exact two-tap
     prediction the reconstruction uses (truncating MVMAP offsets,
     decode path state.c:846-957).

The search runs on the *original* (un-reconstructed) previous/golden
frames, mirroring the reference's OC_FRAME_*_ORIG design
(mcenc.c:314-316) -- this is what makes whole-GOP batching legal: ME for
every frame depends only on source frames, never on the closed loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_COARSE_R = 7
_REFINE_R = 2
_MV_MAX = 15  # full-pel; half-pel range is +-31 (bitstream limit)


def _coarse_cands() -> np.ndarray:
    """Displacements sorted by radius so ties prefer short vectors."""
    ds = [(dy, dx)
          for dy in range(-_COARSE_R, _COARSE_R + 1)
          for dx in range(-_COARSE_R, _COARSE_R + 1)]
    ds.sort(key=lambda d: (d[0] * d[0] + d[1] * d[1], d))
    return np.asarray(ds, dtype=np.int32)


def _refine_cands() -> np.ndarray:
    ds = [(dy, dx)
          for dy in range(-_REFINE_R, _REFINE_R + 1)
          for dx in range(-_REFINE_R, _REFINE_R + 1)]
    ds.sort(key=lambda d: (d[0] * d[0] + d[1] * d[1], d))
    return np.asarray(ds, dtype=np.int32)


def _sumpool2(x):
    F, H, W = x.shape
    return (
        x.astype(jnp.int32)
        .reshape(F, H // 2, 2, W // 2, 2)
        .sum(axis=(2, 4))
    )


def _box_mb(diff, mb):
    """[F, H, W] -> [F, H//mb, W//mb] box sums."""
    F, H, W = diff.shape
    return diff.reshape(F, H // mb, mb, W // mb, mb).sum(axis=(2, 4))


def _gather_mb16(plane_p, oy, ox, pad):
    """Gather one frame's 16x16 MBs at per-MB offsets from a padded
    plane.  plane_p: [Hp, Wp]; oy/ox: [nv, nh] pixel offsets."""
    nv, nh = oy.shape
    mby = pad + 16 * jnp.arange(nv)[:, None] + oy
    mbx = pad + 16 * jnp.arange(nh)[None, :] + ox
    ay = mby[:, :, None, None] + jnp.arange(16)[None, None, :, None]
    ax = mbx[:, :, None, None] + jnp.arange(16)[None, None, None, :]
    return plane_p[ay, ax]


@functools.partial(jax.jit, static_argnames=())
def me_search(cur, ref):
    """Full+half-pel search: cur/ref [F, H, W] uint8 (H, W multiples of
    16).  Returns (mv [F, nv, nh, 2] int32 half-pel units (dx, dy),
    sad_mv [F, nv, nh] int32, sad_nomv [F, nv, nh] int32)."""
    F, H, W = cur.shape
    nv, nh = H // 16, W // 16
    curi = cur.astype(jnp.int32)
    refi = ref.astype(jnp.int32)

    # ---- coarse, half resolution --------------------------------------
    cur2 = _sumpool2(cur)
    ref2 = _sumpool2(ref)
    R2 = _COARSE_R + 1
    ref2p = jnp.pad(ref2, ((0, 0), (R2, R2), (R2, R2)), mode="edge")

    def coarse_step(carry, d):
        best_sad, best_d = carry
        shifted = jax.lax.dynamic_slice(
            ref2p, (0, R2 + d[0], R2 + d[1]), cur2.shape
        )
        sad = _box_mb(jnp.abs(cur2 - shifted), 8)
        better = sad < best_sad
        best_sad = jnp.where(better, sad, best_sad)
        best_d = jnp.where(better[..., None], d[None, None, None, :], best_d)
        return (best_sad, best_d), None

    init = (
        jnp.full((F, nv, nh), jnp.iinfo(jnp.int32).max, jnp.int32),
        jnp.zeros((F, nv, nh, 2), jnp.int32),
    )
    (c_sad, c_d), _ = jax.lax.scan(
        coarse_step, init, jnp.asarray(_coarse_cands())
    )

    # ---- full-pel refine around 2x coarse -----------------------------
    PAD = 18
    refp = jnp.pad(refi, ((0, 0), (PAD, PAD), (PAD, PAD)), mode="edge")
    cur_mb = curi.reshape(F, nv, 16, nh, 16).transpose(0, 1, 3, 2, 4)
    base = 2 * c_d  # [F, nv, nh, 2] (dy, dx)

    gather = jax.vmap(_gather_mb16, in_axes=(0, 0, 0, None))

    def refine_step(carry, d):
        best_sad, best_d = carry
        oy = jnp.clip(base[..., 0] + d[0], -_MV_MAX, _MV_MAX)
        ox = jnp.clip(base[..., 1] + d[1], -_MV_MAX, _MV_MAX)
        blocks = gather(refp, oy, ox, PAD)
        sad = jnp.abs(cur_mb - blocks).sum(axis=(3, 4))
        cand = jnp.stack([oy, ox], axis=-1)
        better = sad < best_sad
        best_sad = jnp.where(better, sad, best_sad)
        best_d = jnp.where(better[..., None], cand, best_d)
        return (best_sad, best_d), None

    init = (
        jnp.full((F, nv, nh), jnp.iinfo(jnp.int32).max, jnp.int32),
        jnp.zeros((F, nv, nh, 2), jnp.int32),
    )
    (f_sad, f_d), _ = jax.lax.scan(
        refine_step, init, jnp.asarray(_refine_cands())
    )

    # ---- half-pel refine ----------------------------------------------
    # Candidate m in half-pel units; prediction = (ref[trunc(m/2)] +
    # ref[trunc(m/2) + sign(m)*(m&1)]) >> 1 -- the exact MC kernel.
    hp_cands = np.asarray(
        sorted(
            [(hy, hx) for hy in (-1, 0, 1) for hx in (-1, 0, 1)],
            key=lambda d: (d[0] * d[0] + d[1] * d[1], d),
        ),
        dtype=np.int32,
    )

    def hp_step(carry, d):
        best_sad, best_m = carry
        my = jnp.clip(2 * f_d[..., 0] + d[0], -2 * _MV_MAX - 1,
                      2 * _MV_MAX + 1)
        mx = jnp.clip(2 * f_d[..., 1] + d[1], -2 * _MV_MAX - 1,
                      2 * _MV_MAX + 1)
        o1y = jnp.sign(my) * (jnp.abs(my) >> 1)
        o1x = jnp.sign(mx) * (jnp.abs(mx) >> 1)
        o2y = o1y + jnp.sign(my) * (jnp.abs(my) & 1)
        o2x = o1x + jnp.sign(mx) * (jnp.abs(mx) & 1)
        b1 = gather(refp, o1y, o1x, PAD)
        b2 = gather(refp, o2y, o2x, PAD)
        pred = (b1 + b2) >> 1
        sad = jnp.abs(cur_mb - pred).sum(axis=(3, 4))
        cand = jnp.stack([mx, my], axis=-1)  # (dx, dy) order for the API
        better = sad < best_sad
        best_sad = jnp.where(better, sad, best_sad)
        best_m = jnp.where(better[..., None], cand, best_m)
        return (best_sad, best_m), None

    init = (
        jnp.full((F, nv, nh), jnp.iinfo(jnp.int32).max, jnp.int32),
        jnp.zeros((F, nv, nh, 2), jnp.int32),
    )
    (h_sad, h_m), _ = jax.lax.scan(hp_step, init, jnp.asarray(hp_cands))

    sad_nomv = _box_mb(jnp.abs(curi - refi), 16)
    return h_m, h_sad, sad_nomv


@jax.jit
def mv_cand_sads(cur, ref, cand):
    """SAD of every MB against K shared half-pel candidate vectors.

    cur/ref: [F, H, W] u8; cand: [F, K, 2] int32 (dx, dy) half-pel.
    Returns [F, K, nv, nh] int32.  Feeds the host's LAST/LAST2-aware
    sequential mode decision (the decoder's MV predictors are shared
    across macroblock runs, so their SADs are whole-plane shifts --
    one dynamic slice per (frame, candidate)).
    """
    F, H, W = cur.shape
    curi = cur.astype(jnp.int32)
    refi = ref.astype(jnp.int32)
    PAD = 17
    refp = jnp.pad(refi, ((0, 0), (PAD, PAD), (PAD, PAD)), mode="edge")

    def one_frame(cf, rp, cands):
        def one_cand(carry, m):
            mx, my = m[0], m[1]
            o1y = jnp.sign(my) * (jnp.abs(my) >> 1)
            o1x = jnp.sign(mx) * (jnp.abs(mx) >> 1)
            o2y = o1y + jnp.sign(my) * (jnp.abs(my) & 1)
            o2x = o1x + jnp.sign(mx) * (jnp.abs(mx) & 1)
            s1 = jax.lax.dynamic_slice(rp, (PAD + o1y, PAD + o1x), (H, W))
            s2 = jax.lax.dynamic_slice(rp, (PAD + o2y, PAD + o2x), (H, W))
            pred = (s1 + s2) >> 1
            sad = _box_mb(jnp.abs(cf - pred)[None], 16)[0]
            return carry, sad
        _, sads = jax.lax.scan(one_cand, 0, cands)
        return sads

    return jax.vmap(one_frame)(curi, refp, cand)


@jax.jit
def sad_nomv_vs(cur, ref):
    """Zero-MV SAD per MB: cur [F, H, W] u8, ref [H, W] or [F, H, W]."""
    refi = ref.astype(jnp.int32)
    if refi.ndim == 2:
        refi = refi[None]
    return _box_mb(jnp.abs(cur.astype(jnp.int32) - refi), 16)


@jax.jit
def sad_intra_mb(cur):
    """Host-policy intra proxy: per-MB sum over its four 8x8 luma blocks
    of the absolute deviation from the block mean (encoder.py mode
    decision)."""
    F, H, W = cur.shape
    nv, nh = H // 16, W // 16
    b8 = (
        cur.astype(jnp.int32)
        .reshape(F, nv * 2, 8, nh * 2, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(F, nv * 2, nh * 2, 64)
    )
    dev = jnp.abs(b8 - (b8.sum(axis=-1, keepdims=True) >> 6)).sum(axis=-1)
    return (
        dev.reshape(F, nv, 2, nh, 2).sum(axis=(2, 4))
    )
