"""Multi-device scaling: GOP/frame data parallelism over a device mesh.

The codec has no model weights; the scaling axes are (SURVEY.md section 2.7):
  - "gop": independent frames / keyframe-delimited GOPs, data-parallel.
  - "frag": fragments within a frame, for very large frames.

Shared artifacts (dequant tables, Huffman codebooks) are tiny and replicated.
Rate-control statistics are the one cross-shard dependency: a psum over the
mesh mirrors the reservoir all-reduce a CBR encode spanning shards needs.
Entropy-coded bytes are gathered to host in stream order for Ogg muxing.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from theora_tpu.ops import transforms_jax as tj


def make_mesh(
    n_devices: int | None = None, frag_axis: int = 1, devices=None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    gop = n // frag_axis
    dev_array = np.array(devices).reshape(gop, frag_axis)
    return Mesh(dev_array, ("gop", "frag"))


def gop_encode_step(mesh: Mesh):
    """Build a pjit-compiled GOP-parallel intra encode step.

    Returns fn(plane_blocks [B, N, 8, 8] u8, dequant_zz [64] i32)
      -> (qdct [B, N, 64], recon [B, N, 8, 8], frame_bits_est [B],
          total_bits_est scalar replicated)
    with B sharded over "gop", N sharded over "frag", and the total-bits
    estimate psum-reduced over the whole mesh (the rate-control collective).
    """
    from jax.experimental.shard_map import shard_map

    def step(plane_blocks, dequant_zz):
        res = plane_blocks.astype(jnp.int32) - 128
        dct = tj.fdct8x8(res)
        qdct = tj.quantize(dct, dequant_zz)
        dc_only = (qdct[..., 1:] == 0).all(axis=-1)
        B, N = qdct.shape[0], qdct.shape[1]
        flat = qdct.reshape(-1, 64)
        residual = tj.dequantize_idct(
            flat,
            jnp.broadcast_to(dequant_zz, flat.shape),
            flat[:, 0],
            jnp.broadcast_to(dequant_zz[0], (flat.shape[0],)),
            dc_only.reshape(-1),
        ).reshape(plane_blocks.shape)
        recon = tj.recon_intra(residual)
        # Crude bit estimate: ~6 bits per nonzero coefficient + 1/block.
        nz = (qdct != 0).sum(axis=(1, 2))
        # Per-frame totals need the fragment shards combined first.
        frame_bits = jax.lax.psum(6 * nz + qdct.shape[1], "frag")
        # Rate-control collective: total bits across the whole mesh.
        total = jax.lax.psum(frame_bits.sum(), "gop")
        return qdct, recon, frame_bits, total

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P("gop", "frag", None, None), P()),
        out_specs=(
            P("gop", "frag", None),
            P("gop", "frag", None, None),
            P("gop"),
            P(),
        ),
    )
    return jax.jit(sharded)


def shard_frames(mesh: Mesh, plane_blocks: np.ndarray):
    """Device-put a frame batch with (gop, frag) sharding."""
    sharding = NamedSharding(mesh, P("gop", "frag", None, None))
    return jax.device_put(plane_blocks, sharding)
