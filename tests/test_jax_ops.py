"""JAX TPU op twins must be bit-exact vs the numpy reference ops (which are
themselves validated against the C reference)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from theora_tpu.ops import idct_np, fdct_np  # noqa: E402
from theora_tpu.ops import transforms_jax as tj  # noqa: E402


def test_idct_jax_matches_numpy():
    rng = np.random.RandomState(3)
    x = rng.randint(-8100, 8101, size=(256, 8, 8)).astype(np.int32)
    ref = idct_np.idct8x8_batch(x)
    out = np.asarray(jax.jit(tj.idct8x8)(jnp.asarray(x)))
    assert np.array_equal(out, ref)


def test_fdct_jax_matches_numpy():
    rng = np.random.RandomState(4)
    x = rng.randint(-255, 256, size=(256, 8, 8)).astype(np.int64)
    ref = fdct_np.fdct8x8_batch(x)
    out = np.asarray(jax.jit(tj.fdct8x8)(jnp.asarray(x, dtype=jnp.int32)))
    assert np.array_equal(out, ref)


def test_quantize_jax_matches_numpy():
    rng = np.random.RandomState(5)
    dct = rng.randint(-6000, 6001, size=(128, 64)).astype(np.int32)
    deq = rng.randint(8, 4097, size=(64,)).astype(np.uint16)
    ref = fdct_np.quantize_batch(dct, deq)
    out = np.asarray(
        jax.jit(tj.quantize)(jnp.asarray(dct), jnp.asarray(deq.astype(np.int32)))
    )
    assert np.array_equal(out, ref)


def test_dc_fill_jax():
    rng = np.random.RandomState(6)
    dc = rng.randint(-580, 581, size=(64,))
    q = rng.randint(16, 4097, size=(64,))
    ref = idct_np.dc_fill_batch(dc, q)
    out = np.asarray(jax.jit(tj.dc_fill)(jnp.asarray(dc, jnp.int32), jnp.asarray(q, jnp.int32)))
    assert np.array_equal(out, ref)
