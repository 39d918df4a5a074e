"""theora_tpu: a TPU-native (JAX/XLA/Pallas) video codec framework with the
capabilities of Theora (VP3-derived): 8x8 DCT + quantization + DC prediction +
motion-compensated inter prediction + in-loop deblocking + DCT-token Huffman
entropy coding, bit-exact with the Theora specification on the decode side.

Architecture (TPU-first, not a port):
  - Pixel/transform work (iDCT/fDCT, quantize, MC, recon, loop filter, SAD/SATD)
    runs as batched tensor kernels over all fragments of a frame
    (JAX/XLA/Pallas); the reference's per-block C/assembly loops have no
    analogue here.
  - Bit-serial entropy coding and Ogg packet assembly run on host (numpy /
    C++), structured around the per-(plane, zigzag) token-list layout that
    makes coefficient reconstruction data-parallel.
  - Multi-device scaling shards keyframe-delimited GOPs / independent frames
    across a jax.sharding.Mesh; see theora_tpu.parallel.

Reference behavior documented against xiph/theora (libtheora 1.2) under
/root/reference; citations in docstrings are file:line into that tree.
"""

__version__ = "0.1.0"


def _honor_jax_platforms_env():
    """Make an explicit JAX_PLATFORMS env var stick.

    Some environments register an experimental TPU plugin from
    sitecustomize at interpreter start and force jax_platforms via
    jax.config, which silently overrides the JAX_PLATFORMS environment
    variable.  Tests and CI set JAX_PLATFORMS=cpu for hermetic runs and
    spawn tools as subprocesses; without this fixup those subprocesses
    dial TPU hardware (and hang when it is unreachable).  Only acts when
    the env var is explicitly set, so production imports stay untouched.
    """
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        import jax
    except ImportError:
        return
    if jax.config.jax_platforms != want:
        jax.config.update("jax_platforms", want)


_honor_jax_platforms_env()

from theora_tpu.info import TheoraInfo, PixelFormat, ColorSpace  # noqa: F401
