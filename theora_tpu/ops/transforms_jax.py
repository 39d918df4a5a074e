"""JAX/XLA TPU implementations of the codec transforms.

Bit-exact integer twins of the numpy ops (idct_np.py, fdct_np.py):
all arithmetic in int32 with explicit int16 wraparound where the spec has
int16 stores, so results match the C reference exactly. Batched over all
fragments of a frame -- the TPU-native replacement for the reference's
per-block SIMD kernels (lib/x86/*, lib/arm/*).

These run under jit; the VPU executes the elementwise integer ops and XLA
fuses the whole transform chain into a handful of kernels.
"""
from __future__ import annotations

import jax.numpy as jnp

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
from theora_tpu.debug import DEBUG as _DBG


def _i16(x):
    """int16 wraparound in int32 domain.

    On legal streams the wrap is the identity; THEORA_TPU_DEBUG=1 arms
    an assertion that it stayed one (theora_tpu/debug.py)."""
    w = ((x + 0x8000) & 0xFFFF) - 0x8000
    if _DBG:
        from theora_tpu.debug import check_wrap

        w = check_wrap(w, x, "transforms_jax._i16")
    return w


def _mul16(c, x):
    """(c * x) >> 16 with c a small positive constant, exact vs C int32."""
    return (c * x) >> 16


def idct8(x):
    """1-D 8-point iDCT along the last axis (idct.c:30-81); int32."""
    t0 = _mul16(C4S4, _i16(x[..., 0] + x[..., 4]))
    t1 = _mul16(C4S4, _i16(x[..., 0] - x[..., 4]))
    t2 = _mul16(C6S2, x[..., 2]) - _mul16(C2S6, x[..., 6])
    t3 = _mul16(C2S6, x[..., 2]) + _mul16(C6S2, x[..., 6])
    t4 = _mul16(C7S1, x[..., 1]) - _mul16(C1S7, x[..., 7])
    t5 = _mul16(C3S5, x[..., 5]) - _mul16(C5S3, x[..., 3])
    t6 = _mul16(C5S3, x[..., 5]) + _mul16(C3S5, x[..., 3])
    t7 = _mul16(C1S7, x[..., 1]) + _mul16(C7S1, x[..., 7])
    r = t4 + t5
    t5 = _mul16(C4S4, _i16(t4 - t5))
    t4 = r
    r = t7 + t6
    t6 = _mul16(C4S4, _i16(t7 - t6))
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
    return jnp.stack(
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


def idct8x8(coeffs):
    """Dense 2-D iDCT: [N, 8, 8] int32 natural-order coefficients ->
    [N, 8, 8] residuals (idct.c:285-296)."""
    w = jnp.swapaxes(idct8(coeffs), -1, -2)
    y = jnp.swapaxes(idct8(w), -1, -2)
    return _i16(y + 8 >> 4)


def dc_fill(dc, dc_quant):
    """[N] -> [N, 8, 8]: DC-only blocks (state.c:967-975)."""
    p = _i16(dc * dc_quant + 15 >> 5)
    return jnp.broadcast_to(p[:, None, None], (*p.shape, 8, 8))


def fdct8(x):
    """1-D 8-point fDCT along the last axis (fdct.c:27-120); int32."""
    t0 = x[..., 0] + x[..., 7]
    t7 = x[..., 0] - x[..., 7]
    t1 = x[..., 1] + x[..., 6]
    t6 = x[..., 1] - x[..., 6]
    t2 = x[..., 2] + x[..., 5]
    t5 = x[..., 2] - x[..., 5]
    t3 = x[..., 3] + x[..., 4]
    t4 = x[..., 3] - x[..., 4]
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
    s = ((C6S2 * u) >> 16) - t2
    v = ((s * 21600 + 0x2800) >> 18) + s + nz(s)
    y2, y6 = u, v
    u = ((C5S3 * t6 + C3S5 * t5 + 0x0E3D) >> 16) + nz(t5)
    s = t6 - ((C5S3 * u) >> 16)
    v = ((s * 26568 + 0x3400) >> 17) + s + nz(s)
    y5, y3 = u, v
    u = ((C7S1 * t4 + C1S7 * t7 + 0x7B1B) >> 16) + nz(t7)
    s = ((C7S1 * u) >> 16) - t4
    v = ((s * 20539 + 0x3000) >> 20) + s + nz(s)
    y1, y7 = u, v
    return _i16(jnp.stack([y0, y1, y2, y3, y4, y5, y6, y7], axis=-1))


# Keep as a host numpy constant: a module-level device array would be
# committed to the default backend at import time and force transfers when
# used from another backend's jit.
import numpy as np  # noqa: E402

_ZZ = np.asarray(ZIGZAG_TO_NAT[:64])


def fdct8x8(res):
    """[..., N, 8, 8] residuals -> [..., N, 64] zig-zag DCT coefficients
    (fdct.c:128-154); any leading batch dims."""
    w = res.astype(jnp.int32) << 2
    w = w.at[..., 0, 0].add((w[..., 0, 0] != 0).astype(jnp.int32) + 1)
    w = w.at[..., 0, 1].add(1)
    w = w.at[..., 1, 0].add(-1)
    y = fdct8(jnp.swapaxes(w, -1, -2))
    w2 = fdct8(jnp.swapaxes(y, -1, -2))
    flat = w2.reshape(*w2.shape[:-2], 64)
    return _i16(flat[..., _ZZ] + 2 >> 2)


def quantize(dct_zz, dequant_zz):
    """Round-to-nearest quantizer (enquant.c:220-249); int32."""
    d = dequant_zz.astype(jnp.int32)
    v2 = jnp.abs(dct_zz) << 1
    q = (v2 + d) // (2 * d)
    q = jnp.where(v2 >= d, q, 0)
    return jnp.sign(dct_zz) * q


# Token-cost model of the R/D quantizer (ops/fdct_np.py _MAG_BITS).
_MAG_BITS_J = np.array(
    [0.0, 4.5, 5.5, 6.5, 6.5, 7.5, 7.5, 8.5, 9.5], dtype=np.float32
)


def quantize_rd(dct_zz, dequant_zz, lam):
    """JAX twin of ops/fdct_np.quantize_rd_batch: per-AC-coefficient
    magnitude reduction, isolated-coefficient kill and tail kill, each
    accepted when it wins d^2 + lambda*bits.  Errors are evaluated in
    float32 (deterministic elementwise IEEE ops, so results are identical
    across backends and mesh shardings; the closed loop reconstructs from
    whatever this returns, so bitstream validity never depends on the
    decisions).

    dct_zz/dequant_zz: [N, 64] int32; lam: [N] float32.  Returns [N, 64]
    int32.
    """
    q0 = quantize(dct_zz, dequant_zz)
    d = dequant_zz.astype(jnp.float32)
    av = jnp.abs(dct_zz).astype(jnp.float32)
    lamc = lam[:, None]
    a0 = jnp.abs(q0)
    a1 = jnp.maximum(a0 - 1, 0)
    mb = jnp.asarray(_MAG_BITS_J)
    err0 = (a0.astype(jnp.float32) * d - av) ** 2
    err1 = (a1.astype(jnp.float32) * d - av) ** 2
    bits0 = mb[jnp.minimum(a0, 8)]
    bits1 = mb[jnp.minimum(a1, 8)]
    take1 = err1 + lamc * bits1 <= err0 + lamc * bits0
    out = jnp.where(take1, jnp.sign(q0) * a1, q0)
    out = out.at[:, 0].set(q0[:, 0])  # never degrade DC
    # Isolated kill: a lone +-1 between zeros costs a whole run+value
    # token; two sweeps so newly isolated coefficients get a chance.
    ISO_BITS = jnp.float32(11.0)
    err_coded = (d - av) ** 2
    err_zero = av * av
    for _ in range(2):
        nz = out != 0
        left_zero = jnp.ones_like(nz).at[:, 2:].set(~nz[:, 1:-1])
        right_zero = jnp.ones_like(nz).at[:, :-1].set(~nz[:, 1:])
        iso = nz & left_zero & right_zero & (jnp.abs(out) == 1)
        iso = iso.at[:, 0].set(False)
        kill = iso & (err_zero - err_coded <= lamc * ISO_BITS)
        out = jnp.where(kill, 0, out)
    # Tail kill: dropping a block's last nonzero +-1 removes a token and
    # usually merges EOB runs.
    TAIL_BITS = jnp.float32(14.0)
    rows = jnp.arange(out.shape[0])
    for _ in range(4):
        nz = out != 0
        nz = nz.at[:, 0].set(False)
        has = nz.any(axis=1)
        last = 63 - jnp.argmax(nz[:, ::-1], axis=1)
        q_at = out[rows, last]
        d_at = d[rows, last]
        v_at = av[rows, last]
        ec = (jnp.abs(q_at).astype(jnp.float32) * d_at - v_at) ** 2
        ez = v_at * v_at
        kill = has & (jnp.abs(q_at) == 1) & (ez - ec <= lam * TAIL_BITS)
        out = out.at[rows, last].set(jnp.where(kill, 0, q_at))
    return out


def dequantize_idct(coeffs_zz, dequant_zz, dc, dc_quant, dc_only):
    """Full reconstruction of residual blocks on TPU.

    coeffs_zz: [N, 64] int32 quantized coefficients (zig-zag order,
      DC slot ignored).
    dequant_zz: [N, 64] dequant factors (zig-zag).
    dc: [N] predicted DC values; dc_quant: [N].
    dc_only: [N] bool -- blocks where the decoder takes the last_zzi<2 path.
    Returns [N, 8, 8] int32 residuals.
    """
    deq = _i16(coeffs_zz * dequant_zz.astype(jnp.int32))
    deq = deq.at[:, 0].set(_i16(dc * dc_quant))
    nat = jnp.zeros_like(deq).at[:, _ZZ].set(deq)
    full = idct8x8(nat.reshape(-1, 8, 8))
    return jnp.where(dc_only[:, None, None], dc_fill(dc, dc_quant), full)


def recon_intra(residual):
    """(fragment.c:49-57)"""
    return jnp.clip(residual + 128, 0, 255).astype(jnp.uint8)


def recon_inter(residual, pred):
    """(fragment.c:59-80); pred already averaged for half-pel."""
    return jnp.clip(residual + pred, 0, 255).astype(jnp.uint8)
