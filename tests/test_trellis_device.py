"""Batched device trellis (ops/transforms_jax.trellis_values).

Contract: the device DP chooses quantized AC values whose exact host
cost model value -- d^2 + lambda * (Huffman code length + extra bits of
the greedy tokenization) -- is never worse in aggregate than the host
Viterbi tokenizer's choices (tokenize.py trellis_plan), because its
dense run transitions are a superset of the host DP's chain moves.
Per-block small losses are allowed only for float32 ties.
"""
import numpy as np
import pytest

from theora_tpu import tables
from theora_tpu.constants import DCT_TOKEN_EXTRA_BITS
from theora_tpu.encode.encoder import _ZZI_GROUP
from theora_tpu.encode.tokenize import TokenLog, trellis_plan


def _nb_tables():
    nbt = np.zeros((5, 32), np.int64)
    for gi in range(5):
        for t in range(32):
            nbt[gi, t] = (
                tables.VP31_HUFF_CODES[gi << 4][t][1]
                + DCT_TOKEN_EXTRA_BITS[t]
            )
    return nbt, nbt[_ZZI_GROUP].astype(np.float32)


def _rtn(dct, dq):
    v2 = np.abs(dct) << 1
    q = (v2 + dq) // (2 * dq)
    return np.sign(dct) * np.where(v2 >= dq, q, 0)


def _plan_cost(dct_row, vals_row, dq, lam, nbt):
    """Exact cost of a value assignment under the host model: greedy
    tokenization bits (+ one terminal EOB) at lambda, plus coding d^2."""
    log = TokenLog()
    log.tokenize_block(0, vals_row)
    bits = 0
    for zzi in range(64):
        for t in log.tokens[0][zzi]:
            bits += int(nbt[_ZZI_GROUP[zzi], t])
    if log.eob_run[0].sum() > 0:
        zz = int(np.nonzero(log.eob_run[0])[0][0])
        bits += int(nbt[_ZZI_GROUP[zz], 0])
    d = dct_row - vals_row * dq
    return float((d * d).sum()) + lam * bits


@pytest.mark.parametrize(
    "lam,acmin,occ,scale,seed",
    [(50.0, 3, 0.8, 1200, 1), (800.0, 0, 0.3, 300, 2),
     (120.0, 3, 0.15, 2000, 3), (2000.0, 0, 0.6, 150, 4)],
)
def test_device_plans_never_worse_in_aggregate(lam, acmin, occ, scale,
                                               seed):
    import jax.numpy as jnp

    from theora_tpu.ops import transforms_jax as tj

    nbt, nb_full = _nb_tables()

    def nb(zzi, token):
        return int(nbt[_ZZI_GROUP[zzi], token])

    rng = np.random.RandomState(seed)
    N = 96
    dq = np.full(64, 40, np.int64)
    dq[0] = 15
    mag = (
        rng.randn(N, 64) * (scale / (1 + np.arange(64)))[None, :]
    ).astype(np.int64)
    dct = np.where(rng.rand(N, 64) < occ, mag, 0)
    q0 = _rtn(dct, dq)
    vd = np.asarray(tj.trellis_values(
        jnp.asarray(dct.astype(np.int32)), jnp.asarray(q0.astype(np.int32)),
        jnp.asarray(np.broadcast_to(dq, (N, 64)).astype(np.int32)),
        jnp.full((N,), lam, jnp.float32), jnp.asarray(nb_full),
        jnp.full((N,), acmin, jnp.int32),
    ))
    assert np.abs(vd).max() <= 580
    # DC is passed through untouched.
    assert np.array_equal(vd[:, 0], q0[:, 0])
    dsum = hsum = 0.0
    losses = 0
    for bi in range(N):
        _path, _bits, vals = trellis_plan(
            dct[bi], q0[bi].copy(), dq, lam, acmin, nb
        )
        hv = np.zeros(64, np.int64)
        for pos, qc in vals:
            hv[pos] = qc
        dv = vd[bi].astype(np.int64)
        dv[0] = 0
        dr = dct[bi].copy()
        dr[0] = 0
        cd = _plan_cost(dr, dv, dq, lam, nbt)
        ch = _plan_cost(dr, hv, dq, lam, nbt)
        dsum += cd
        hsum += ch
        losses += cd > ch + 1e-6
    assert dsum <= hsum * 1.0005, (dsum, hsum)
    assert losses <= N // 16, losses


def test_trellis_tier_beats_rd_quantizer_at_equal_quality():
    """The trellis-quantized device tier must RD-match-or-beat the
    heuristic R/D quantizer it replaced AT EQUAL QUALITY (each qi's
    operating point shifts toward lower rate, so same-qi PSNR is the
    wrong axis): at both ends of the curve the trellis reaches the rd
    tier's PSNR with fewer (or equal) bytes."""
    import os

    from tests.conftest import TESTDATA
    from theora_tpu.encode.tpu_gop import TpuGopEncoder
    from theora_tpu.headers import parse_info_header, parse_setup_header
    from theora_tpu.decode.decoder import Decoder
    from theora_tpu.info import TheoraInfo

    w, h, n = 64, 48, 8
    raw = np.fromfile(os.path.join(TESTDATA, "clip64x48.i420"), np.uint8)
    fsz = w * h * 3 // 2
    frames = []
    for i in range(n):
        fr = raw[i * fsz : (i + 1) * fsz]
        frames.append([
            fr[: w * h].reshape(h, w),
            fr[w * h : w * h + w * h // 4].reshape(h // 2, w // 2),
            fr[w * h + w * h // 4 :].reshape(h // 2, w // 2),
        ])
    info = TheoraInfo(
        frame_width=w, frame_height=h, pic_width=w, pic_height=h,
        quality=40,
    )

    def run(qi, use_trellis):
        enc = TpuGopEncoder(info, qi=qi, use_trellis=use_trellis)
        # Pin masking off: this test isolates the trellis-vs-heuristic
        # quantizer axis, and the tier's "auto" default engages the
        # 3-qi triple at the high-qi points, moving the operating
        # point up-rate/up-quality for a different reason.
        enc.adaptive_quant = False
        pkts = enc.encode_clip(frames, keyframe_freq=8)
        dinfo = parse_info_header(pkts[0].data)
        setup = parse_setup_header(pkts[2].data)
        dec = Decoder(dinfo, setup)
        errs = []
        for i, p in enumerate(pkts[3:]):
            dec.decode_packet(p.data)
            y = np.asarray(dec.ycbcr_out()[0], np.float64)
            errs.append(np.mean((y - frames[i][0].astype(np.float64)) ** 2))
        psnr = 10 * np.log10(255 ** 2 / np.mean(errs))
        return sum(len(p.data) for p in pkts[3:]), psnr

    # Low end: at ~equal bytes the trellis must not lose quality.
    b_rd, p_rd = run(32, False)
    b_tr, p_tr = run(40, True)
    assert b_tr <= b_rd * 1.05, (b_tr, b_rd)
    assert p_tr >= p_rd - 0.05, (p_tr, p_rd)
    # High end: at ~equal PSNR the trellis must use fewer bytes.
    b_rd, p_rd = run(48, False)
    b_tr, p_tr = run(56, True)
    assert p_tr >= p_rd - 0.1, (p_tr, p_rd)
    assert b_tr < b_rd, (b_tr, b_rd)
