"""th_* compat API shim round trip."""
import os

import numpy as np

from tests.conftest import TESTDATA
from theora_tpu import compat
from theora_tpu.info import TheoraInfo
from theora_tpu.tpkt import read_tpkt


def test_compat_encode_decode():
    W, H = 64, 48
    raw = np.fromfile(os.path.join(TESTDATA, "clip64x48.i420"), np.uint8)
    fsz = W * H * 3 // 2
    f = raw[:fsz]
    frame = [
        f[: W * H].reshape(H, W),
        f[W * H : W * H + fsz // 6].reshape(H // 2, W // 2),
        f[W * H + fsz // 6 :].reshape(H // 2, W // 2),
    ]
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H, quality=40
    )
    enc = compat.th_encode_alloc(info)
    assert enc.ctl(compat.TH_ENCCTL_SET_KEYFRAME_FREQUENCY_FORCE, 4) == 4
    assert enc.ctl(compat.TH_ENCCTL_GET_SPLEVEL_MAX) == 2
    headers = []
    while True:
        p = enc.flushheader()
        if p is None:
            break
        headers.append(p)
    assert len(headers) == 3
    assert compat.th_packet_isheader(headers[0].data)
    enc.ycbcr_in(frame)
    pkt = enc.packetout(True)
    assert compat.th_packet_iskeyframe(pkt.data) == 1

    state = {}
    for h in headers:
        h.b_o_s = h.packetno == 0
        assert compat.th_decode_headerin(state, h) > 0
    assert compat.th_decode_headerin(state, pkt) == 0
    dec = compat.th_decode_alloc(state)
    ret, gp = dec.packetin(pkt.data)
    assert ret == 0 and gp == pkt.granulepos
    out = dec.ycbcr_out()
    assert out[0].shape == (H, W)


def test_packet_classifiers():
    pkts = read_tpkt(os.path.join(TESTDATA, "clip64x48_k8_q20.tpkt"))
    assert compat.th_packet_isheader(pkts[0].data)
    assert not compat.th_packet_isheader(pkts[3].data)
    assert compat.th_packet_iskeyframe(pkts[3].data) == 1
    assert compat.th_packet_iskeyframe(pkts[4].data) == 0


def test_custom_quant_params_and_stripe_cb():
    from theora_tpu import tables

    W, H = 64, 48
    raw = np.fromfile(os.path.join(TESTDATA, "clip64x48.i420"), np.uint8)
    fsz = W * H * 3 // 2
    f = raw[:fsz]
    frame = [
        f[: W * H].reshape(H, W),
        f[W * H : W * H + fsz // 6].reshape(H // 2, W // 2),
        f[W * H + fsz // 6 :].reshape(H // 2, W // 2),
    ]
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H, quality=40
    )
    enc = compat.th_encode_alloc(info)
    assert enc.ctl(compat.TH_ENCCTL_SET_QUANT_PARAMS, tables.VP31_QUANT_INFO) == 0
    headers = []
    while True:
        p = enc.flushheader()
        if p is None:
            break
        headers.append(p)
    enc.ycbcr_in(frame)
    pkt = enc.packetout(True)
    state = {}
    for h in headers:
        h.b_o_s = h.packetno == 0
        assert compat.th_decode_headerin(state, h) > 0
    assert (
        state["setup"].qinfo["ac_scale"] == tables.VP31_QUANT_INFO["ac_scale"]
    )
    dec = compat.th_decode_alloc(state)
    stripes = []
    dec.ctl(compat.TH_DECCTL_SET_STRIPE_CB, lambda y, a, b: stripes.append((a, b)))
    ret, gp = dec.packetin(pkt.data)
    assert ret == 0
    assert stripes == [(0, H // 8)]
