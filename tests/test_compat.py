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
    assert enc.ctl(compat.TH_ENCCTL_GET_SPLEVEL_MAX) == 4
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
    dec.ctl(
        compat.TH_DECCTL_SET_STRIPE_CB,
        lambda y, a, b: stripes.append(
            (a, b, [p[(a * 8) >> (1 if i else 0) : (b * 8) >> (1 if i else 0)].copy()
                    for i, p in enumerate(y)])
        ),
    )
    ret, gp = dec.packetin(pkt.data)
    assert ret == 0
    # Striped decode: >1 invocation, delivered bottom-to-top (yfrag0
    # decreasing to 0, reference convention), ranges tiling [0, H//8).
    assert len(stripes) > 1
    ends = [s[1] for s in stripes]
    starts = [s[0] for s in stripes]
    assert ends[0] == H // 8 and starts[-1] == 0
    assert ends[1:] == starts[:-1]  # contiguous, decreasing
    # Delivered rows were final at callback time: match the finished frame.
    final = dec.ycbcr_out()
    for a, b, rows in stripes:
        for pli in range(3):
            sh = 1 if pli else 0
            np.testing.assert_array_equal(
                rows[pli], final[pli][(a * 8) >> sh : (b * 8) >> sh]
            )


def test_legacy_theora_api_roundtrip():
    """Pre-1.0 theora_* API (apiwrapper.c analogue): encode with
    theora_encode_* and decode with theora_decode_*."""
    import numpy as np

    from theora_tpu.compat import (
        theora_clear,
        theora_decode_YUVout,
        theora_decode_header,
        theora_decode_init,
        theora_decode_packetin,
        theora_encode_YUVin,
        theora_encode_header,
        theora_encode_init,
        theora_encode_packetout,
        theora_granule_time,
        theora_info,
        theora_info_init,
        theora_state,
    )

    W, H = 64, 48
    rng = np.random.RandomState(4)
    frames = [
        [
            ((np.mgrid[0:H, 0:W][1] * 3 + i * 5) % 256).astype(np.uint8),
            np.full((H // 2, W // 2), 90 + i, np.uint8),
            np.full((H // 2, W // 2), 160 - i, np.uint8),
        ]
        for i in range(4)
    ]
    ci = theora_info()
    theora_info_init(ci)
    ci.width = ci.frame_width = W
    ci.height = ci.frame_height = H
    ci.quality = 40
    ci.keyframe_frequency_force = 8
    st = theora_state()
    assert theora_encode_init(st, ci) == 0
    headers = []
    while True:
        p = theora_encode_header(st)
        if p is None:
            break
        headers.append(p)
    assert len(headers) == 3
    pkts = []
    for i, fr in enumerate(frames):
        theora_encode_YUVin(st, fr)
        ok, p = theora_encode_packetout(st, i == len(frames) - 1)
        assert ok == 1
        pkts.append(p)

    di = theora_info()
    theora_info_init(di)
    for h in headers:
        assert theora_decode_header(di, None, h) == 0
    ds = theora_state()
    assert theora_decode_init(ds, di) == 0
    for i, p in enumerate(pkts):
        assert theora_decode_packetin(ds, p) == 0
        out = theora_decode_YUVout(ds)
        err = out[0].astype(float) - frames[i][0].astype(float)
        psnr = 10 * np.log10(255.0**2 / max((err**2).mean(), 1e-9))
        assert psnr > 30
    assert theora_granule_time(ds, ds.granulepos) > 0
    theora_clear(st)
    theora_clear(ds)


def test_vp3_compatible_drop_frames():
    """VP3 compatibility: dropped frames emit explicit no-coded-blocks
    inter packets (encode.c:865-906) instead of 0-byte dups, with VP31
    tables, and the stream decodes in our decoder."""
    import numpy as np
    import os

    from tests.conftest import TESTDATA
    from theora_tpu import tables
    from theora_tpu.decode.decoder import Decoder
    from theora_tpu.encode.encoder import Encoder
    from theora_tpu.headers import parse_info_header, parse_setup_header
    from theora_tpu.info import TheoraInfo

    W, H = 64, 48
    raw = np.fromfile(os.path.join(TESTDATA, "clip64x48.i420"), np.uint8)
    fsz = W * H * 3 // 2
    frames = []
    for i in range(8):
        f = raw[:fsz]
        frames.append(
            [
                f[: W * H].reshape(H, W),
                f[W * H : W * H + fsz // 6].reshape(H // 2, W // 2),
                f[W * H + fsz // 6 :].reshape(H // 2, W // 2),
            ]
        )
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        quality=40, target_bitrate=8000, fps_numerator=30,
        fps_denominator=1,
    )
    enc = Encoder(info, qinfo=tables.VP31_QUANT_INFO,
                  huff_codes=tables.VP31_HUFF_CODES)
    enc.vp3_compatible = True
    enc.keyframe_freq = 8
    pkts = enc.flush_headers()
    for fr in frames:
        pkts.append(enc.encode_frame(fr))
    sizes = [len(p.data) for p in pkts[3:]]
    # Drops are explicit small inter packets, never 0-byte.
    assert all(s > 0 for s in sizes)
    assert any(0 < s < 20 for s in sizes), sizes
    dec = Decoder(parse_info_header(pkts[0].data),
                  parse_setup_header(pkts[2].data))
    for p in pkts[3:]:
        dec.decode_packet(p.data)
        dec.ycbcr_out()


def test_twopass_ctl_roundtrip():
    """TH_ENCCTL_2PASS_OUT / 2PASS_IN: pass-1 metrics flow through the
    ctl interface into a pass-2 encoder (theoraenc.h:268-344)."""
    import numpy as np

    from tests.conftest import TESTDATA
    import os

    from theora_tpu import compat
    from theora_tpu.info import TheoraInfo

    W, H = 64, 48
    raw = np.fromfile(os.path.join(TESTDATA, "clip64x48.i420"), np.uint8)
    fsz = W * H * 3 // 2
    frames = []
    for i in range(6):
        f = raw[(i * fsz) % (len(raw) - fsz):][:fsz]
        frames.append(
            [
                f[: W * H].reshape(H, W),
                f[W * H : W * H + fsz // 6].reshape(H // 2, W // 2),
                f[W * H + fsz // 6 :].reshape(H // 2, W // 2),
            ]
        )
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        quality=40, target_bitrate=64000, fps_numerator=30,
        fps_denominator=1,
    )
    # Pass 1, driven like encoder_example.c:1190-1226: placeholder
    # header before the first frame, per-frame records, then the real
    # summary after the last packet -- rewritten at file offset 0.
    enc1 = compat.th_encode_alloc(info)
    while enc1.flushheader() is not None:
        pass
    placeholder = enc1.ctl(compat.TH_ENCCTL_2PASS_OUT)
    assert isinstance(placeholder, bytes) and len(placeholder) == 38
    body = b""
    for i, fr in enumerate(frames):
        enc1.ycbcr_in(fr)
        rec = enc1.ctl(compat.TH_ENCCTL_2PASS_OUT)
        assert isinstance(rec, bytes) and len(rec) == 12
        body += rec
        enc1.packetout(i == len(frames) - 1)
    summary = enc1.ctl(compat.TH_ENCCTL_2PASS_OUT)
    assert isinstance(summary, bytes) and len(summary) == 38
    blob = summary + body
    # Pass 2: chunked feeding via the query protocol.
    info2 = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        quality=0, target_bitrate=64000, fps_numerator=30,
        fps_denominator=1,
    )
    enc2 = compat.th_encode_alloc(info2)
    while enc2.flushheader() is not None:
        pass
    pos = 0
    total = 0
    for i, fr in enumerate(frames):
        while True:
            want = enc2.ctl(compat.TH_ENCCTL_2PASS_IN)
            assert want >= 0
            if want == 0:
                break
            chunk = blob[pos : pos + min(want, 80)]
            assert chunk, "pass-2 input exhausted early"
            consumed = enc2.ctl(compat.TH_ENCCTL_2PASS_IN, chunk)
            assert consumed > 0
            pos += consumed
        enc2.ycbcr_in(fr)
        ok = enc2.packetout(i == len(frames) - 1)
        total += len(ok.data)
    assert total > 0


def test_set_compat_config(ref_tools, tmp_path):
    """TH_ENCCTL_SET_COMPAT_CONFIG: adopt the quant params + Huffman
    codes from a reference-encoder setup header (encode.c:1512-1537,
    huffenc.c:919); the resulting stream must carry the adopted config
    and decode bit-identically in the reference decoder."""
    import subprocess

    from theora_tpu.decode.decoder import Decoder
    from theora_tpu.headers import (parse_info_header, parse_setup_header)
    from theora_tpu.tpkt import Packet, write_tpkt

    # A reference-produced setup header with non-default-looking params.
    src_pkts = read_tpkt(os.path.join(TESTDATA, "cif_k4_q40.tpkt"))
    setup_bytes = src_pkts[2].data

    W, H = 64, 48
    raw = np.fromfile(os.path.join(TESTDATA, "clip64x48.i420"), np.uint8)
    fsz = W * H * 3 // 2
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H, quality=40
    )
    enc = compat.th_encode_alloc(info)
    assert enc.ctl(compat.TH_ENCCTL_SET_COMPAT_CONFIG, setup_bytes) == 0
    headers = []
    while True:
        p = enc.flushheader()
        if p is None:
            break
        headers.append(p)
    # The flushed setup header must round-trip to the adopted config.
    adopted = parse_setup_header(setup_bytes)
    ours = parse_setup_header(headers[2].data)
    assert ours.qinfo == adopted.qinfo
    assert [b.codes for b in ours.codebooks] == [
        b.codes for b in adopted.codebooks
    ]
    pkts = list(headers)
    for i in range(3):
        f = raw[i * fsz : (i + 1) * fsz]
        frame = [
            f[: W * H].reshape(H, W),
            f[W * H : W * H + fsz // 6].reshape(H // 2, W // 2),
            f[W * H + fsz // 6 :].reshape(H // 2, W // 2),
        ]
        enc.ycbcr_in(frame)
        pkts.append(enc.packetout(i == 2))
    tp = tmp_path / "compatcfg.tpkt"
    write_tpkt(str(tp), pkts)
    out = tmp_path / "compatcfg.yuv"
    res = subprocess.run(
        [ref_tools[1], str(tp), str(out)], capture_output=True, timeout=60
    )
    assert res.returncode == 0, res.stderr
    ref = np.fromfile(str(out), dtype=np.uint8).reshape(-1, fsz)
    dec = Decoder(parse_info_header(pkts[0].data),
                  parse_setup_header(pkts[2].data))
    for i, p in enumerate(pkts[3:]):
        dec.decode_packet(p.data)
        mine = np.concatenate([pl.reshape(-1) for pl in dec.ycbcr_out()])
        assert np.array_equal(mine, ref[i]), f"frame {i}"
    # Still TH_EINVAL after headers are flushed.
    assert enc.ctl(compat.TH_ENCCTL_SET_COMPAT_CONFIG,
                   setup_bytes) == compat.TH_EINVAL


def test_vp3_compat_operating_restrictions():
    """VP3 compat is refused (value echoed back as 0) for non-4:2:0,
    cropped, or >4095-super-block streams (encode.c:1405-1417)."""
    ok = TheoraInfo(frame_width=64, frame_height=48, pic_width=64,
                    pic_height=48, quality=40)
    assert compat.th_encode_alloc(ok).ctl(
        compat.TH_ENCCTL_SET_VP3_COMPATIBLE, 1) is True
    crop = TheoraInfo(frame_width=80, frame_height=64, pic_width=75,
                      pic_height=60, quality=40)
    assert compat.th_encode_alloc(crop).ctl(
        compat.TH_ENCCTL_SET_VP3_COMPATIBLE, 1) is False
    fmt = TheoraInfo(frame_width=64, frame_height=48, pic_width=64,
                     pic_height=48, quality=40, pixel_fmt=2)
    assert compat.th_encode_alloc(fmt).ctl(
        compat.TH_ENCCTL_SET_VP3_COMPATIBLE, 1) is False
    # 2048x2048 luma alone is 4096 super blocks.
    big = TheoraInfo(frame_width=2048, frame_height=2048, pic_width=2048,
                     pic_height=2048, quality=40)
    assert compat.th_encode_alloc(big).ctl(
        compat.TH_ENCCTL_SET_VP3_COMPATIBLE, 1) is False
