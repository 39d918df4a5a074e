"""Rate control: CBR convergence and 2-pass metrics round trip."""
import os

import numpy as np
import pytest

from tests.conftest import TESTDATA
from theora_tpu.encode.encoder import Encoder
from theora_tpu.encode.rate import FrameMetrics, RateControl
from theora_tpu.info import TheoraInfo


def _frames():
    W, H = 352, 288
    raw = np.fromfile(os.path.join(TESTDATA, "cif_smooth.i420"), np.uint8)
    fsz = W * H * 3 // 2
    out = []
    for i in range(len(raw) // fsz):
        f = raw[i * fsz : (i + 1) * fsz]
        out.append(
            [
                f[: W * H].reshape(H, W),
                f[W * H : W * H + fsz // 6].reshape(H // 2, W // 2),
                f[W * H + fsz // 6 :].reshape(H // 2, W // 2),
            ]
        )
    return W, H, out


def test_cbr_convergence():
    W, H, frames = _frames()
    target = 500000
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        target_bitrate=target, fps_numerator=30,
    )
    enc = Encoder(info)
    enc.keyframe_freq = 8
    sizes = [len(enc.encode_frame(fr).data) for fr in frames]
    n = len(sizes)
    steady = sum(sizes[8:]) * 8 / ((n - 8) / 30)
    assert 0.7 * target < steady < 1.35 * target, steady


def test_twopass_metrics_roundtrip():
    """OT2P v2 record/summary round trip in the reference's exact
    binary layout (rate.c:866-936)."""
    import struct

    ms = [
        FrameMetrics(0, 1.5, 0, 3),
        FrameMetrics(1, -0.25, 2, 9),
        FrameMetrics(1, 0.0, 0, 0),
    ]
    body = b"".join(RateControl.pack_metrics(m) for m in ms)
    assert all(len(RateControl.pack_metrics(m)) == 12 for m in ms)
    hdr = struct.pack(
        "<IIIIIBBqq", 0x5032544F, 2, 1, 2, 2, 55, 100,
        RateControl._bexp_q24(1.5),
        RateControl._bexp_q24(-0.25) + RateControl._bexp_q24(0.0),
    )
    assert len(hdr) == 38
    summary, back = RateControl.twopass_parse(hdr + body)
    assert summary["frames_total"] == [1, 2, 2]
    assert summary["exp"] == [55 / 64.0, 100 / 64.0]
    assert len(back) == len(ms)
    for a, b in zip(ms, back):
        assert a.frame_type == b.frame_type
        assert abs(a.log_scale - b.log_scale) < 1e-6
        assert a.dup_count == b.dup_count
        assert a.activity_avg == b.activity_avg


def _encode_i420(frames, path):
    import numpy as np

    with open(path, "wb") as f:
        for planes in frames:
            for p in planes:
                f.write(np.ascontiguousarray(p).astype(np.uint8).tobytes())


def test_ot2p_cross_tool_reference_pass1(tmp_path, ref_tools):
    """Field-level format compatibility: the reference encoder's pass-1
    file parses with our reader -- frame types, counts and summary all
    consistent (rate.c:901-919)."""
    import os
    import subprocess

    ref_enc, _ = ref_tools
    W, H, frames = _frames()
    frames = frames[:16]
    raw = tmp_path / "in.i420"
    _encode_i420(frames, raw)
    tpf = tmp_path / "ref.ot2p"
    subprocess.run(
        [ref_enc, str(W), str(H), str(len(frames)), "0", "8",
         str(raw), str(tmp_path / "o.tpkt"), "256000"],
        env=dict(os.environ, REF_2PASS_OUT=str(tpf)),
        check=True, capture_output=True,
    )
    summary, metrics = RateControl.twopass_parse(tpf.read_bytes())
    assert len(metrics) == len(frames)
    n_intra = sum(1 for m in metrics if m.frame_type == 0)
    assert summary["frames_total"][0] == n_intra
    assert summary["frames_total"][1] == len(frames) - n_intra
    # kf_freq=8 -> keyframes at 0 and 8.
    assert [i for i, m in enumerate(metrics) if m.frame_type == 0] == [0, 8]
    # Our pass 2 consumes it and replays the pass-1 keyframe positions.
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        target_bitrate=256000, quality=0, fps_numerator=30,
    )
    enc = Encoder(info)
    enc.keyframe_freq = 8
    enc.rc = RateControl(info, enc.dequant, 8)
    enc.rc.start_pass2(tpf.read_bytes())
    kf = []
    for i, fr in enumerate(frames):
        pkt = enc.encode_frame(fr)
        if len(pkt.data) and not (pkt.data[0] & 0x40):
            kf.append(i)
    assert kf == [0, 8]


def test_ot2p_cross_tool_our_pass1_feeds_reference(tmp_path, ref_tools):
    """The reference encoder accepts OUR pass-1 metrics file via
    TH_ENCCTL_2PASS_IN and completes a pass-2 encode."""
    import os
    import subprocess

    ref_enc, _ = ref_tools
    W, H, frames = _frames()
    frames = frames[:16]
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        target_bitrate=256000, quality=0, fps_numerator=30,
    )
    enc1 = Encoder(info)
    enc1.keyframe_freq = 8
    enc1.rc = RateControl(info, enc1.dequant, 8)
    enc1.rc.start_pass1()
    body = b""
    for fr in frames:
        enc1.encode_frame(fr)
        body += enc1.rc.pass1_frame_data()
    blob = enc1.rc.pass1_summary() + body
    tpf = tmp_path / "ours.ot2p"
    tpf.write_bytes(blob)
    raw = tmp_path / "in.i420"
    _encode_i420(frames, raw)
    out = tmp_path / "o.tpkt"
    subprocess.run(
        [ref_enc, str(W), str(H), str(len(frames)), "0", "8",
         str(raw), str(out), "256000"],
        env=dict(os.environ, REF_2PASS_IN=str(tpf)),
        check=True, capture_output=True,
    )
    assert out.stat().st_size > 1000


def test_twopass_finite_window():
    """Finite sliding-window pass 2 (known future frame types,
    rate.c:1060-1126) converges to the target."""
    W, H, frames = _frames()
    frames = frames[:24]
    # Target must be reachable at qi<=63 on this clip, else the encoder
    # saturates at max quality and (capped) overflow bits are discarded
    # -- same behavior as the reference.
    target = 250000
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        target_bitrate=target, quality=0, fps_numerator=30,
    )
    enc1 = Encoder(info)
    enc1.keyframe_freq = 8
    enc1.rc = RateControl(info, enc1.dequant, 8)
    enc1.rc.start_pass1()
    body = b""
    for fr in frames:
        enc1.encode_frame(fr)
        body += enc1.rc.pass1_frame_data()
    blob = enc1.rc.pass1_summary() + body
    enc2 = Encoder(info)
    enc2.keyframe_freq = 8
    enc2.rc = RateControl(info, enc2.dequant, 8)
    enc2.rc.start_pass2(blob, buf_delay=12)
    bits = sum(len(enc2.encode_frame(fr).data) * 8 for fr in frames)
    want = target * len(frames) / 30
    assert abs(bits - want) / want < 0.12, (bits, want)


def test_rate_buffer_resize_midstream():
    """oc_enc_rc_resize semantics: bounds update, fullness preserved,
    stream stays decodable (rate.c:345-445)."""
    W, H, frames = _frames()
    frames = frames[:16]
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        target_bitrate=400000, quality=0, fps_numerator=30,
    )
    enc = Encoder(info)
    enc.keyframe_freq = 8
    pkts = enc.flush_headers()
    for i, fr in enumerate(frames):
        if i == 6:
            full_before = enc.rc.fullness
            enc.rc.resize_buffer(24)
            assert enc.rc.fullness == full_before
            assert enc.rc.max_fullness == enc.rc.bits_per_frame * 24
        if i == 10:
            enc.rc.set_bitrate(200000)
        pkts.append(enc.encode_frame(fr))
    from theora_tpu.decode.decoder import Decoder
    from theora_tpu.headers import parse_info_header, parse_setup_header

    dec = Decoder(parse_info_header(pkts[0].data),
                  parse_setup_header(pkts[2].data))
    for p in pkts[3:]:
        dec.decode_packet(p.data)
        dec.ycbcr_out()


def test_frame_drops_under_pressure():
    """A starved reservoir drops frames post-encode (0-byte dups,
    rate.c:825-832) and the stream stays decodable with correct
    granulepos progression."""
    W, H, frames = _frames()
    frames = frames[:16]
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        target_bitrate=24000, quality=0, fps_numerator=30,
    )
    enc = Encoder(info)
    enc.keyframe_freq = 8
    pkts = enc.flush_headers()
    for fr in frames:
        pkts.append(enc.encode_frame(fr))
    sizes = [len(p.data) for p in pkts[3:]]
    assert enc.rc.ndrops > 0
    assert any(s == 0 for s in sizes[1:])
    from theora_tpu.decode.decoder import Decoder
    from theora_tpu.headers import parse_info_header, parse_setup_header

    dec = Decoder(parse_info_header(pkts[0].data),
                  parse_setup_header(pkts[2].data))
    for p in pkts[3:]:
        dec.decode_packet(p.data)
        dec.ycbcr_out()


def test_gop_parallel_transcode_identical():
    import os

    import numpy as np

    from theora_tpu.parallel.transcode import transcode

    W, H = 64, 48
    raw = np.fromfile(os.path.join(TESTDATA, "clip64x48.i420"), np.uint8)
    fsz = W * H * 3 // 2
    frames = []
    for i in range(len(raw) // fsz):
        f = raw[i * fsz : (i + 1) * fsz]
        frames.append(
            [
                f[: W * H].reshape(H, W),
                f[W * H : W * H + fsz // 6].reshape(H // 2, W // 2),
                f[W * H + fsz // 6 :].reshape(H // 2, W // 2),
            ]
        )
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H, quality=40
    )
    enc = Encoder(info)
    enc.keyframe_freq = 4
    seq = enc.flush_headers()
    for i, fr in enumerate(frames):
        seq.append(enc.encode_frame(fr, e_o_s=(i == len(frames) - 1)))
    par = transcode(frames, info, keyframe_freq=4, max_workers=4)
    assert len(seq) == len(par)
    for a, b in zip(seq, par):
        assert a.data == b.data
        assert a.granulepos == b.granulepos


def test_gop_retry_after_worker_kill(tmp_path):
    """Elastic GOP retry (SURVEY.md section 5): SIGKILL one process-pool
    worker mid-encode; the lost GOP is reassigned and the final output is
    byte-identical to a sequential encode."""
    import os

    import numpy as np

    from theora_tpu.parallel import transcode as tmod

    W, H = 64, 48
    raw = np.fromfile(os.path.join(TESTDATA, "clip64x48.i420"), np.uint8)
    fsz = W * H * 3 // 2
    frames = []
    for i in range(len(raw) // fsz):
        f = raw[i * fsz : (i + 1) * fsz]
        frames.append(
            [
                f[: W * H].reshape(H, W),
                f[W * H : W * H + fsz // 6].reshape(H // 2, W // 2),
                f[W * H + fsz // 6 :].reshape(H // 2, W // 2),
            ]
        )
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H, quality=40
    )
    enc = Encoder(info)
    enc.keyframe_freq = 4
    seq = enc.flush_headers()
    for i, fr in enumerate(frames):
        seq.append(enc.encode_frame(fr, e_o_s=(i == len(frames) - 1)))
    marker = tmp_path / "killed"
    os.environ[tmod._FAULT_ENV] = f"1:{marker}"
    try:
        par = tmod.transcode(
            frames, info, keyframe_freq=4, max_workers=2, use_processes=True
        )
    finally:
        del os.environ[tmod._FAULT_ENV]
    assert marker.exists(), "fault was never injected"
    assert len(seq) == len(par)
    for a, b in zip(seq, par):
        assert a.data == b.data and a.granulepos == b.granulepos


def test_distributed_recovers_dropped_gop():
    """distributed_transcode elastic recovery: a GOP lost by its assigned
    process (simulated via fault injection) is re-encoded by host 0;
    output byte-identical to the healthy run."""
    import numpy as np

    from theora_tpu.parallel.distributed import distributed_transcode

    W, H = 64, 48
    rng = np.random.RandomState(7)
    frames = [
        [
            ((np.mgrid[0:H, 0:W][1] * 2 + 7 * i) % 256).astype(np.uint8),
            np.full((H // 2, W // 2), 100 + i, np.uint8),
            np.full((H // 2, W // 2), 150 - i, np.uint8),
        ]
        for i in range(12)
    ]
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H, quality=40
    )
    healthy = distributed_transcode(frames, info, keyframe_freq=4)
    lossy = distributed_transcode(
        frames, info, keyframe_freq=4, _drop_gops={1}
    )
    assert len(healthy) == len(lossy) > 3
    for a, b in zip(healthy, lossy):
        assert a.data == b.data and a.granulepos == b.granulepos


@pytest.mark.parametrize("target", [150000, 300000])
def test_twopass_cbr_deviation(target):
    """With exact future knowledge, 2-pass CBR must land within 5% of
    target on the CIF clip (the pass-2 model-offset feedback; the
    reference leaves up to 15% unspent here, rate.c:506-625)."""
    W, H, frames = _frames()
    frames = frames[:32]
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        target_bitrate=target, quality=0, fps_numerator=30,
    )
    enc1 = Encoder(info)
    enc1.keyframe_freq = 8
    enc1.rc = RateControl(info, enc1.dequant, 8)
    enc1.rc.start_pass1()
    body = b""
    for i, fr in enumerate(frames):
        enc1.encode_frame(fr, e_o_s=(i == len(frames) - 1))
        body += enc1.rc.pass1_frame_data()
    blob = enc1.rc.pass1_summary() + body
    for buf_delay in (None, 16):
        enc = Encoder(info)
        enc.keyframe_freq = 8
        enc.rc = RateControl(info, enc.dequant, 8)
        pkts = enc.flush_headers()
        enc.rc.start_pass2(blob, buf_delay=buf_delay)
        for i, fr in enumerate(frames):
            pkts.append(enc.encode_frame(fr, e_o_s=(i == len(frames) - 1)))
        bits = sum(len(p.data) * 8 for p in pkts[3:])
        goal = target * len(frames) / 30.0
        dev = (bits - goal) / goal
        assert abs(dev) <= 0.05, (target, buf_delay, dev)


def test_ot2p_device_tier_cross_tool(tmp_path, ref_tools):
    """Device-tier 2-pass interop both directions: the device pass-1
    blob feeds the REFERENCE encoder's pass 2 (TH_ENCCTL_2PASS_IN),
    and the reference's pass-1 file drives the device tier's pass 2."""
    import os
    import subprocess

    from theora_tpu.encode.tpu_gop import TpuGopEncoder

    ref_enc, _ = ref_tools
    W, H, frames = _frames()
    frames = frames[:16]
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        quality=0, fps_numerator=30,
    )
    denc = TpuGopEncoder(info, qi=40)
    _, blob = denc.encode_clip_pass1(
        frames, keyframe_freq=8, target_bitrate=256000
    )
    # Direction 1: device blob -> reference pass 2.
    tpf = tmp_path / "dev.ot2p"
    tpf.write_bytes(blob)
    raw = tmp_path / "in.i420"
    _encode_i420(frames, raw)
    out = tmp_path / "o.tpkt"
    subprocess.run(
        [ref_enc, str(W), str(H), str(len(frames)), "0", "8",
         str(raw), str(out), "256000"],
        env=dict(os.environ, REF_2PASS_IN=str(tpf)),
        check=True, capture_output=True,
    )
    assert out.stat().st_size > 1000
    # Direction 2: reference pass-1 file -> device pass 2.
    tpf2 = tmp_path / "ref.ot2p"
    subprocess.run(
        [ref_enc, str(W), str(H), str(len(frames)), "0", "8",
         str(raw), str(tmp_path / "o2.tpkt"), "256000"],
        env=dict(os.environ, REF_2PASS_OUT=str(tpf2)),
        check=True, capture_output=True,
    )
    pkts = denc.encode_clip_pass2(
        frames, tpf2.read_bytes(), keyframe_freq=8,
        target_bitrate=256000, buf_delay=16,
    )
    bits = 8 * sum(len(p.data) for p in pkts[3:])
    goal = 256000 * len(frames) / 30.0
    # Foreign metrics: the reference's pass-1 scales model the
    # REFERENCE encoder's spend, which is higher than ours at equal qi
    # (BASELINE.md), so a conservative undershoot is expected until the
    # model-offset feedback converges -- the interop claim here is the
    # FORMAT + allocator, not deviation with a foreign model (the tight
    # bound lives in test_device_twopass_cbr on our own metrics).
    assert abs(bits / goal - 1) <= 0.30, bits / goal - 1
    from theora_tpu.bitio import BitReader

    qis = set()
    for p in pkts[3:]:
        br = BitReader(p.data)
        assert br.read1() == 0
        br.read1()
        qis.add(br.read(6))
    assert len(qis) > 1, "pass 2 never steered qi"
