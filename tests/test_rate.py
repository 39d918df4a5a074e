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
    rc = RateControl.__new__(RateControl)
    ms = [
        FrameMetrics(0, 1.5, 0, 3),
        FrameMetrics(1, -0.25, 2, 9),
        FrameMetrics(1, 0.0, 0, 0),
    ]
    data = RateControl.twopass_out_header(rc)
    for m in ms:
        data += RateControl.twopass_out_frame(rc, m)
    back = RateControl.twopass_parse(data + b"\0" * 8)
    assert len(back) == len(ms)
    for a, b in zip(ms, back):
        assert a.frame_type == b.frame_type
        assert abs(a.log_scale - b.log_scale) < 1e-6
        assert a.dup_count == b.dup_count


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
