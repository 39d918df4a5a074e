"""Postprocessor twin identity: the native (C++) deblock/dering must be
bit-identical to the numpy oracle (ops/postproc_np.py) on randomized
planes across shapes, strengths, and plane types.  Golden bit-exactness
against the reference decoder's pp output is covered by
tests/test_decode.py::test_postprocessor_bit_exact."""
import numpy as np
import pytest

from theora_tpu.native import pp_postprocess_plane
from theora_tpu.ops import postproc_np


def _random_plane(rng, h, w, smooth):
    if smooth:
        base = rng.integers(0, 256, (h // 8, w // 8)).astype(np.uint8)
        plane = np.kron(base, np.ones((8, 8), np.uint8)).astype(np.int32)
        plane += rng.integers(-6, 7, (h, w))
        return plane.clip(0, 255).astype(np.uint8)
    return rng.integers(0, 256, (h, w)).astype(np.uint8)


def test_native_matches_numpy():
    native = pp_postprocess_plane()
    if native is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    for trial in range(60):
        nv = int(rng.integers(2, 9))
        nh = int(rng.integers(2, 11))
        h, w = nv * 8, nh * 8
        src = _random_plane(rng, h, w, smooth=bool(trial % 2))
        dc_qis = rng.integers(0, 64, (nv, nh)).astype(np.uint8)
        qpf = rng.integers(0, 64, (nv, nh)).astype(np.uint8)
        scale = rng.integers(1, 60, 64).astype(np.int32)
        sharp = -rng.integers(0, 20, 64).astype(np.int32)
        pli = int(rng.integers(0, 2))
        strong = bool(rng.integers(0, 2))
        dering = bool(rng.integers(0, 2))
        a = native(src, dc_qis, qpf, scale, sharp,
                   dering=dering, strong=strong, pli=pli)
        b = postproc_np.postprocess_plane(src, dc_qis, qpf, scale, sharp,
                                          dering=dering, strong=strong,
                                          pli=pli)
        assert np.array_equal(a, b), (trial, nv, nh, dering, strong, pli)


def test_python_fallback_used_without_native(monkeypatch):
    """A build without the native .so must still postprocess (through
    the numpy tier) rather than silently skipping pp levels."""
    import os

    import theora_tpu.decode.decoder as dmod
    from tests.conftest import TESTDATA
    from theora_tpu.headers import parse_info_header, parse_setup_header
    from theora_tpu.tpkt import read_tpkt

    monkeypatch.setattr("theora_tpu.native.pp_postprocess_plane",
                        lambda: None)
    name = "clip64x48_k8_q5"
    pkts = read_tpkt(os.path.join(TESTDATA, f"{name}.tpkt"))
    info = parse_info_header(pkts[0].data)
    setup = parse_setup_header(pkts[2].data)
    dec = dmod.Decoder(info, setup)
    dec.set_pplevel(7)
    ref = np.fromfile(
        os.path.join(TESTDATA, f"{name}.pp7.yuv"), dtype=np.uint8
    ).reshape(-1, info.frame_width * info.frame_height * 3 // 2)
    for i, p in enumerate(pkts[3:]):
        dec.decode_packet(p.data)
        mine = np.concatenate([pl.reshape(-1) for pl in dec.ycbcr_out()])
        assert np.array_equal(mine, ref[i]), f"fallback pp7 frame {i}"
