"""Multi-host GOP transcode (jax.distributed): two local processes must
produce output byte-identical to a sequential encode."""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import TESTDATA
from theora_tpu.encode.encoder import Encoder
from theora_tpu.info import TheoraInfo

_WORKER = r"""
import os, sys, pickle
import numpy as np
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)
sys.path.insert(0, sys.argv[4])
from theora_tpu.info import TheoraInfo
from theora_tpu.parallel.distributed import distributed_transcode
W, H = 64, 48
raw = np.fromfile(sys.argv[5], np.uint8)
fsz = W*H*3//2
frames = []
for i in range(len(raw)//fsz):
    f = raw[i*fsz:(i+1)*fsz]
    frames.append([f[:W*H].reshape(H,W), f[W*H:W*H+fsz//6].reshape(H//2,W//2),
                   f[W*H+fsz//6:fsz].reshape(H//2,W//2)])
info = TheoraInfo(frame_width=W, frame_height=H, pic_width=W, pic_height=H,
                  quality=40)
pkts = distributed_transcode(frames, info, keyframe_freq=4)
if pid == 0:
    with open(sys.argv[6], "wb") as f:
        pickle.dump([(p.data, p.granulepos, p.e_o_s) for p in pkts], f)
"""


def _load(W, H):
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
    return frames


def test_two_process_distributed_matches_sequential(tmp_path):
    W, H = 64, 48
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    clip = os.path.join(TESTDATA, "clip64x48.i420")
    out = str(tmp_path / "dist.pkl")
    worker = str(tmp_path / "worker.py")
    with open(worker, "w") as f:
        f.write(_WORKER)
    port = "9923"
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    p1 = subprocess.Popen(
        [sys.executable, worker, "1", "2", port, repo, clip, out], env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        r0 = subprocess.run(
            [sys.executable, worker, "0", "2", port, repo, clip, out],
            env=env, timeout=120, capture_output=True,
        )
        p1.wait(timeout=30)
    except subprocess.TimeoutExpired:
        p1.kill()
        pytest.skip("distributed init timed out in this environment")
    if r0.returncode != 0:
        pytest.skip(
            f"jax.distributed unavailable: {r0.stderr[-300:]!r}"
        )
    with open(out, "rb") as f:
        dist = pickle.load(f)

    frames = _load(W, H)
    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H, quality=40
    )
    enc = Encoder(info)
    enc.keyframe_freq = 4
    seq = enc.flush_headers()
    for i, fr in enumerate(frames):
        seq.append(enc.encode_frame(fr, e_o_s=(i == len(frames) - 1)))
    assert len(seq) == len(dist)
    for a, (d, g, e) in zip(seq, dist):
        assert a.data == d and a.granulepos == g and a.e_o_s == e
