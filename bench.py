#!/usr/bin/env python
"""Benchmark: TPU encode-compute throughput on 720p vs the reference C
encoder, printing one JSON line.

The TPU side times the jitted keyframe encode compute core (fDCT + quantize
+ bit-exact dequant/iDCT reconstruction) over all fragments of 720p frames.
The baseline is the reference libtheora encoder (refbuild oracle, -O2,
single core) timed end-to-end on the same frames at the same quality.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

W, H, NFRAMES = 1280, 720, 32
QUALITY = 48
KF_FREQ = 8  # same GOP structure for the reference and the device tier


def gen_frames():
    """Synthetic 720p natural-video stand-in for the BASELINE.json
    headline ("encode+decode Mpixels/s/chip on 720p derf clips"): a
    detailed STATIC scene (texture + gradients), three textured movers,
    a film-grain panel refreshed every frame, and mostly-static chroma
    with colored movers -- the temporal structure real derf-style
    content has (mostly-static background + local motion + some grain).

    The previous clip was full-frame iid noise re-randomized per frame:
    a worst case no deployment resembles, which made the baseline
    unrepresentative of the named headline and hid every temporal
    economy (skip, delta transfer) both codecs have.  Both encoders run
    the SAME frames, so vs_baseline remains an apples-to-apples ratio;
    the reference baseline is re-measured on this clip in the same
    session (round-5 ROUND_NOTES)."""
    rng = np.random.RandomState(11)
    yy, xx = np.mgrid[0:H, 0:W]
    tex = rng.randint(-40, 41, size=(H, W)).astype(np.int32)
    bg = (
        128
        + 50 * np.sin(xx / 7.0) * np.cos(yy / 9.0)
        + 30 * np.sin((xx + 2 * yy) / 61.0)
        + tex * 0.5
    ).clip(0, 255).astype(np.uint8)
    movers = [
        (rng.randint(0, 256, size=(96, 128)).astype(np.uint8), 9, 2, 60, 40),
        (rng.randint(0, 256, size=(64, 64)).astype(np.uint8), -5, 4, 400, 900),
        ((128 + 90 * np.sin(np.arange(80)[:, None] / 3.0)).astype(np.uint8)
         * np.ones((1, 112), np.uint8), 3, -3, 520, 300),
    ]
    ug = (128 + 40 * np.sin(xx[::2, ::2] / 37.0)).astype(np.uint8)
    vg = (128 + 40 * np.cos(yy[::2, ::2] / 29.0)).astype(np.uint8)
    frames = []
    for t in range(NFRAMES):
        y = bg.copy()
        u = ug.copy()
        v = vg.copy()
        for mi, (patch, dx, dy, x0, y0) in enumerate(movers):
            ph, pw = patch.shape
            py = (y0 + dy * t) % (H - ph)
            px = (x0 + dx * t) % (W - pw)
            y[py : py + ph, px : px + pw] = patch
            u[py // 2 : (py + ph) // 2, px // 2 : (px + pw) // 2] = (
                80 + 50 * mi
            )
            v[py // 2 : (py + ph) // 2, px // 2 : (px + pw) // 2] = (
                190 - 40 * mi
            )
        # Film-grain panel: fresh iid noise every frame (keeps the
        # worst-case token/filter load present and exercises the
        # delta-upload dense handling).
        y[H - 256 :, W - 256 :] = rng.randint(
            0, 256, size=(256, 256)
        ).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def bench_reference(frames):
    """Reference encoder Mpix/s (keyframe-only, fixed quality)."""
    refbuild = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refbuild")
    enc = os.path.join(refbuild, "build", "ref_enc")
    if not os.path.exists(enc):
        subprocess.run(["make", "-C", refbuild], check=True, capture_output=True)
    with tempfile.TemporaryDirectory() as td:
        raw = os.path.join(td, "in.i420")
        with open(raw, "wb") as f:
            for y, u, v in frames:
                f.write(y.tobytes())
                f.write(u.tobytes())
                f.write(v.tobytes())
        out = os.path.join(td, "out.tpkt")
        # Best of 3: host load noise otherwise dominates the baseline.
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            subprocess.run(
                [enc, str(W), str(H), str(NFRAMES), str(QUALITY),
                 str(KF_FREQ), raw, out],
                check=True,
                capture_output=True,
            )
            dt = min(dt, time.perf_counter() - t0)
    mpix = NFRAMES * (W * H + 2 * (W // 2) * (H // 2)) / 1e6
    return mpix / dt


def bench_tpu(frames):
    import jax
    import jax.numpy as jnp

    from theora_tpu import tables
    from theora_tpu.pipeline import intra_encode_core
    from theora_tpu.quant import dequant_tables_init

    dequant = dequant_tables_init(tables.DEF_QUANT_INFO)
    qi = QUALITY

    def to_blocks(plane):
        h, w = plane.shape
        return (
            plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )

    # One batch per plane kind across all frames.
    yb = np.stack([to_blocks(f[0]) for f in frames])
    cb = np.stack(
        [to_blocks(f[1]) for f in frames] + [to_blocks(f[2]) for f in frames]
    )
    dq_y = jnp.asarray(dequant[qi, 0, 0].astype(np.int32))
    dq_c = jnp.asarray(dequant[qi, 1, 0].astype(np.int32))
    yb_d = jax.device_put(jnp.asarray(yb))
    cb_d = jax.device_put(jnp.asarray(cb))

    # Warm up / compile with the exact benchmark shapes.
    q, r = intra_encode_core(yb_d, dq_y)
    q.block_until_ready()
    q, r = intra_encode_core(cb_d, dq_c)
    q.block_until_ready()

    reps = 16
    # Pipelined dispatch with a forcing 1-element readback: on this
    # environment's axon backend block_until_ready can return before
    # compute finishes (see ROUND_NOTES), so a tiny device->host read is
    # the only reliable fence; its ~35 ms RTT amortizes over the reps.
    t0 = time.perf_counter()
    for _ in range(reps):
        qy, ry = intra_encode_core(yb_d, dq_y)
        qc, rc = intra_encode_core(cb_d, dq_c)
    np.asarray(qy[:1, :1])
    np.asarray(qc[:1, :1])
    dt = (time.perf_counter() - t0) / reps
    mpix = NFRAMES * (W * H + 2 * (W // 2) * (H // 2)) / 1e6
    return mpix / dt


def bench_device_e2e(frames):
    """End-to-end device GOP encode: ME + mode decision + R/D quantize +
    skip + closed-loop recon on chip (encode/tpu_gop.py), host doing
    only entropy/packing.  Includes all host<->device transfers -- in
    this environment those ride a ~11-22 MB/s TPU tunnel, so this
    measures the system, not the chip (see compute core metric for the
    chip-side roofline)."""
    from theora_tpu.encode.tpu_gop import TpuGopEncoder
    from theora_tpu.info import TheoraInfo

    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        pic_x=0, pic_y=0, fps_numerator=30, fps_denominator=1,
        quality=QUALITY, keyframe_granule_shift=6,
    )
    enc = TpuGopEncoder(info, qi=QUALITY)
    fr = [[f[0], f[1], f[2]] for f in frames]
    # Warm-up compiles the clip-batched ME + per-plane scans at the
    # benchmark's full chunk shape (encode_clip dispatches the whole
    # 32-frame clip as one multi-GOP chunk since round 5).
    enc.encode_clip(fr, keyframe_freq=KF_FREQ)
    dt = float("inf")
    # Best-of-3: the first post-warmup dispatch reproducibly absorbs a
    # 2-3x stall on the axon tunnel (queue-depth ramp; see ROUND_NOTES
    # round-3 method note), and tunnel health wanders between reps.
    for _ in range(3):
        t0 = time.perf_counter()
        enc.encode_clip(fr, keyframe_freq=KF_FREQ)
        dt = min(dt, time.perf_counter() - t0)
    return NFRAMES * (W * H + 2 * (W // 2) * (H // 2)) / 1e6 / dt


def bench_device_pipeline_compute(frames):
    """Device-resident pipeline compute: fused ME plan + the three
    closed-loop plane scans (with the batched trellis) with ALL inputs
    already on device -- the number that governs throughput on a
    production-attached TPU, where PCIe/ICI moves the pixels ~3 orders
    of magnitude faster than this environment's development tunnel.
    Measured over reps pipelined dispatches fenced by one 1-element
    readback (block_until_ready is unreliable here, see ROUND_NOTES)."""
    import jax
    import jax.numpy as jnp

    from theora_tpu.encode.tpu_gop import TpuGopEncoder, _scan_encode_plane
    from theora_tpu.info import TheoraInfo
    from theora_tpu.ops import me_jax

    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        pic_x=0, pic_y=0, fps_numerator=30, fps_denominator=1,
        quality=QUALITY, keyframe_granule_shift=6,
    )
    enc = TpuGopEncoder(info, qi=QUALITY)
    g = enc.g
    F = KF_FREQ
    dq = enc.enc.dequant
    from theora_tpu.ops.fdct_np import rd_lambda

    # Device-resident inputs per plane (synthetic motion metadata; the
    # scans' cost is shape-dependent, not data-dependent).
    plane_args = []
    for pli in range(3):
        pl = g.planes[pli]
        vpad, hpad = g.plane_padding(pli)
        n = pl.nfrags
        hh, ww = pl.nvfrags * 8, pl.nhfrags * 8
        cur = jnp.asarray(np.stack([
            np.asarray(frames[f][0] if pli == 0 else frames[f][pli])[
                ::-1
            ][:hh, :ww].astype(np.uint8)
            for f in range(F)
        ]))
        z8 = jnp.zeros((F, n), jnp.int8)
        ones = jnp.ones((F, n), jnp.int8)
        rs = jnp.where(jnp.arange(F)[:, None] == 0, 0, ones)
        u2 = jnp.zeros((F, n), bool)
        ms = jnp.asarray(
            np.broadcast_to(np.arange(F)[:, None] != 0, (F, n)).copy()
        )
        ik = jnp.asarray(np.arange(F) == 0)
        lam_qi = rd_lambda(enc.qi, int(dq[enc.qi, pli, 0, 1])) * 3.0
        lam_qp = rd_lambda(enc.qi, int(dq[enc.qi, pli, 1, 1])) * 3.0

        def pf(row, dtype=np.float32):
            # Scan quantizer inputs are per-frame (leading F axis).
            a = np.asarray(row, dtype)
            return jnp.asarray(np.broadcast_to(a, (F,) + a.shape).copy())

        plane_args.append((
            cur, rs, z8, z8, z8, z8, u2, ms, ik,
            pf(dq[enc.qi, pli, 0], np.int32),
            pf(dq[enc.qi, pli, 1], np.int32),
            pf(enc._bv, np.int32), pf(enc._lam),
            pf(lam_qi), pf(lam_qp),
            jnp.asarray(enc._nb_dev), jnp.asarray(enc._nb_dev),
            pf(enc._lam_t[0]), pf(enc._lam_t[1]),
            pl.nvfrags, pl.nhfrags, vpad, hpad,
        ))
    ys_d = plane_args[0][0]

    def one_pass():
        outs = me_jax.plan_from_gop(ys_d)
        scans = [
            _scan_encode_plane(*args, use_trellis=enc.use_trellis)
            for args in plane_args
        ]
        return outs, scans

    def fence(outs, scans):
        jax.device_get(
            [o[:1] for o in outs] + [s[0][:1, :1, :1] for s in scans]
        )

    fence(*one_pass())  # compile + warm
    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        one_pass()
    fence(*one_pass())
    dt = (time.perf_counter() - t0) / reps
    mpix = F * (W * H + 2 * (W // 2) * (H // 2)) / 1e6
    return mpix / dt


def bench_host_encode(frames):
    """Fallback metric if the TPU is unreachable: host-tier encode with
    the SAME GOP structure the reference baseline uses (kf=KF_FREQ) --
    the round-3 fallback compared our keyframe-only encode against the
    reference's inter-GOP run, understating the ratio."""
    from theora_tpu.encode.encoder import Encoder
    from theora_tpu.info import TheoraInfo

    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        pic_x=0, pic_y=0, fps_numerator=30, fps_denominator=1,
        quality=QUALITY, keyframe_granule_shift=6,
    )
    fr = [[f[0], f[1], f[2]] for f in frames]
    warm = Encoder(info)
    warm.keyframe_freq = KF_FREQ
    warm.encode_frame(fr[0])
    dt = float("inf")
    for _ in range(3):
        enc = Encoder(info)
        enc.keyframe_freq = KF_FREQ
        t0 = time.perf_counter()
        for x in fr:
            enc.encode_frame(x)
        dt = min(dt, time.perf_counter() - t0)
    return NFRAMES * (W * H + 2 * (W // 2) * (H // 2)) / 1e6 / dt


def bench_host_parallel(frames):
    """Host-tier GOP-parallel encode (2 workers, byte-identical to
    sequential) -- the framework's multi-core host story; the reference
    encoder is single-threaded by design."""
    from theora_tpu.parallel.transcode import transcode
    from theora_tpu.info import TheoraInfo

    info = TheoraInfo(
        frame_width=W, frame_height=H, pic_width=W, pic_height=H,
        pic_x=0, pic_y=0, fps_numerator=30, fps_denominator=1,
        quality=QUALITY, keyframe_granule_shift=6,
    )
    fr = [[f[0], f[1], f[2]] for f in frames]
    transcode(fr, info, keyframe_freq=KF_FREQ, max_workers=2)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        transcode(fr, info, keyframe_freq=KF_FREQ, max_workers=2)
        dt = min(dt, time.perf_counter() - t0)
    return NFRAMES * (W * H + 2 * (W // 2) * (H // 2)) / 1e6 / dt


def _tunnel_mbps(timeout_s=240):
    """Measure the tunnel's effective upload bandwidth (MB/s) in a
    subprocess -- the e2e metric is wire-ceiling bound (~44 MB of
    pixels for the 32-frame clip), so the round record must carry its
    own weather context (ROUND_NOTES round 4)."""
    code = (
        "import jax, jax.numpy as jnp, numpy as np, time;"
        "x = np.random.RandomState(0).randint(0,256,(8,720,1280))"
        ".astype(np.uint8);"
        "d = jax.device_put(x); np.asarray(d[:1,:1,:1]);"
        "t0 = time.perf_counter();"
        "d = jax.device_put(x);"
        "v = np.asarray(d.astype(jnp.int32).sum());"
        "dt = time.perf_counter() - t0;"
        "print('MBPS', 7.37 / dt)"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            timeout=timeout_s, text=True,
        )
        for line in r.stdout.splitlines():
            if line.startswith("MBPS"):
                return float(line.split()[1])
    except Exception:
        pass
    return None


def _probe_device(timeout_s=180):
    """True iff the accelerator actually computes (not just enumerates).

    Run in a SUBPROCESS with a hard timeout: when the dev tunnel dies it
    hangs inside device_get with the GIL released, which no in-process
    alarm can interrupt -- a bench that hangs at round end is worse than
    a host-tier fallback number.
    """
    code = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "x = jnp.arange(128, dtype=jnp.int32);"
        "assert int(np.asarray((x * x).sum())) == 690880;"
        "print('ok')"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            timeout=timeout_s, text=True,
        )
        return r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _run_sub(name, timeout_s):
    """Run one device bench in a subprocess (same hang rationale as the
    probe); returns the measured float or None."""
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sub", name],
            capture_output=True, timeout=timeout_s, text=True,
        )
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    for line in r.stdout.splitlines()[::-1]:
        try:
            return float(json.loads(line)["value"])
        except Exception:
            continue
    return None


def main():
    if len(sys.argv) == 3 and sys.argv[1] == "--sub":
        frames = gen_frames()
        fn = {
            "e2e": bench_device_e2e,
            "pipeline": bench_device_pipeline_compute,
            "core": bench_tpu,
        }[sys.argv[2]]
        print(json.dumps({"value": fn(frames)}))
        return
    frames = gen_frames()
    try:
        ref_mpixs = bench_reference(frames)
    except Exception:
        ref_mpixs = float("nan")
    extra = {}
    metric = (
        "720p end-to-end device GOP encode Mpix/s (ME+modes+RD quant+"
        "closed loop on chip, host entropy; incl. tunnel transfers)"
    )
    # The axon tunnel wedges transiently and recovers on its own
    # (ROUND_NOTES); a single failed probe must not decide the round's
    # official number.  Probe up to 3 times with backoff, and if a
    # probe passes but the e2e run itself wedges, re-probe and retry
    # once more in a fresh subprocess before falling back.
    value = None
    attempts = []
    for attempt in range(3):
        if _probe_device():
            attempts.append("probe-ok")
            value = _run_sub("e2e", 1800)
            if value is not None:
                break
            attempts.append("e2e-wedged")
        else:
            attempts.append("probe-fail")
        if attempt < 2:
            time.sleep(60 * (attempt + 1))
    if value is not None:
        v = _tunnel_mbps()
        if v is not None:
            extra["tunnel_mbps"] = round(v, 1)
        v = _run_sub("pipeline", 900)
        if v is not None:
            extra["pipeline_compute_mpixs"] = round(v, 1)
        v = _run_sub("core", 600)
        if v is not None:
            extra["compute_core_mpixs"] = round(v, 1)
        try:
            hp = bench_host_parallel(frames)
            extra["host_gop_parallel_mpixs"] = round(hp, 2)
            if ref_mpixs == ref_mpixs:
                extra["host_parallel_vs_ref"] = round(hp / ref_mpixs, 3)
        except Exception:
            pass
    else:
        # TPU unreachable after retries: report the host tier so the
        # driver still gets a measurement, loudly labeled as fallback.
        metric = (
            "720p keyframe encode Mpix/s (HOST-TIER FALLBACK -- TPU "
            "unreachable after 3 probe/retry attempts; not a device "
            "number)"
        )
        extra["fallback"] = True
        extra["device_attempts"] = attempts
        value = bench_host_encode(frames)
        try:
            hp = bench_host_parallel(frames)
            extra["host_gop_parallel_mpixs"] = round(hp, 2)
            if ref_mpixs == ref_mpixs:
                extra["host_parallel_vs_ref"] = round(hp / ref_mpixs, 3)
        except Exception:
            pass
    vs = value / ref_mpixs if ref_mpixs == ref_mpixs else 0.0
    if ref_mpixs == ref_mpixs:
        extra["ref_encode_mpixs"] = round(ref_mpixs, 2)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 2),
                "unit": "Mpix/s",
                "vs_baseline": round(vs, 3),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
