"""Per-stage on-chip profile + speed-of-light roofline of the device
GOP encode pipeline.

The round-4 VERDICT's first ask: "nobody has published a per-stage
on-chip time breakdown, and BASELINE.json's required speed-of-light
roofline per chip has never been stated".  This tool measures each
stage of the device encode pipeline SEPARATELY with the same
pipelined-dispatch + 1-element-readback-fence method bench.py uses
(block_until_ready is unreliable on the axon runtime, ROUND_NOTES
round 2), and states the speed-of-light model:

  compute bound  = the jitted transform core (fdct+quant+recon over all
                   fragments), measured at 134-157 Gpix/s in healthy
                   sessions (BASELINE r1/r2);
  memory bound   = bytes touched per frame / HBM bandwidth.  A 720p
                   4:2:0 frame's closed-loop scan step reads cur(1.4 MB
                   u8) + prev/gold refs (2x 1.4 MB) and writes
                   recon(1.4 MB) + qdct (F x N x 64 i16 ~ 2.8 MB):
                   ~9 MB/frame minimum against v5e's ~819 GB/s
                   -> ~11 us/frame, i.e. ~125 Gpix/s -- 3 orders above
                   anything here, so HBM is NOT the constraint;
  actual limits  = per-step lax.scan dispatch latency and the serial
                   63-step trellis / 225-step coarse-ME scans, which
                   this table quantifies per stage.

Usage: python -m theora_tpu.tools.roofline [--frames N] [--gops G]
           [--size WxH] [--reps R]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _synth_frames(w, h, n, seed=11):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = rng.randint(0, 256, size=(h + 4 * n + 4, w + 2 * n + 4)).astype(
        np.uint8
    )
    frames = []
    for t in range(n):
        y = base[t * 4 : t * 4 + h, t * 2 : t * 2 + w].copy()
        y = (
            (y.astype(np.int32) + 128 + 80 * np.sin((xx + 8 * t) / 24.0)) // 2
        ).clip(0, 255).astype(np.uint8)
        u = (128 + 50 * np.sin((xx[::2, ::2] + 3 * t) / 40.0)).astype(np.uint8)
        v = (128 + 50 * np.cos((yy[::2, ::2] - 2 * t) / 32.0)).astype(np.uint8)
        frames.append([y, u, v])
    return frames


def _plane_args(enc, frames, F, pli, n_qis=1):
    """Device-resident scan inputs for one plane (same construction as
    bench.bench_device_pipeline_compute)."""
    import jax.numpy as jnp

    from theora_tpu.ops.fdct_np import rd_lambda

    g = enc.g
    dq = enc.enc.dequant
    pl = g.planes[pli]
    vpad, hpad = g.plane_padding(pli)
    n = pl.nfrags
    hh, ww = pl.nvfrags * 8, pl.nhfrags * 8
    cur = jnp.asarray(
        np.stack(
            [
                np.asarray(frames[f][pli])[::-1][:hh, :ww].astype(np.uint8)
                for f in range(F)
            ]
        )
    )
    z8 = jnp.zeros((F, n), jnp.int8)
    ones = jnp.ones((F, n), jnp.int8)
    rs = jnp.where(jnp.arange(F)[:, None] == 0, 0, ones)
    u2 = jnp.zeros((F, n), bool)
    ms = jnp.asarray(np.broadcast_to(np.arange(F)[:, None] != 0, (F, n)).copy())
    ik = jnp.asarray(np.arange(F) == 0)
    lam_qi = rd_lambda(enc.qi, int(dq[enc.qi, pli, 0, 1])) * 3.0
    lam_qp = rd_lambda(enc.qi, int(dq[enc.qi, pli, 1, 1])) * 3.0

    def pf(row, dtype=np.float32):
        a = np.asarray(row, dtype)
        return jnp.asarray(np.broadcast_to(a, (F,) + a.shape).copy())

    return (
        (
            cur, rs, z8, z8, z8, z8, u2, ms, ik,
            pf(dq[enc.qi, pli, 0], np.int32),
            pf(dq[enc.qi, pli, 1], np.int32),
            pf(enc._bv, np.int32), pf(enc._lam),
            pf(lam_qi), pf(lam_qp),
            jnp.asarray(enc._nb_dev), jnp.asarray(enc._nb_dev),
            pf(enc._lam_t[0]), pf(enc._lam_t[1]),
            pl.nvfrags, pl.nhfrags, vpad, hpad,
        ),
        n,
    )


def _time(fn, fence, reps):
    """Pipelined-dispatch timing: reps dispatches, one forcing fence."""
    fence(fn())  # warm/compile
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        fn()
    fence(fn())
    return (time.perf_counter() - t0) / reps


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--gops", type=int, default=1)
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    import jax

    from theora_tpu.encode.tpu_gop import TpuGopEncoder, _scan_encode_plane
    from theora_tpu.info import TheoraInfo
    from theora_tpu.ops import me_jax

    w, h = (int(x) for x in args.size.split("x"))
    F = args.frames
    frames = _synth_frames(w, h, F)
    info = TheoraInfo(
        frame_width=w, frame_height=h, pic_width=w, pic_height=h,
        quality=48,
    )
    enc = TpuGopEncoder(info, qi=48)
    mpix_f = (w * h + 2 * (w // 2) * (h // 2)) / 1e6

    rows = []

    def add(name, dt, frames_covered):
        rows.append(
            {
                "stage": name,
                "ms_per_gop": round(dt * 1e3, 2),
                "ms_per_frame": round(dt * 1e3 / frames_covered, 3),
                "mpix_s": round(mpix_f * frames_covered / dt, 1),
            }
        )

    reps = args.reps
    pa = [_plane_args(enc, frames, F, pli)[0] for pli in range(3)]
    ys_d = pa[0][0]

    # --- ME plan (fused pyramid search over the GOP) ---
    dt = _time(
        lambda: me_jax.plan_from_gop(ys_d),
        lambda outs: jax.device_get([o[:1] for o in outs]),
        reps,
    )
    add("me_plan", dt, F)

    # --- per-plane closed-loop scans, trellis tier ---
    for pli, name in ((0, "scan_luma"), (1, "scan_cb"), (2, "scan_cr")):
        dt = _time(
            lambda pli=pli: _scan_encode_plane(*pa[pli], use_trellis=True),
            lambda s: jax.device_get(s[0][:1, :1, :1]),
            reps,
        )
        add(name + "_trellis", dt, F)

    # --- luma scan, R/D-quantizer tier (isolates the trellis DP) ---
    dt = _time(
        lambda: _scan_encode_plane(*pa[0], use_trellis=False),
        lambda s: jax.device_get(s[0][:1, :1, :1]),
        reps,
    )
    add("scan_luma_rdquant", dt, F)

    # --- full pipeline (ME + 3 scans), the bench metric ---
    def one_pass():
        outs = me_jax.plan_from_gop(ys_d)
        scans = [
            _scan_encode_plane(*a, use_trellis=enc.use_trellis) for a in pa
        ]
        return outs, scans

    def fence(os):
        outs, scans = os
        jax.device_get(
            [o[:1] for o in outs] + [s[0][:1, :1, :1] for s in scans]
        )

    dt = _time(one_pass, fence, reps)
    add("pipeline_total", dt, F)

    # --- transform core (compute bound reference) ---
    from theora_tpu.pipeline import intra_encode_core
    import jax.numpy as jnp

    dq_y = jnp.asarray(enc.enc.dequant[48, 0, 0].astype(np.int32))
    yb = np.stack(
        [
            np.asarray(frames[f][0])
            .reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
            for f in range(F)
        ]
    )
    yb_d = jnp.asarray(yb)
    dt = _time(
        lambda: intra_encode_core(yb_d, dq_y),
        lambda qr: jax.device_get(qr[0][:1, :1]),
        reps,
    )
    rows.append(
        {
            "stage": "transform_core(luma)",
            "ms_per_gop": round(dt * 1e3, 2),
            "ms_per_frame": round(dt * 1e3 / F, 3),
            "mpix_s": round(w * h * F / 1e6 / dt, 1),
        }
    )

    # --- speed-of-light model ---
    hbm_gbs = 819.0  # v5e HBM bandwidth
    bytes_frame = (
        1.5 * w * h  # cur u8 (4:2:0)
        + 2 * 1.5 * w * h  # prev + gold refs
        + 1.5 * w * h  # recon write
        + 1.5 * w * h / 64 * 64 * 2  # qdct i16
    )
    sol_us = bytes_frame / (hbm_gbs * 1e3)
    model = {
        "bytes_touched_per_frame_mb": round(bytes_frame / 1e6, 2),
        "hbm_speed_of_light_us_per_frame": round(sol_us, 1),
        "hbm_speed_of_light_mpix_s": round(mpix_f / (sol_us * 1e-6), 0),
    }
    pt = next(r for r in rows if r["stage"] == "pipeline_total")
    model["pipeline_pct_of_hbm_roofline"] = round(
        100.0 * sol_us / (pt["ms_per_frame"] * 1e3), 2
    )

    if args.json:
        print(json.dumps({"stages": rows, "model": model}))
    else:
        print(f"{'stage':26s} {'ms/GOP':>9s} {'ms/frame':>9s} {'Mpix/s':>9s}")
        for r in rows:
            print(
                f"{r['stage']:26s} {r['ms_per_gop']:9.2f}"
                f" {r['ms_per_frame']:9.3f} {r['mpix_s']:9.1f}"
            )
        print("model:", json.dumps(model))
    return rows, model


if __name__ == "__main__":
    main()
