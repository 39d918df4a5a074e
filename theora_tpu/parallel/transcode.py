"""GOP-parallel transcode: split a clip at keyframe boundaries, encode GOPs
independently (in parallel), and gather packets in stream order.

A GOP (keyframe + dependent delta frames) is the codec's natural elastic
unit: no coding state crosses a keyframe except the golden frame, which the
keyframe resets (SURVEY.md section 2.7). GOP outputs are byte-identical to a
sequential encode at the same keyframe schedule, so parallelism is free.

Ordered gather mirrors the multi-host plan: each worker returns (gop_index,
packets); the muxer concatenates by index. Across hosts the same structure
rides jax.distributed with per-GOP byte blobs gathered to host 0.
"""
from __future__ import annotations

import concurrent.futures as cf
import os
import signal

from theora_tpu.encode.encoder import Encoder
from theora_tpu.info import TheoraInfo
from theora_tpu.tpkt import Packet

# Fault injection for the elastic-retry tests (SURVEY.md section 5:
# GOP-level retry is the codec's natural elastic unit). Format:
# "<gop_index>:<marker_path>" -- the first worker to encode that GOP
# creates the marker and SIGKILLs itself; retries see the marker and
# proceed, exercising the recovery path deterministically.
_FAULT_ENV = "THEORA_TPU_FAULT_KILL_GOP"


def _maybe_inject_fault(gop_index: int) -> None:
    spec = os.environ.get(_FAULT_ENV)
    if not spec:
        return
    tgt, marker = spec.split(":", 1)
    if int(tgt) == gop_index and not os.path.exists(marker):
        with open(marker, "w"):
            pass
        os.kill(os.getpid(), signal.SIGKILL)


def split_gops(frames: list, keyframe_freq: int) -> list[list]:
    return [
        frames[i : i + keyframe_freq]
        for i in range(0, len(frames), keyframe_freq)
    ]


def _encode_gop(info: TheoraInfo, gop_frames, frame_base: int,
                keyframe_freq: int, is_last: bool, rd_strength):
    _maybe_inject_fault(frame_base // max(keyframe_freq, 1))
    enc = Encoder(info)
    enc.keyframe_freq = keyframe_freq
    enc.curframe_num = frame_base - 1
    if rd_strength is not None:
        enc.rd_strength = rd_strength
    pkts = []
    for j, fr in enumerate(gop_frames):
        last = is_last and j == len(gop_frames) - 1
        pkts.append(enc.encode_frame(fr, e_o_s=last))
    return pkts


def transcode(
    frames: list,
    info: TheoraInfo,
    keyframe_freq: int = 64,
    max_workers: int | None = None,
    rd_strength: float | None = None,
    use_processes: bool = False,
) -> list[Packet]:
    """Encode a clip GOP-parallel; returns headers + data packets in
    stream order with correct granule positions and packet numbers.

    use_processes sidesteps the GIL for the Python orchestration between
    native calls (frames are pickled to the workers; worth it for long
    GOPs on multi-core hosts)."""
    if info.target_bitrate > 0:
        # Each GOP worker would build an independent CBR reservoir, so the
        # output could not be byte-identical to a sequential encode -- the
        # invariant this module documents. Refuse rather than silently
        # diverge (rate-controlled clips go through Encoder sequentially).
        raise ValueError(
            "GOP-parallel transcode does not support CBR "
            "(target_bitrate > 0): per-GOP reservoirs would break "
            "sequential byte-identity; encode sequentially instead"
        )
    enc0 = Encoder(info)
    header_pkts = enc0.flush_headers()
    gops = split_gops(frames, keyframe_freq)
    results: list = [None] * len(gops)
    pool = (
        cf.ProcessPoolExecutor if use_processes else cf.ThreadPoolExecutor
    )
    # Elastic retry (SURVEY.md section 5): a killed/crashed worker only
    # loses its own GOPs; they are reassigned to a fresh pool. GOP
    # outputs are deterministic, so retried work is byte-identical to
    # what the dead worker would have produced.
    pending = dict(enumerate(gops))
    for attempt in range(3):
        if not pending:
            break
        broken = False
        with pool(max_workers=max_workers) as ex:
            futs = {
                ex.submit(
                    _encode_gop,
                    info,
                    gop,
                    gi * keyframe_freq,
                    keyframe_freq,
                    gi == len(gops) - 1,
                    rd_strength,
                ): gi
                for gi, gop in pending.items()
            }
            for fut in cf.as_completed(futs):
                gi = futs[fut]
                try:
                    results[gi] = fut.result()
                    del pending[gi]
                except Exception:
                    # Worker death (BrokenProcessPool poisons every
                    # outstanding future) or a transient error: keep the
                    # GOP pending and rebuild the pool.
                    broken = True
        if pending and not broken:
            break  # persistent per-GOP failure; don't spin
    if pending:
        # Last resort: encode the stragglers inline so a flaky pool can
        # never lose output.
        for gi, gop in sorted(pending.items()):
            results[gi] = _encode_gop(
                info, gop, gi * keyframe_freq, keyframe_freq,
                gi == len(gops) - 1, rd_strength,
            )
    out = list(header_pkts)
    pn = 3
    for pkts in results:
        for p in pkts:
            p.packetno = pn
            pn += 1
            out.append(p)
    return out
