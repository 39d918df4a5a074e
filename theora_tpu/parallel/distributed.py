"""Multi-host GOP-parallel transcode over jax.distributed.

The multi-host scaling story from SURVEY §2.7/§5: GOPs (keyframe-delimited
frame runs) are fully independent coding units, so hosts encode disjoint
GOP subsets and host 0 gathers the packed bytes in stream order for
muxing. The only cross-host communication is the final ordered gather of
byte blobs, which rides a jax `all_gather` over padded uint8 tensors —
the codec itself never communicates.

Usage (per process):
    jax.distributed.initialize(coordinator, num_processes, process_id)
    pkts = distributed_transcode(frames, info, keyframe_freq=...)
    # pkts is the full ordered packet list on process 0, [] elsewhere.

Round-robin GOP assignment balances load; byte-identity with a sequential
encode follows from the GOP-local encoder state (see parallel/transcode).
"""
from __future__ import annotations

import numpy as np

from theora_tpu.info import TheoraInfo
from theora_tpu.parallel.transcode import _encode_gop, split_gops
from theora_tpu.tpkt import Packet


def _pack_blob(pkts: list[Packet]) -> bytes:
    """Serialize a GOP's packets (length-prefixed data + granulepos)."""
    out = bytearray()
    for p in pkts:
        out += len(p.data).to_bytes(4, "little")
        out += int(p.granulepos).to_bytes(8, "little", signed=True)
        out += bytes([1 if p.e_o_s else 0])
        out += p.data
    return bytes(out)


def _unpack_blob(blob: bytes, packetno0: int) -> list[Packet]:
    pkts = []
    off = 0
    pno = packetno0
    while off < len(blob):
        n = int.from_bytes(blob[off : off + 4], "little")
        gp = int.from_bytes(blob[off + 4 : off + 12], "little", signed=True)
        eos = blob[off + 12] == 1
        off += 13
        pkts.append(
            Packet(blob[off : off + n], granulepos=gp, packetno=pno,
                   e_o_s=eos)
        )
        pno += 1
        off += n
    return pkts


def distributed_transcode(
    frames: list,
    info: TheoraInfo,
    keyframe_freq: int = 64,
    configure=None,
    _drop_gops: set | None = None,
    gop_bases: list | None = None,
):
    """Encode `frames` across all jax processes; returns the ordered
    packet list on process 0 (header packets included), [] elsewhere.

    Every process must pass the same frames/info (frames can also be
    loaded per-process from shared storage; only the GOPs assigned to
    this process are actually encoded).

    gop_bases: optional UNEVEN GOP segmentation (ascending frame
    indices, starting at 0) -- e.g. scene cuts from
    encode.tpu_gop.gop_starts; every process must pass the same list.
    None = fixed keyframe_freq slicing."""
    if info.target_bitrate > 0:
        # Same invariant as transcode(): per-GOP CBR reservoirs would
        # silently diverge from a sequential encode.
        raise ValueError(
            "distributed transcode does not support CBR "
            "(target_bitrate > 0); encode sequentially instead"
        )
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    nproc = jax.process_count()
    pid = jax.process_index()
    if gop_bases is not None:
        bases = list(gop_bases) + [len(frames)]
        gops = [frames[bases[i]:bases[i + 1]]
                for i in range(len(bases) - 1)]
        gop_base = list(gop_bases)
        # Per-GOP keyframe_freq >= its length: only frame 0 of each
        # GOP is a forced keyframe (uneven scene-cut GOPs).
        gop_kf = [max(len(g), 1) for g in gops]
    else:
        gops = split_gops(frames, keyframe_freq)
        gop_base = [gi * keyframe_freq for gi in range(len(gops))]
        gop_kf = [keyframe_freq] * len(gops)
    ngops = len(gops)

    blobs: dict[int, bytes] = {}
    for gi in range(ngops):
        if gi % nproc != pid:
            continue
        if _drop_gops and gi in _drop_gops:
            # Fault injection for the elastic-recovery test: this
            # process "loses" the GOP (as a worker that crashed and
            # restarted after its assignment would).
            continue
        pkts = _encode_gop(
            info, gops[gi], gop_base[gi], gop_kf[gi],
            gi == ngops - 1, None,
        )
        if configure is not None:
            configure  # reserved for encoder knobs
        blobs[gi] = _pack_blob(pkts)

    # Ordered gather: one fixed-size uint8 tensor per GOP, padded to the
    # global max; lengths ride along. process_allgather broadcasts host
    # data over the DCN/ICI mesh.
    lengths = np.zeros(ngops, dtype=np.int64)
    for gi, b in blobs.items():
        lengths[gi] = len(b)
    all_lengths = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(lengths))
    )
    if all_lengths.ndim == 2:  # [nproc, ngops]
        full_lengths = all_lengths.max(axis=0)
    else:
        full_lengths = all_lengths
    maxlen = int(full_lengths.max()) if ngops else 0
    local = np.zeros((ngops, max(maxlen, 1)), dtype=np.uint8)
    for gi, b in blobs.items():
        local[gi, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    gathered = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(local))
    )
    if gathered.ndim == 3:  # [nproc, ngops, maxlen] -> elementwise max
        gathered = gathered.max(axis=0)

    if pid != 0:
        return []
    from theora_tpu.encode.encoder import Encoder

    # Elastic recovery (SURVEY.md section 5): a GOP whose gathered blob
    # is empty was lost by its assigned process (crash/restart after
    # assignment); host 0 reassigns it to itself. GOP encoding is
    # deterministic, so the recovered output is byte-identical to what
    # the failed worker would have produced. (A process that dies
    # *inside* the collective stalls jax.distributed itself; recovery
    # covers work lost around it.)
    for gi in range(ngops):
        if int(full_lengths[gi]) == 0:
            pkts = _encode_gop(
                info, gops[gi], gop_base[gi], gop_kf[gi],
                gi == ngops - 1, None,
            )
            blob = np.frombuffer(_pack_blob(pkts), dtype=np.uint8)
            full_lengths[gi] = len(blob)
            if len(blob) > gathered.shape[1]:
                pad = len(blob) - gathered.shape[1]
                gathered = np.pad(gathered, ((0, 0), (0, pad)))
            gathered[gi, : len(blob)] = blob

    enc = Encoder(info)
    pkts = enc.flush_headers()
    pno = 3
    for gi in range(ngops):
        gop_pkts = _unpack_blob(
            gathered[gi, : int(full_lengths[gi])].tobytes(), pno
        )
        pkts.extend(gop_pkts)
        pno += len(gop_pkts)
    return pkts
