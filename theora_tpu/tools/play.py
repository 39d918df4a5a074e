"""Terminal "player": decode an Ogg Theora file with real-time pacing and
playback statistics -- the player_example/splayer analogue for an
environment without SDL (the display step is a no-op or an optional y4m
pipe for an external viewer).

Usage: python -m theora_tpu.tools.play [--stats-only] [-o pipe.y4m] in.ogv
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("-o", "--output", default=None,
                    help="also stream decoded frames to a y4m file/pipe")
    ap.add_argument("--stats-only", action="store_true",
                    help="decode as fast as possible, no pacing")
    args = ap.parse_args(argv)

    from theora_tpu.decode.decoder import Decoder
    from theora_tpu.headers import (
        parse_comment_header,
        parse_info_header,
        parse_setup_header,
    )
    from theora_tpu.ogg import demux_stream

    data = open(args.input, "rb").read()
    pkts = demux_stream(data)
    info = parse_info_header(pkts[0].data)
    comments = parse_comment_header(pkts[1].data)
    setup = parse_setup_header(pkts[2].data)
    fps = info.fps_numerator / max(info.fps_denominator, 1)
    print(
        f"{info.pic_width}x{info.pic_height} @ {fps:.3f} fps, "
        f"fmt {int(info.pixel_fmt)}, vendor {comments['vendor']!r}",
        file=sys.stderr,
    )
    # A/V files (player_example analogue): decode the Vorbis stream too
    # and report it; with no audio device in this environment the PCM is
    # synthesized and discarded, which still validates the mux.
    try:
        from theora_tpu.ogg import PageReader
        from theora_tpu.tools import vorbis as _vb

        astreams = {}
        for sn, p in PageReader(data).packets():
            astreams.setdefault(sn, []).append(p)
        apkts = next(
            (ps for ps in astreams.values()
             if ps and ps[0].data[:7] == b"\x01vorbis"), None,
        )
        if apkts and _vb.available():
            adec = _vb.VorbisDecoder(apkts[:3])
            nsamp = sum(len(adec.decode(p)) for p in apkts[3:])
            print(
                f"audio: Vorbis {adec.channels}ch @ {adec.rate} Hz, "
                f"{nsamp / max(adec.rate, 1):.2f}s decoded",
                file=sys.stderr,
            )
    except Exception as e:  # audio must never break video playback
        print(f"audio: undecodable ({e})", file=sys.stderr)
    dec = Decoder(info, setup)
    out_f = open(args.output, "wb") if args.output else None
    if out_f:
        tag = {0: "C420jpeg", 2: "C422", 3: "C444"}[int(info.pixel_fmt)]
        out_f.write(
            f"YUV4MPEG2 W{info.pic_width} H{info.pic_height} "
            f"F{info.fps_numerator}:{info.fps_denominator} Ip A1:1 "
            f"{tag}\n".encode()
        )
    t_start = time.perf_counter()
    shown = dropped = 0
    late = 0.0
    for i, p in enumerate(pkts[3:]):
        t_due = t_start + i / fps
        dec.decode_packet(p.data)
        now = time.perf_counter()
        if not args.stats_only:
            if now > t_due + 1.0 / fps:
                dropped += 1   # behind by more than a frame: skip display
                late += now - t_due
                continue
            if now < t_due:
                time.sleep(t_due - now)
        frame = dec.ycbcr_out()
        shown += 1
        if out_f:
            x0, y0 = info.pic_x, info.pic_y
            w, h = info.pic_width, info.pic_height
            hd, vd = info.hdec, info.vdec
            out_f.write(b"FRAME\n")
            out_f.write(frame[0][y0 : y0 + h, x0 : x0 + w].tobytes())
            for pli in (1, 2):
                out_f.write(
                    frame[pli][
                        y0 >> vd : (y0 + h) >> vd, x0 >> hd : (x0 + w) >> hd
                    ].tobytes()
                )
    dt = time.perf_counter() - t_start
    if out_f:
        out_f.close()
    n = len(pkts) - 3
    print(
        f"played {shown}/{n} frames in {dt:.2f}s "
        f"({n/dt:.1f} fps decode, {dropped} dropped, "
        f"{late*1000/max(dropped,1):.0f} ms avg lateness)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
