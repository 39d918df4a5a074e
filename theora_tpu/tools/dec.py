"""Decode an Ogg Theora (.ogv) file to .y4m (the dump_video analogue,
including its postprocessing and telemetry ctl usage,
examples/dump_video.c:157-213,462-466).

Usage: python -m theora_tpu.tools.dec [--pp N] [--telemetry ...] in.ogv out.y4m
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--pp", type=int, default=0,
                    help="postprocessing level 0-7 (deblock/dering)")
    ap.add_argument("--telemetry", default="",
                    help="comma list of overlays: mbmode,mv,qi,bits")
    args = ap.parse_args(argv)

    from theora_tpu.decode.decoder import Decoder
    from theora_tpu.headers import (
        parse_comment_header,
        parse_info_header,
        parse_setup_header,
    )
    from theora_tpu.ogg import demux_stream
    from theora_tpu.tools.y4m import write_y4m

    data = open(args.input, "rb").read()
    pkts = demux_stream(data)
    info = parse_info_header(pkts[0].data)
    parse_comment_header(pkts[1].data)
    setup = parse_setup_header(pkts[2].data)
    dec = Decoder(info, setup)
    if args.pp:
        dec.set_pplevel(args.pp)
    if args.telemetry:
        dec.set_telemetry(
            **{k.strip(): 1 for k in args.telemetry.split(",") if k.strip()}
        )
    frames = []
    t0 = time.perf_counter()
    for p in pkts[3:]:
        dec.decode_packet(p.data)
        out = dec.ycbcr_out()
        # Crop to the picture region.
        x0, y0 = info.pic_x, info.pic_y
        w, h = info.pic_width, info.pic_height
        hd, vd = info.hdec, info.vdec
        frames.append(
            [
                out[0][y0 : y0 + h, x0 : x0 + w],
                out[1][y0 >> vd : (y0 + h) >> vd, x0 >> hd : (x0 + w) >> hd],
                out[2][y0 >> vd : (y0 + h) >> vd, x0 >> hd : (x0 + w) >> hd],
            ]
        )
    dt = time.perf_counter() - t0
    write_y4m(args.output, frames, (info.fps_numerator, info.fps_denominator))
    mpix = len(frames) * info.pic_width * info.pic_height * 1.5 / 1e6
    print(
        f"{len(frames)} frames decoded in {dt:.2f}s ({mpix/dt:.2f} Mpix/s)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
