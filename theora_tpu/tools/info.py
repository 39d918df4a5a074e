"""Print library and stream information (the libtheora_info analogue)."""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", nargs="?", help="optional .ogv to inspect")
    args = ap.parse_args(argv)

    from theora_tpu import __version__
    from theora_tpu.info import (
        VENDOR_STRING, VERSION_MAJOR, VERSION_MINOR, VERSION_SUBMINOR,
    )

    print(f"theora_tpu {__version__} ({VENDOR_STRING})")
    print(
        f"bitstream version: {VERSION_MAJOR}.{VERSION_MINOR}."
        f"{VERSION_SUBMINOR}"
    )
    if args.input:
        from theora_tpu.headers import parse_comment_header, parse_info_header
        from theora_tpu.ogg import demux_stream

        pkts = demux_stream(open(args.input, "rb").read())
        info = parse_info_header(pkts[0].data)
        c = parse_comment_header(pkts[1].data)
        print(f"frame: {info.frame_width}x{info.frame_height}")
        print(
            f"picture: {info.pic_width}x{info.pic_height}"
            f"+{info.pic_x}+{info.pic_y}"
        )
        print(f"fps: {info.fps_numerator}/{info.fps_denominator}")
        print(f"pixel format: {int(info.pixel_fmt)}")
        print(f"vendor: {c['vendor'].decode('utf-8', 'replace')}")
        print(f"packets: {len(pkts) - 3} data")
    return 0


if __name__ == "__main__":
    sys.exit(main())
