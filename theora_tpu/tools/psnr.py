"""Per-frame and global PSNR (and luma SSIM) between two .y4m files
(the dump_psnr analogue, examples/dump_psnr.c, extended with SSIM --
the reference adjudicates quality on PSNR alone, but its default
activity masking is perceptually motivated, so an HVS-weighted metric
is required to judge masking defaults; see theora_tpu/metrics.py)."""
from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("file1")
    ap.add_argument("file2")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--no-ssim", action="store_true",
                    help="skip the SSIM computation (PSNR only)")
    args = ap.parse_args(argv)

    from theora_tpu.metrics import ssim
    from theora_tpu.tools.y4m import read_y4m

    _, _, _, fa = read_y4m(args.file1)
    _, _, _, fb = read_y4m(args.file2)
    n = min(len(fa), len(fb))
    gsse = np.zeros(3)
    gn = np.zeros(3)
    ssims = []
    for i in range(n):
        psnrs = []
        for pli in range(3):
            a = fa[i][pli].astype(np.float64)
            b = fb[i][pli].astype(np.float64)
            sse = float(((a - b) ** 2).sum())
            gsse[pli] += sse
            gn[pli] += a.size
            mse = sse / a.size
            psnrs.append(10 * np.log10(255.0**2 / mse) if mse else float("inf"))
        line = (
            f"frame {i}: Y {psnrs[0]:.4f}  Cb {psnrs[1]:.4f}  "
            f"Cr {psnrs[2]:.4f}"
        )
        if not args.no_ssim:
            s = ssim(fa[i][0], fb[i][0])
            ssims.append(s)
            line += f"  SSIM {s:.5f}"
        if not args.quiet:
            print(line)
    names = "Y", "Cb", "Cr"
    out = {}
    for pli in range(3):
        mse = gsse[pli] / gn[pli] if gn[pli] else 0.0
        p = 10 * np.log10(255.0**2 / mse) if mse else float("inf")
        out[names[pli]] = p
        print(f"Total {names[pli]}: {p:.4f} dB", file=sys.stderr)
    if ssims:
        out["SSIM"] = float(np.mean(ssims))
        print(f"Mean luma SSIM: {out['SSIM']:.5f}", file=sys.stderr)
    return out


if __name__ == "__main__":
    main()
