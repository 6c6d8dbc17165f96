#!/usr/bin/env python
"""Render a matrix-mode scan (.bin + .met) as a waterfall PNG.

Usage: python examples/plot_waterfall.py <basename-without-extension> [out.png]

The reference's man page demonstrates gnuplot rendering of the .bin
stream (doc/rtl_power_fftw.1.md:196-199); this does the same with
matplotlib if present, else writes a gnuplot-ready text dump.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rtl_power_fftw_tpu.output.matrix import read_matrix  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    base = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else base + ".png"
    data, meta = read_matrix(base + ".bin", base + ".met")
    print(f"{meta['rows']} scans x {meta['cols']} bins, "
          f"{meta['startFreq']}..{meta['endFreq']} Hz "
          f"step {meta['stepFreq']} Hz", file=sys.stderr)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        f0, f1 = float(meta["startFreq"]) / 1e6, float(meta["endFreq"]) / 1e6
        fig, ax = plt.subplots(figsize=(10, 6))
        im = ax.imshow(data, aspect="auto", origin="lower",
                       extent=[f0, f1, 0, data.shape[0]], cmap="viridis")
        ax.set_xlabel("frequency [MHz]")
        ax.set_ylabel("scan")
        fig.colorbar(im, label="PSD [dB/Hz]")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        print(f"wrote {out}", file=sys.stderr)
    except ImportError:
        txt = base + ".waterfall.txt"
        np.savetxt(txt, data, fmt="%.6g")
        print(f"matplotlib unavailable; wrote gnuplot-ready {txt} "
              f"(plot with: gnuplot -e \"plot '{txt}' matrix with image\")",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
