"""MFU / roofline accounting for the committed per-band throughputs.

Round-4 ask #6: BENCHMARKS reported GS/s only; this model converts each
committed band number into achieved TFLOP/s and % of the v5e's MXU peak
so band decisions and regressions are interpretable against hardware
limits. Pure arithmetic over committed numbers — prints the markdown
table merged into BENCHMARKS.md ("Roofline / MFU accounting").

FLOP model (per complex input sample, real-MAC units):

* matmul-stage paths run at Precision.HIGHEST = 6 native bf16 passes
  per f32-faithful matmul (XLA's emulation; the HLO audit in
  probes/hlo_map_large.py confirmed the stage-1 FFT ALSO lowers to six
  HIGHEST conv passes at 2^20, so FFT stages are modeled at the same
  6x multiplier over their 5L·log2 L algorithmic cost).
* Karatsuba complex matmul = 3 real matmuls of the contraction length;
  4-mult form = 4.
* per-stage contraction lengths come from the shipping splits.

Peak: v5e MXU = 197 TFLOP/s bf16 (public spec). "executed TFLOP/s" =
2 · executed-bf16-MACs/sample · GS/s / 1e3 (MAC = 2 flops).

Run anywhere:  python probes/mfu_model.py
"""
import sys

sys.path.insert(0, "/root/repo")

from rtl_power_fftw_tpu.ops.dft import (best_fourstep_split,
                                        best_hybrid_split, next_pow2)

PEAK_BF16_TFLOPS = 197.0  # v5e MXU peak
import math


def log2(x):
    return math.log2(x)


def hybrid_macs(N, n2=None):
    """FFT stage 1 (len N1, 6x-emulated) + 4-mult HIGHEST stage 2 (K=N2)
    + split twiddle (VPU, excluded from MXU MACs)."""
    if n2 is None:
        n1, n2 = best_hybrid_split(N, min_n1=8)
    else:
        n1 = N // n2
    fft1 = 6 * 2.5 * log2(n1)      # 5·L·log2L flops = 2.5·L·log2L MACs
    s2 = 6 * 4 * n2
    return fft1 + s2, f"hybrid {n1}x{n2}"


def fourstep_macs(N):
    """Karatsuba 3-mult HIGHEST matmuls on both stages."""
    n1, n2 = best_fourstep_split(N)
    return 6 * 3 * (n1 + n2), f"four-step {n1}x{n2}"


def fourstep4m_macs(N):
    """Compensated four-step: 4-mult HIGHEST stages (no Karatsuba)."""
    n1, n2 = best_fourstep_split(N)
    return 6 * 4 * (n1 + n2), f"fourstep4m {n1}x{n2}"


def matmul_macs(N):
    return 6 * 4 * N, "matmul DFT"


def pallas_macs(N):
    """Fused kernel: stage 1 = Karatsuba with 3-term weight-only bf16
    splits on exact integer inputs (3 passes per product, K-stacked);
    stage 2 = 3x3-drop input x weight splits (6 passes per product)."""
    n1, n2 = best_fourstep_split(N)
    s1 = 3 * 3 * n1
    s2 = 6 * 3 * n2
    return s1 + s2, f"pallas kernel {n1}x{n2}"


def fft4_macs(N):
    n1, n2 = best_fourstep_split(N)
    return 6 * 2.5 * (log2(n1) + log2(n2)), f"fft4 {n1}x{n2}"


def bluestein_macs(N):
    M = next_pow2(2 * N - 1)
    m1, m2 = best_fourstep_split(M)
    per_m = 6 * 2.5 * (log2(m1) + log2(m2))
    return 2 * per_m * M / N, f"bluestein M={M}"


# (label, N, committed GS/s, macs_fn) — GS/s from BENCHMARKS.md round-3
# tables ("Throughput vs FFT size", config sweep; isolated numbers where
# recorded).
ROWS = [
    ("256", 256, 12.1, fourstep_macs),
    ("500", 500, 10.5, fourstep_macs),
    ("512", 512, 10.9, lambda n: hybrid_macs(n, 64)),
    ("1024", 1024, 14.8, lambda n: hybrid_macs(n, 128)),
    ("2048 (config 1)", 2048, 13.6, lambda n: hybrid_macs(n, 128)),
    ("3072", 3072, 13.0, lambda n: hybrid_macs(n, 128)),
    ("4096", 4096, 15.1, pallas_macs),
    ("6144", 6144, 11.2, fourstep_macs),
    ("8192", 8192, 15.7, pallas_macs),
    ("16384", 16384, 21.9, pallas_macs),
    ("65536", 65536, 9.7, pallas_macs),
    ("2^17 (r4 band move)", 1 << 17, 4.3, fourstep4m_macs),
    ("2^18", 1 << 18, 6.8, lambda n: hybrid_macs(n, 128)),
    ("2^20 (config 3, isolated)", 1 << 20, 9.33,
     lambda n: hybrid_macs(n, 128)),
]


def main():
    print("| band | path | GS/s | exec bf16 MACs/sample | achieved "
          "TFLOP/s | % of 197 peak |")
    print("|---|---|---|---|---|---|")
    for label, N, gsps, fn in ROWS:
        macs, path = fn(N)
        tflops = 2 * macs * gsps / 1e3
        print(f"| {label} | {path} | {gsps} | {macs:.0f} | "
              f"{tflops:.1f} | {100*tflops/PEAK_BF16_TFLOPS:.0f}% |")


if __name__ == "__main__":
    main()
