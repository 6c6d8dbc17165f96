"""Byte-exactness of the output formatter vs REAL C++ iostreams.

The text writer claims C++ ``std::setprecision`` semantics
(acquisition.cxx:412-417). This test compiles an actual C++ formatter
with the system g++ and diffs its output against utils.cxxfmt over edge
cases and thousands of randomized (value, precision) pairs — the
strongest possible check without building the whole reference.
Skipped when no C++ toolchain is available.
"""

import shutil
import subprocess

import numpy as np
import pytest

from rtl_power_fftw_tpu.utils.cxxfmt import cxx_float

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no g++ toolchain")

_CXX_SRC = r"""
#include <iostream>
#include <iomanip>
#include <string>
int main() {
    // stdin lines: "<precision> <value-as-hex-bits>"
    std::string line;
    int prec;
    unsigned long long bits;
    while (std::cin >> prec >> std::hex >> bits >> std::dec) {
        double v;
        static_assert(sizeof(v) == sizeof(bits), "");
        __builtin_memcpy(&v, &bits, sizeof(v));
        std::cout << std::setprecision(prec) << v << "\n";
    }
    return 0;
}
"""


@pytest.fixture(scope="module")
def cxx_formatter(tmp_path_factory):
    d = tmp_path_factory.mktemp("cxxfmt")
    src = d / "fmt.cpp"
    exe = d / "fmt"
    src.write_text(_CXX_SRC)
    subprocess.run(["g++", "-O1", "-o", str(exe), str(src)], check=True)
    return str(exe)


def cxx_reference(exe, pairs):
    lines = "".join(
        f"{p} {np.float64(v).view(np.uint64):x}\n" for p, v in pairs)
    out = subprocess.run([exe], input=lines, capture_output=True,
                         text=True, check=True)
    return out.stdout.splitlines()


def check(exe, pairs):
    got = [cxx_float(v, p) for p, v in pairs]
    want = cxx_reference(exe, pairs)
    mismatches = [(p, v, g, w)
                  for (p, v), g, w in zip(pairs, got, want) if g != w]
    assert not mismatches, mismatches[:10]


def test_edge_cases(cxx_formatter):
    values = [0.0, -0.0, 1.0, -1.0, 0.5, 100.0, 1e6, 2e6, 999999.5,
              1000000.5, 1.41940575e9, -68.7714, 0.025, 0.0557726,
              1e-5, 9.999999e-5, 1e300, 1e-300, 123456789.123456789,
              0.1, 0.2, 0.3, 1.0 / 3.0, 2.0 / 3.0]
    pairs = [(p, v) for v in values for p in (1, 2, 6, 9, 12, 17)]
    check(cxx_formatter, pairs)


def test_randomized_sweep(cxx_formatter):
    rng = np.random.default_rng(99)
    pairs = []
    # Magnitudes spanning the PSD/frequency ranges the tool prints.
    for _ in range(4000):
        exp = rng.uniform(-12, 12)
        v = float(rng.choice([-1, 1])) * 10.0 ** exp * rng.uniform(1, 10)
        p = int(rng.integers(1, 18))
        pairs.append((p, v))
    check(cxx_formatter, pairs)


def test_output_style_values(cxx_formatter):
    """Exactly the styles the writer emits: frequency at adaptive
    precision, power at 6 significant digits."""
    rng = np.random.default_rng(7)
    pairs = []
    for _ in range(2000):
        freq = rng.uniform(1e5, 2e9)
        pairs.append((9, freq))
        pwr = rng.uniform(-120, 40)
        pairs.append((6, pwr))
    check(cxx_formatter, pairs)


_CXX_PREC_SRC = r"""
// The reference's significantPlacesFreq formula, verbatim semantics
// (acquisition.cxx:379-383): int division rate/N, double log10s, ceil,
// then the (int) conversion implicit in setprecision. Reads
// "tuned_freq rate N freq_bits" per line; writes
// "<places as %.17g> <formatted freq or '-'>".
#include <cmath>
#include <cstdio>
#include <iostream>
#include <iomanip>
#include <sstream>
#include <limits>
int main() {
    long long tuned_freq, rate, N;
    unsigned long long bits;
    while (std::cin >> tuned_freq >> rate >> N >> std::hex >> bits >> std::dec) {
        double places = std::ceil(std::floor(std::log10((double)tuned_freq))
                                  - std::log10((double)(rate / N)) + 1 + 2);
        double f;
        __builtin_memcpy(&f, &bits, sizeof(f));
        std::printf("%.17g ", places);
        if (std::isfinite(places)
            && places >= -1000000 && places <= 1000000) {
            std::ostringstream os;
            os << std::setprecision((int)places) << f;
            std::printf("%s\n", os.str().c_str());
        } else {
            std::printf("-\n");
        }
    }
    return 0;
}
"""


@pytest.fixture(scope="module")
def cxx_prec(tmp_path_factory):
    d = tmp_path_factory.mktemp("cxxprec")
    src = d / "prec.cpp"
    exe = d / "prec"
    src.write_text(_CXX_PREC_SRC)
    subprocess.run(["g++", "-O1", "-o", str(exe), str(src)], check=True)
    return str(exe)


def test_freq_precision_fuzz_vs_reference_formula(cxx_prec):
    """Drive freq_precision + cxx_float over degenerate and extreme
    (tuned_freq, rate, N) triples against the reference formula COMPILED
    with g++, pinning exactly where the documented clamps diverge from
    the reference's UB cases (acquisition.cxx:379-383):

    * well-defined places in [1, 40]  -> byte parity, same precision;
    * places > 40                     -> we clamp to 40 (reference would
                                         print more digits than float64
                                         holds — pure noise);
    * places < 1                      -> we clamp to 1 (libstdc++ treats
                                         negative precision as 6 via
                                         printf, i.e. reference output
                                         depends on UB);
    * tuned_freq <= 0 or rate < N     -> log10 of <= 0: reference UB
                                         (places is nan/inf); we return 17
                                         (round-trip-exact float64).
    """
    from rtl_power_fftw_tpu.output.text import freq_precision
    from rtl_power_fftw_tpu.ops.spectral import bin_frequencies

    rng = np.random.default_rng(1234)
    triples = []
    # Degenerate classes, deliberately over-sampled.
    for _ in range(300):
        triples.append((0, int(rng.integers(1, 10**7)),
                        int(rng.integers(2, 4096))))                 # f = 0
        triples.append((-int(rng.integers(1, 10**9)),
                        int(rng.integers(1, 10**7)),
                        int(rng.integers(2, 4096))))                 # f < 0
        N = int(rng.integers(2, 1 << 21))
        triples.append((int(rng.integers(1, 10**10)),
                        int(rng.integers(1, N)), N))                 # rate < N
    # Extreme-but-defined: huge f over tiny step and vice versa.
    for _ in range(700):
        f = int(10 ** rng.uniform(0, 12))
        rate = int(10 ** rng.uniform(0, 8))
        N = int(rng.integers(2, 1 << 21))
        triples.append((f, rate, N))
    # Realistic band for good measure.
    for _ in range(500):
        f = int(rng.integers(10**5, 2 * 10**9))
        rate = int(rng.integers(10**5, 4 * 10**6))
        N = int(rng.integers(2, 1 << 16))
        triples.append((f, rate, N))

    lines = []
    test_freqs = []
    for f, rate, N in triples:
        tf = bin_frequencies(f, 2, rate)[0]  # a representative bin value
        test_freqs.append(tf)
        lines.append(f"{f} {rate} {N} {np.float64(tf).view(np.uint64):x}")
    out = subprocess.run([cxx_prec], input="\n".join(lines) + "\n",
                         capture_output=True, text=True, check=True)
    rows = out.stdout.splitlines()
    assert len(rows) == len(triples)

    mismatches = []
    for (f, rate, N), tf, row in zip(triples, test_freqs, rows):
        places_s, formatted = row.split(" ", 1)
        places = float(places_s)
        ours = freq_precision(f, rate, N)
        step = rate // N
        if f <= 0 or step <= 0:
            # Reference UB (log10 of <= 0) — our documented clamp.
            if ours != 17:
                mismatches.append((f, rate, N, "ub-clamp", ours))
        elif not np.isfinite(places):
            mismatches.append((f, rate, N, "unexpected-inf", places))
        elif places > 40:
            if ours != 40:
                mismatches.append((f, rate, N, "hi-clamp", ours, places))
        elif places < 1:
            if ours != 1:
                mismatches.append((f, rate, N, "lo-clamp", ours, places))
        else:
            # Well-defined: same precision AND byte-identical formatting.
            if ours != int(places):
                mismatches.append((f, rate, N, "prec", ours, places))
            elif cxx_float(tf, ours) != formatted:
                mismatches.append((f, rate, N, "bytes",
                                   cxx_float(tf, ours), formatted))
    assert not mismatches, (len(mismatches), mismatches[:10])
