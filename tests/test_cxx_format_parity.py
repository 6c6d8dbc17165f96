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
