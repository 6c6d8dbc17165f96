"""Docs pipeline: the man page tracks MANUAL.md.

The reference generates its man page from markdown at build time
(doc/Makefile:1-17, pandoc); this rebuild checks the generated roff in
and pins it with a regeneration check so it cannot drift from the
manual."""
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_man_page_up_to_date():
    r = subprocess.run(
        [sys.executable, str(REPO / "docs" / "make_man.py"), "--check"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr


def test_man_page_structure():
    man = (REPO / "docs" / "rtl_power_fftw_tpu.1").read_text()
    assert man.startswith('.\\"')
    assert re.search(r'^\.TH "RTL_POWER_FFTW_TPU" "1"', man, re.M)
    # Every section of the manual made it through.
    for sec in ("SYNOPSIS", "SIGNALS", "OPTIONS", "TIME VALUES",
                "OUTPUT FORMAT", "FREQUENCY SCANNING", "BUFFERING",
                "EXIT CODES", "DIVERGENCES"):
        assert re.search(rf'^\.SH "?{sec}', man, re.M), sec
    # The version in the header matches the package's single source.
    from rtl_power_fftw_tpu import __version__
    assert f"rtl_power_fftw_tpu {__version__}" in man
