"""``python -m rtl_power_fftw_tpu.stitch`` — stitch overlapping hop
spectra from saved text output into one wideband spectrum. Thin entry
shim over utils/stitch.py."""

from .utils.stitch import main, merge_spectra, parse_text  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(main())
