from .fused_psd import fused_psd_available, make_fused_psd_fn  # noqa: F401
