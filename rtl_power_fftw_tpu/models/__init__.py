from .bartlett import bartlett_psd  # noqa: F401
from .welch import welch_psd  # noqa: F401
from .spectrogram import spectrogram  # noqa: F401
from .scan import scan_psd, plan_hop_freqs  # noqa: F401
from .kurtosis import spectral_kurtosis  # noqa: F401
from .multitaper import multitaper_psd  # noqa: F401
from .coherence import coherence  # noqa: F401
from .cyclo import spectral_correlation  # noqa: F401
from .pfb import pfb_psd, pfb_channelize, pfb_prototype  # noqa: F401
