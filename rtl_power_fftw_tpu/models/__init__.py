from .bartlett import bartlett_psd  # noqa: F401
from .welch import welch_psd  # noqa: F401
from .spectrogram import spectrogram  # noqa: F401
