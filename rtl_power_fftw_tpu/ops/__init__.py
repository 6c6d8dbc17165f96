from .spectral import (  # noqa: F401
    PsdStep,
    finalize_psd,
    bin_frequencies,
    FrameSlicer,
)
from .dft import dft_power_matmul, dft_power_fourstep, best_fourstep_split  # noqa: F401
