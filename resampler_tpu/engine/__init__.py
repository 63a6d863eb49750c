from . import batched, fft, fir
from .batched import BatchedResamplerFft, BatchedResamplerFir
from .fft import (
    FftConfig,
    FftState,
    ResamplerFft,
    fft_fleet_init,
    fft_init,
    make_fft_fleet_step,
    make_fft_step,
)
from .fir import (
    FirConfig,
    FirState,
    ResamplerFir,
    fir_coefficients,
    fir_init,
    make_fir_step,
)

__all__ = [
    "batched",
    "fft",
    "fir",
    "BatchedResamplerFft",
    "BatchedResamplerFir",
    "FftConfig",
    "FftState",
    "ResamplerFft",
    "fft_fleet_init",
    "fft_init",
    "make_fft_fleet_step",
    "make_fft_step",
    "FirConfig",
    "FirState",
    "ResamplerFir",
    "fir_coefficients",
    "fir_init",
    "make_fir_step",
]
