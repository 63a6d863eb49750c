from . import fir
from .fir import (
    FirConfig,
    FirState,
    ResamplerFir,
    fir_coefficients,
    fir_init,
    make_fir_step,
)

__all__ = [
    "fir",
    "FirConfig",
    "FirState",
    "ResamplerFir",
    "fir_coefficients",
    "fir_init",
    "make_fir_step",
]
