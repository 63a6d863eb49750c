from .window import (
    WindowType,
    bessel_i0,
    calculate_cutoff_kaiser,
    make_kaiser_window,
    make_sincs_for_kaiser,
)
from .planner import ConversionConfig, plan_conversion

__all__ = [
    "WindowType",
    "bessel_i0",
    "calculate_cutoff_kaiser",
    "make_kaiser_window",
    "make_sincs_for_kaiser",
    "ConversionConfig",
    "plan_conversion",
]
