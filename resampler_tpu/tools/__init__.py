from .interpolation import InterpolationMode, InterpolationResampler

__all__ = ["InterpolationMode", "InterpolationResampler"]
