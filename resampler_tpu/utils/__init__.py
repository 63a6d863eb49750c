from .wav import WavInfo, read_wav, write_wav

__all__ = ["WavInfo", "read_wav", "write_wav"]
