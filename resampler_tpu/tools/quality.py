"""Audio quality harness: signal generation + filter-response analysis.

Mirror of the reference's Python quality harness
(reference: test_audio_resampler.py:28-297 and driver
test_audio_resampler.sh:81-116): generate impulse and logarithmic sweep
test signals, resample them, and measure passband ripple, the -3 dB point,
and stopband attenuation from the impulse response; optionally render a
sweep spectrogram PNG.

Usage (module CLI):

    python -m resampler_tpu.tools.quality --in-rate 44100 --out-rate 48000 \
        --filter fft [--latency 64] [--attenuation 90] [--plot out.png]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import numpy as np

__all__ = [
    "generate_impulse",
    "generate_log_sweep",
    "QualityReport",
    "analyze_impulse_response",
    "run_quality_check",
]


def generate_impulse(sample_rate: int, duration: float = 2.0) -> np.ndarray:
    """Unit impulse in the middle of a silent signal
    (reference: test_audio_resampler.py:28-44)."""
    n = int(sample_rate * duration)
    x = np.zeros(n, np.float32)
    x[n // 2] = 1.0
    return x


def generate_log_sweep(
    sample_rate: int,
    duration: float = 5.0,
    f_start: float = 20.0,
    f_stop_frac_nyquist: float = 0.95,
    amplitude: float = 0.8,
) -> np.ndarray:
    """Logarithmic sine sweep 20 Hz -> 0.95*Nyquist
    (reference: test_audio_resampler.py:47-77)."""
    n = int(sample_rate * duration)
    t = np.arange(n, dtype=np.float64) / sample_rate
    f1 = f_stop_frac_nyquist * sample_rate / 2.0
    k = np.log(f1 / f_start) / duration
    phase = 2.0 * np.pi * f_start * (np.exp(k * t) - 1.0) / k
    return (amplitude * np.sin(phase)).astype(np.float32)


@dataclasses.dataclass
class QualityReport:
    passband_ripple_db: float
    cutoff_minus3db_hz: float
    stopband_attenuation_db: float
    passband_max_db: float
    stopband_max_db: float

    def __str__(self) -> str:
        return (
            f"passband ripple: {self.passband_ripple_db:.3f} dB | "
            f"-3 dB point: {self.cutoff_minus3db_hz:.1f} Hz | "
            f"stopband attenuation: {self.stopband_attenuation_db:.2f} dB"
        )


def analyze_impulse_response(
    resampled_impulse: np.ndarray,
    input_rate: int,
    output_rate: int,
    fft_size: int = 8192,
) -> QualityReport:
    """Frequency-response statistics of a resampled impulse
    (reference: test_audio_resampler.py:105-245): window 0.1 s around the
    peak, FFT, then — with ``nyq = min(input, output) / 2`` exactly as the
    reference's ``min_nyquist`` (test_audio_resampler.py:191-197) —
    passband ripple over [20 Hz, 0.9*nyq], -3 dB crossing, and stopband
    max over [1.1*nyq, top of spectrum]."""
    y = np.asarray(resampled_impulse, np.float64)
    peak = int(np.argmax(np.abs(y)))
    window = int(output_rate * 0.1)
    start = max(peak - window // 2, 0)
    ir = y[start : start + window]

    spec = np.fft.rfft(ir, fft_size)
    mag_db = 20 * np.log10(np.maximum(np.abs(spec), 1e-12))
    freqs = np.fft.rfftfreq(fft_size, 1.0 / output_rate)

    # the band the conversion can carry: below BOTH Nyquists (when
    # downsampling the filter cuts at the OUTPUT Nyquist — measuring the
    # passband against the input Nyquist would read the filter's own
    # rolloff as 'ripple', and the stopband window would be empty)
    nyq = min(input_rate, output_rate) / 2.0

    def bin_of(f):
        return int(round(f / output_rate * fft_size))

    pb_lo, pb_hi = bin_of(20.0), bin_of(nyq * 0.9)
    passband = mag_db[pb_lo : pb_hi + 1]
    ref_level = np.median(passband)
    ripple = float(passband.max() - passband.min())

    # -3 dB crossing relative to the passband reference level
    below = np.where(mag_db[pb_lo:] < ref_level - 3.0)[0]
    cutoff_hz = float(freqs[pb_lo + below[0]]) if below.size else float(
        freqs[-1]
    )

    sb_lo = bin_of(nyq * 1.1)
    sb_hi = len(mag_db) - 1
    if sb_lo < sb_hi:
        stopband_max = float(mag_db[sb_lo : sb_hi + 1].max())
        attenuation = float(passband.max() - stopband_max)
    else:
        stopband_max = float("-inf")  # pure upsample past analysis band
        attenuation = float("inf")

    return QualityReport(
        passband_ripple_db=ripple,
        cutoff_minus3db_hz=cutoff_hz,
        stopband_attenuation_db=attenuation,
        passband_max_db=float(passband.max()),
        stopband_max_db=stopband_max,
    )


def spectrogram_png(
    signal: np.ndarray, sample_rate: int, path: str, title: str = ""
) -> None:
    """Sweep spectrogram PNG (reference: test_audio_resampler.py:216-297)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 6))
    ax.specgram(signal, NFFT=2048, Fs=sample_rate, noverlap=1536, cmap="magma")
    ax.set_xlabel("time [s]")
    ax.set_ylabel("frequency [Hz]")
    ax.set_title(title or f"spectrogram @ {sample_rate} Hz")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def run_quality_check(
    input_rate: int,
    output_rate: int,
    filter_type: str = "fft",
    latency: int = 64,
    attenuation: int = 90,
    plot_path: str | None = None,
    impulse_duration: float = 2.0,
) -> QualityReport:
    """Generate impulse (+ sweep if plotting), resample with the chosen
    engine, analyze (the harness driver flow,
    reference: test_audio_resampler.sh:81-116)."""
    from .. import Attenuation, Latency, ResamplerFft, ResamplerFir
    from .interpolation import InterpolationMode, InterpolationResampler

    impulse = generate_impulse(input_rate, impulse_duration)

    if filter_type == "fft":
        r = ResamplerFft(1, input_rate, output_rate)
        y = r.process(impulse)
    elif filter_type == "fir":
        r = ResamplerFir(
            1,
            input_rate,
            output_rate,
            Latency.from_delay(latency),
            Attenuation.from_db(attenuation),
        )
        y = r.process(impulse)
    elif filter_type in ("linear", "hermite"):
        mode = (
            InterpolationMode.LINEAR
            if filter_type == "linear"
            else InterpolationMode.HERMITE
        )
        y = InterpolationResampler(1, input_rate, output_rate, mode).resample(
            impulse
        )
    else:
        raise ValueError(f"unknown filter type {filter_type!r}")

    report = analyze_impulse_response(y, input_rate, output_rate)

    if plot_path:
        sweep = generate_log_sweep(input_rate)
        if filter_type == "fft":
            ys = ResamplerFft(1, input_rate, output_rate).process(sweep)
        elif filter_type == "fir":
            ys = ResamplerFir(
                1,
                input_rate,
                output_rate,
                Latency.from_delay(latency),
                Attenuation.from_db(attenuation),
            ).process(sweep)
        else:
            ys = InterpolationResampler(1, input_rate, output_rate, mode).resample(
                sweep
            )
        spectrogram_png(
            ys,
            output_rate,
            plot_path,
            title=f"{input_rate}->{output_rate} Hz [{filter_type}]",
        )

    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="quality", description="Resampler quality harness"
    )
    p.add_argument("--in-rate", type=int, required=True)
    p.add_argument("--out-rate", type=int, required=True)
    p.add_argument(
        "--filter", default="fft", choices=["linear", "hermite", "fir", "fft"]
    )
    p.add_argument("--latency", type=int, default=64)
    p.add_argument("--attenuation", type=int, default=90)
    p.add_argument("--plot", default=None, metavar="PNG")
    args = p.parse_args(argv)

    report = run_quality_check(
        args.in_rate,
        args.out_rate,
        args.filter,
        args.latency,
        args.attenuation,
        args.plot,
    )
    print(report)
    return 0


if __name__ == "__main__":
    sys.exit(main())
