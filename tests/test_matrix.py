"""Full SampleRate-matrix coverage (BASELINE.md config 4): every rate pair,
mono + stereo, both engines produce sane audio.

The per-pair deep quality gates (stopband, ripple) live in
test_fir_engine.py / test_fft_engine.py; here the whole 10x10 matrix is
swept with cheaper invariants: exact length ratios, DC preservation, and
finite output.
"""

import numpy as np
import pytest

from resampler_tpu import (
    Attenuation,
    Latency,
    ResamplerFft,
    ResamplerFir,
    SampleRate,
)

ALL_RATES = list(SampleRate)


@pytest.mark.parametrize("in_rate", ALL_RATES)
@pytest.mark.parametrize("out_rate", ALL_RATES)
def test_fft_matrix_dc(in_rate, out_rate):
    r = ResamplerFft(1, in_rate, out_rate)
    # exact ratio: sizes are in exact proportion
    assert r.chunk_size_output() * int(in_rate) == r.chunk_size_input() * int(
        out_rate
    )
    x = np.full(r.chunk_size_input(), 0.25, np.float32)
    out = np.zeros(r.chunk_size_output(), np.float32)
    for _ in range(3):
        r.resample(x, out)
    lo = min(r.delay(), out.size // 4)
    hi = out.size * 3 // 4
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[lo:hi], 0.25, atol=0.02)


# FIR across the FULL 10x10 matrix (the FIR engine accepts arbitrary
# rates, so every constructible pair is executed; same cheap invariants as
# the FFT sweep — reference test strategy: SURVEY.md §4 item 4).
@pytest.mark.parametrize("in_rate", ALL_RATES)
@pytest.mark.parametrize("out_rate", ALL_RATES)
def test_fir_matrix_sine_stereo(in_rate, out_rate):
    in_hz, out_hz = int(in_rate), int(out_rate)
    r = ResamplerFir(2, in_rate, out_rate, Latency.Sample32, Attenuation.Db90)
    n = 4000  # one input bucket -> one compiled shape per rate pair
    t = np.arange(n) / in_hz
    freq = min(in_hz, out_hz) / 10  # safely in passband
    frames = np.stack(
        [0.5 * np.sin(2 * np.pi * freq * t), np.full(n, 0.25)], axis=1
    ).astype(np.float32)
    y = r.process(frames.reshape(-1))
    frames_out = y.reshape(-1, 2)
    # length ratio (minus filter tail lookahead)
    expected = (n - r.taps) * out_hz / in_hz
    assert abs(len(frames_out) - expected) <= out_hz / in_hz + 2
    assert np.isfinite(y).all()
    steady = frames_out[len(frames_out) // 4 : -len(frames_out) // 4]
    # RMS-based amplitude: immune to the output grid sampling the sine at
    # phases that miss the peak (e.g. identity pairs, where the period is
    # exactly 10 samples and max |sin| over the grid is 0.951)
    amp = np.sqrt(2.0) * np.std(steady[:, 0] - np.mean(steady[:, 0]))
    assert amp == pytest.approx(0.5, abs=0.02)
    np.testing.assert_allclose(steady[:, 1], 0.25, atol=0.02)
