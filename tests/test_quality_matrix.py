"""Full-matrix MEASURED quality tier (nightly): stopband / alias rejection
for every constructible SampleRate pair, both engines.

The cheap 10x10 invariants live in test_matrix.py; the per-pair DEEP gates
(the reference measures stopband per pair in its engine tests,
reference: src/resampler_fir.rs:653-816) previously existed only for a
handful of selected pairs.  This tier sweeps them all:

- UPSAMPLING pairs: impulse -> resample -> 8192-pt FFT -> passband max
  minus stopband max (the reference's own measurement), gated at the
  reference thresholds (FIR Db90 >= 90 dB; FFT Kaiser beta=10 design
  >= 99 dB).  Passband ripple is recorded in the table (not gated: the
  band edge definition dominates it).
- DOWNSAMPLING pairs: the stopband folds into the passband, so the gate
  is ALIAS REJECTION — a full-scale tone placed past the design's
  transition-band end must vanish from the output.  The tone frequency is
  derived per pair from the engine's own cutoff policy plus the Kaiser
  transition width, mirroring what the filter actually promises (a fixed
  tone fraction would be unfair to heavy ratios, where the taps-long
  input-time filter has an intrinsically wide absolute transition — the
  reference behaves identically, see the cutoff scaling at
  src/resampler_fir.rs:316-324).

Runtime is ~minutes (one jit compile per pair geometry), so the tier is
opt-in:  RESAMPLER_NIGHTLY=1 python -m pytest tests/test_quality_matrix.py -s
The worst-pair table prints at the end of each sweep.
"""

import os

import numpy as np
import pytest

from resampler_tpu import (
    Attenuation,
    Latency,
    ResamplerFft,
    ResamplerFir,
    SampleRate,
)
from resampler_tpu.dsp.window import calculate_cutoff_kaiser

nightly = pytest.mark.skipif(
    os.environ.get("RESAMPLER_NIGHTLY") != "1",
    reason="full-matrix quality sweep; set RESAMPLER_NIGHTLY=1",
)

ALL_RATES = list(SampleRate)
TAPS = Latency.Sample64.taps  # 128
FIR_BETA = Attenuation.Db90.kaiser_beta  # 10.0
FFT_BETA = 10.0  # engine/fft.py KAISER_BETA


def _transition_width(taps: int, beta: float) -> float:
    """Kaiser transition width as a fraction of input Nyquist
    (the inverse of the design rule in calculate_cutoff_kaiser)."""
    a_db = beta / 0.1102 + 8.7
    return (a_db - 7.95) / (14.36 * taps)


def _stop_edge_hz(in_hz: int, out_hz: int, taps: int, beta: float) -> float:
    """First frequency the design fully attenuates, in Hz: scaled cutoff
    plus one transition width, times input Nyquist."""
    cutoff = calculate_cutoff_kaiser(taps, beta)
    if out_hz < in_hz:
        cutoff *= out_hz / in_hz
    return (cutoff + _transition_width(taps, beta)) * (in_hz / 2)


def _alias_tone_hz(in_hz: int, out_hz: int, taps: int, beta: float) -> float:
    """Test-tone placement for downsampling pairs: past the stop edge,
    inside the input band, with its folded image away from DC."""
    stop = _stop_edge_hz(in_hz, out_hz, taps, beta)
    hi = 0.95 * in_hz / 2
    assert stop < hi, f"stop edge {stop:.0f} beyond measurable band {hi:.0f}"
    f = min(stop * 1.05, (stop + hi) / 2)
    r = f % out_hz
    if min(r, out_hz - r) < 200.0:  # folded image too close to DC
        f = min(f + 300.0, hi)
    return f


def _impulse_stopband(
    process, in_hz: int, out_hz: int, n_in: int, stop_edge_hz: float
):
    """(stopband_attenuation_db, passband_ripple_db) from an impulse,
    mirroring the reference gate (reference: src/resampler_fir.rs:688-801).
    The stopband starts at the DESIGN's stop edge, so near-unity
    upsampling pairs (44.1->48: only a 22.05-24 kHz guard band exists)
    measure their real, narrow stopband instead of an empty window."""
    x = np.zeros(n_in, np.float32)
    x[n_in // 2] = 1.0
    y = process(x)
    peak = int(np.argmax(np.abs(y)))
    window = int(out_hz * 0.1)
    start = max(peak - window // 2, 0)
    ir = y[start : start + window]
    # 8192 at <= 48 kHz (the reference's size); scale up for high rates so
    # the window is never truncated before the IR peak
    fft_size = max(8192, 1 << (window - 1).bit_length())
    spec = np.fft.rfft(ir, fft_size)
    mag_db = 20 * np.log10(np.maximum(np.abs(spec), 1e-12))

    def bin_of(freq):
        return round(freq / out_hz * fft_size)

    nyq_in = in_hz / 2
    stop_lo = max(stop_edge_hz * 1.01, nyq_in * 1.02)
    stop_hi = 0.98 * out_hz / 2
    b_lo, b_hi = bin_of(stop_lo), min(len(mag_db) - 4, bin_of(stop_hi))
    assert b_hi - b_lo >= 8, (in_hz, out_hz, stop_lo, stop_hi)
    passband = mag_db[bin_of(20.0) : bin_of(nyq_in * 0.9) + 1]
    stopband = mag_db[b_lo : b_hi + 1]
    ripple_band = mag_db[bin_of(20.0) : bin_of(nyq_in * 0.85) + 1]
    return (
        float(passband.max() - stopband.max()),
        float(ripple_band.max() - ripple_band.min()),
    )


def _alias_rejection(process, in_hz: int, out_hz: int, f_tone: float, n_in: int):
    """Rejection (dB) of a full-scale stopband tone after downsampling:
    the output should be silence, so max |steady output| measures the
    folded alias directly."""
    t = np.arange(n_in, dtype=np.float64) / in_hz
    x = (0.5 * np.sin(2 * np.pi * f_tone * t)).astype(np.float32)
    y = process(x)
    trim = max(2048, out_hz // 20)
    steady = y[trim:-trim] if y.size > 3 * trim else y[y.size // 4 : -y.size // 8]
    return float(-20 * np.log10(np.abs(steady).max() / 0.5 + 1e-12))


def _report(title, rows, failures):
    rows.sort(key=lambda r: r[2])
    print(f"\n{title} — worst pairs first")
    print(f"{'pair':>16} {'mode':>7} {'metric dB':>10} {'ripple dB':>10}")
    for pair, mode, db, ripple in rows[:12]:
        rip = f"{ripple:10.3f}" if ripple == ripple else " " * 10
        print(f"{pair:>16} {mode:>7} {db:10.1f} {rip}")
    assert not failures, "quality gate failures: " + "; ".join(failures)


@nightly
def test_fir_quality_matrix():
    rows, failures = [], []
    for in_rate in ALL_RATES:
        for out_rate in ALL_RATES:
            in_hz, out_hz = int(in_rate), int(out_rate)
            if in_hz == out_hz:
                continue

            def process(x, in_rate=in_rate, out_rate=out_rate):
                r = ResamplerFir(
                    1, in_rate, out_rate, Latency.Sample64, Attenuation.Db90
                )
                outs = []
                for s in range(0, len(x), 2048):
                    outs.append(r.process(x[s : s + 2048]))
                return np.concatenate(outs)

            n_in = max(int(0.3 * in_hz), 16384)
            if out_hz > in_hz:
                stop = _stop_edge_hz(in_hz, out_hz, TAPS, FIR_BETA)
                db, ripple = _impulse_stopband(
                    process, in_hz, out_hz, n_in, stop
                )
                mode = "stop"
            else:
                f = _alias_tone_hz(in_hz, out_hz, TAPS, FIR_BETA)
                db = _alias_rejection(process, in_hz, out_hz, f, n_in)
                ripple, mode = float("nan"), "alias"
            rows.append((f"{in_hz}->{out_hz}", mode, db, ripple))
            if db < 90.0:
                failures.append(f"{in_hz}->{out_hz} {mode} {db:.1f} dB")
    _report("FIR full-matrix quality (gate >= 90 dB)", rows, failures)


@nightly
def test_fft_quality_matrix():
    rows, failures = [], []
    for in_rate in ALL_RATES:
        for out_rate in ALL_RATES:
            in_hz, out_hz = int(in_rate), int(out_rate)
            if in_hz == out_hz:
                continue
            r0 = ResamplerFft(1, in_rate, out_rate)
            ci = r0.chunk_size_input()
            taps = ci  # filter length = fft_size_input

            def process(x, in_rate=in_rate, out_rate=out_rate, ci=ci):
                r = ResamplerFft(1, in_rate, out_rate)
                x = x[: (len(x) // ci) * ci]
                return r.process(x)

            n_in = max(-(-int(0.3 * in_hz) // ci), 12) * ci
            if out_hz > in_hz:
                stop = _stop_edge_hz(in_hz, out_hz, taps, FFT_BETA)
                db, ripple = _impulse_stopband(
                    process, in_hz, out_hz, n_in, stop
                )
                mode = "stop"
            else:
                f = _alias_tone_hz(in_hz, out_hz, taps, FFT_BETA)
                db = _alias_rejection(process, in_hz, out_hz, f, n_in)
                ripple, mode = float("nan"), "alias"
            rows.append((f"{in_hz}->{out_hz}", mode, db, ripple))
            if db < 99.0:
                failures.append(f"{in_hz}->{out_hz} {mode} {db:.1f} dB")
    _report("FFT full-matrix quality (gate >= 99 dB)", rows, failures)
