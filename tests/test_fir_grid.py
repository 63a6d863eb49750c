"""Latency x Attenuation grid on the 48 -> 44.1 kHz downsample
(BASELINE.md config 3).

Measures *alias rejection*: a 23 kHz tone sits above the output Nyquist
(22.05 kHz), so everything surviving in the output is aliasing leaked past
the anti-aliasing filter.  Thresholds are measured values minus ~3 dB
margin; the trends are the physics of Kaiser design (reference:
src/resampler_fir.rs:101-110 quotes ~-60/-90/-120 dB "around" figures):

- more taps -> narrower transition -> leak approaches the design
  attenuation;
- at 16 taps the transition band is wider than the measurement band, so a
  higher beta (narrower stopband requirement) actually leaks MORE — the
  expected short-filter inversion.
"""

import numpy as np
import pytest

from resampler_tpu import Attenuation, Latency, ResamplerFir

#: (latency, attenuation) -> minimum alias rejection in dB (measured - margin)
THRESHOLDS = {
    (Latency.Sample8, Attenuation.Db60): 62,
    (Latency.Sample8, Attenuation.Db90): 46,
    (Latency.Sample8, Attenuation.Db120): 34,
    (Latency.Sample16, Attenuation.Db60): 75,
    (Latency.Sample16, Attenuation.Db90): 97,
    (Latency.Sample16, Attenuation.Db120): 119,
    (Latency.Sample32, Attenuation.Db60): 80,
    (Latency.Sample32, Attenuation.Db90): 95,
    (Latency.Sample32, Attenuation.Db120): 120,
    (Latency.Sample64, Attenuation.Db60): 71,
    (Latency.Sample64, Attenuation.Db90): 105,
    (Latency.Sample64, Attenuation.Db120): 121,
}


def alias_rejection_db(latency, attenuation, in_hz=48000, out_hz=44100):
    n = in_hz
    t = np.arange(n) / in_hz
    x = (0.5 * np.sin(2 * np.pi * 23000 * t)).astype(np.float32)
    r = ResamplerFir(1, in_hz, out_hz, latency, attenuation)
    y = r.process(x)
    seg = y[2000:-2000]
    return -20 * np.log10(np.abs(seg).max() / 0.5 + 1e-12)


@pytest.mark.parametrize("latency", list(Latency))
@pytest.mark.parametrize("attenuation", list(Attenuation))
def test_alias_rejection_grid(latency, attenuation):
    got = alias_rejection_db(latency, attenuation)
    need = THRESHOLDS[(latency, attenuation)]
    assert got >= need, (
        f"{latency.name}/{attenuation.name}: alias rejection {got:.1f} dB "
        f"< required {need} dB"
    )


def test_grid_design_trend():
    """At practical lengths (>=32 taps), stronger Attenuation settings give
    strictly better alias rejection."""
    for latency in (Latency.Sample16, Latency.Sample32, Latency.Sample64):
        r60 = alias_rejection_db(latency, Attenuation.Db60)
        r90 = alias_rejection_db(latency, Attenuation.Db90)
        r120 = alias_rejection_db(latency, Attenuation.Db120)
        assert r60 < r90 < r120, (latency, r60, r90, r120)
