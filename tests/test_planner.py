"""Planner table tests (reference: src/fft/planner.rs:248-443)."""

import pytest

from resampler_tpu.dsp import plan_conversion
from resampler_tpu.types import SampleRate, SampleRateFamily


@pytest.mark.parametrize(
    "in_rate,out_rate,size_in,size_out",
    [
        (SampleRate.Hz48000, SampleRate.Hz96000, 2, 4),
        (SampleRate.Hz48000, SampleRate.Hz192000, 2, 8),
        (SampleRate.Hz22050, SampleRate.Hz48000, 588, 1280),
        (SampleRate.Hz16000, SampleRate.Hz48000, 64, 192),
        (SampleRate.Hz16000, SampleRate.Hz44100, 640, 1764),
        (SampleRate.Hz44100, SampleRate.Hz48000, 1176, 1280),
        (SampleRate.Hz44100, SampleRate.Hz96000, 1176, 2560),
        (SampleRate.Hz48000, SampleRate.Hz44100, 1280, 1176),
    ],
)
def test_plan_base_sizes(in_rate, out_rate, size_in, size_out):
    cfg = plan_conversion(in_rate, out_rate)
    assert cfg.fft_size_input == size_in
    assert cfg.fft_size_output == size_out


def test_exact_ratio():
    # 0% ratio error: size_out/size_in == out_rate/in_rate for every pair.
    for in_rate in SampleRate:
        for out_rate in SampleRate:
            cfg = plan_conversion(in_rate, out_rate).scale_for_throughput()
            assert (
                cfg.fft_size_output * int(in_rate)
                == cfg.fft_size_input * int(out_rate)
            ), (in_rate, out_rate, cfg)


def test_scale_for_throughput():
    # 588 >= 512 so no scaling (reference: src/fft/planner.rs:397-442)
    cfg = plan_conversion(SampleRate.Hz22050, SampleRate.Hz48000)
    scaled = cfg.scale_for_throughput()
    assert (scaled.fft_size_input, scaled.fft_size_output) == (588, 1280)
    # Same-family base 2 -> scaled by 256 to reach 512.
    cfg = plan_conversion(SampleRate.Hz48000, SampleRate.Hz96000)
    scaled = cfg.scale_for_throughput()
    assert (scaled.fft_size_input, scaled.fft_size_output) == (512, 1024)
    # 192 -> x4 = 768
    cfg = plan_conversion(SampleRate.Hz48000, SampleRate.Hz16000)
    scaled = cfg.scale_for_throughput()
    assert (scaled.fft_size_input, scaled.fft_size_output) == (768, 256)


def test_families():
    assert SampleRate.Hz32000.family is SampleRateFamily.Hz16000
    assert SampleRate.Hz384000.family is SampleRateFamily.Hz48000
    assert SampleRate.Hz176400.family is SampleRateFamily.Hz22050
    assert SampleRate.Hz176400.family_multiplier == 8
    assert SampleRate.Hz384000.family_multiplier == 8
    assert SampleRate.Hz32000.family_multiplier == 2
