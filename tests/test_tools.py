"""Tools-layer tests: WAV codec, CLI end-to-end, interpolation comparators,
quality harness (reference: resample/src/main.rs, test_audio_resampler.py)."""

import subprocess
import sys

import numpy as np
import pytest

from resampler_tpu.tools.interpolation import (
    InterpolationMode,
    InterpolationResampler,
)
from resampler_tpu.tools.quality import (
    analyze_impulse_response,
    generate_impulse,
    generate_log_sweep,
    run_quality_check,
)
from resampler_tpu.utils.wav import read_wav, write_wav


def test_wav_roundtrip_float(tmp_path):
    path = tmp_path / "x.wav"
    x = np.linspace(-1, 1, 1000).astype(np.float32)
    write_wav(path, x, 48000, 2)
    y, info = read_wav(path)
    assert (info.sample_rate, info.channels, info.bits_per_sample) == (
        48000, 2, 32,
    )
    assert info.sample_format == "float"
    np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("bits,dtype", [(16, "<i2"), (32, "<i4")])
def test_wav_read_pcm(tmp_path, bits, dtype):
    import struct

    path = tmp_path / "pcm.wav"
    n, rate, channels = 64, 44100, 1
    ints = (np.arange(n) - n // 2).astype(dtype)
    data = ints.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, channels, rate,
            rate * channels * bits // 8, channels * bits // 8, bits))
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    y, info = read_wav(path)
    assert info.bits_per_sample == bits
    np.testing.assert_allclose(
        y, ints.astype(np.float64) / (1 << (bits - 1)), atol=1e-7
    )


def test_interpolation_linear_exact_on_ramp():
    r = InterpolationResampler(1, 48000, 96000, InterpolationMode.LINEAR)
    x = np.arange(100, dtype=np.float32)
    y = r.resample(x)
    assert y.size == 200
    # linear interpolation of a ramp is the half-step ramp
    np.testing.assert_allclose(y[:197], np.arange(197) * 0.5, atol=1e-5)


def test_interpolation_hermite_preserves_sine():
    r = InterpolationResampler(1, 48000, 44100, InterpolationMode.HERMITE)
    t = np.arange(4800) / 48000
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    y = r.resample(x)
    assert abs(y.size - 4410) <= 1
    assert np.abs(y[100:-100]).max() == pytest.approx(0.5, abs=0.01)


def test_quality_harness_fft():
    report = run_quality_check(22050, 48000, "fft", impulse_duration=1.0)
    assert report.stopband_attenuation_db >= 99.0
    assert report.passband_ripple_db < 1.0


def test_quality_harness_fir():
    report = run_quality_check(22050, 48000, "fir", latency=64,
                               attenuation=90, impulse_duration=1.0)
    assert report.stopband_attenuation_db >= 90.0


def test_quality_harness_linear_is_worse():
    """Comparators exist to show the gap: linear interpolation's stopband
    is far worse than the FIR/FFT engines."""
    report = run_quality_check(22050, 48000, "linear", impulse_duration=1.0)
    assert report.stopband_attenuation_db < 60.0


def test_sweep_generator_band_limits():
    sweep = generate_log_sweep(48000, duration=1.0)
    assert sweep.size == 48000
    assert np.abs(sweep).max() <= 0.801


def test_cli_end_to_end(tmp_path):
    """Full CLI flow: synth WAV in -> resampled WAV out, all filters."""
    in_path, out_path = tmp_path / "in.wav", tmp_path / "out.wav"
    t = np.arange(22050) / 44100
    tone = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    write_wav(in_path, tone, 44100, 1)

    for filt in ["fft", "fir", "linear", "hermite"]:
        proc = subprocess.run(
            [
                sys.executable, "-m", "resampler_tpu.tools.cli",
                "--filter", filt, "--sample-rate", "48000",
                str(in_path), str(out_path),
            ],
            capture_output=True, text=True,
            env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
            cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr
        assert "Done!" in proc.stdout
        y, info = read_wav(out_path)
        assert info.sample_rate == 48000
        assert info.channels == 2
        frames = y.reshape(-1, 2)
        # mono duplicated to stereo; tone amplitude preserved
        np.testing.assert_allclose(frames[:, 0], frames[:, 1], atol=1e-6)
        peak = np.abs(frames[2000:-2000, 0]).max()
        assert peak == pytest.approx(0.5, abs=0.02), filt


def test_cli_invalid_args(tmp_path):
    in_path = tmp_path / "in.wav"
    write_wav(in_path, np.zeros(128, np.float32), 44100, 1)
    proc = subprocess.run(
        [
            sys.executable, "-m", "resampler_tpu.tools.cli",
            "--filter", "fir", "--sample-rate", "48000", "--latency", "7",
            str(in_path), str(tmp_path / "out.wav"),
        ],
        capture_output=True, text=True,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
        cwd="/root/repo",
    )
    assert proc.returncode == 1
    assert "Invalid latency" in proc.stderr

    proc = subprocess.run(
        [
            sys.executable, "-m", "resampler_tpu.tools.cli",
            "--filter", "fft", "--sample-rate", "12345",
            str(in_path), str(tmp_path / "out.wav"),
        ],
        capture_output=True, text=True,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
        cwd="/root/repo",
    )
    assert proc.returncode == 1
    assert "Unsupported sample rate" in proc.stderr


def test_profiling_timed():
    from resampler_tpu.utils.profiling import timed

    with timed("x") as t:
        sum(range(10000))
    assert t.seconds > 0
    assert t.mibps(1 << 20) > 0
