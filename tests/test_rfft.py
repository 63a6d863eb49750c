"""Real-valued mixed-radix FFT tests (dsp/rfft.py) — the device-runnable
RadixFFT analog.  Mirrors the reference's FFT property-test strategy
(reference: src/fft/radix_fft.rs:715-1511): numpy as the oracle, impulse /
sine / linearity / Parseval / round-trip, across many factor mixes."""

import numpy as np
import pytest

from resampler_tpu.dsp.rfft import RealFft, fft_factors, irfft_pair, rfft_pair

SIZES = [8, 12, 16, 20, 28, 56, 64, 100, 192, 384, 588, 640, 882, 1176, 1280, 2352]


def test_factorization():
    assert fft_factors(8) == (8,)
    assert fft_factors(16) == (8, 2)
    assert fft_factors(588) == (7, 7, 4, 3)
    assert fft_factors(441) == (7, 7, 3, 3)
    with pytest.raises(ValueError):
        fft_factors(22)  # factor 11 unsupported


@pytest.mark.parametrize("n", SIZES)
def test_forward_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((3, n)).astype(np.float32)
    re, im = rfft_pair(x, n)
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    tol = 2e-5 * np.sqrt(n)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=tol)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=tol)


@pytest.mark.parametrize("n", SIZES)
def test_unnormalized_roundtrip(n):
    """irfft(rfft(x)) == n * x — the reference's unnormalized convention
    (reference: src/fft/radix_fft.rs:58-71)."""
    rng = np.random.default_rng(n + 1)
    x = rng.standard_normal((2, n)).astype(np.float32)
    re, im = rfft_pair(x, n)
    y = np.asarray(irfft_pair(re, im, n))
    np.testing.assert_allclose(y, n * x, atol=2e-4 * n)


def test_impulse_and_dc():
    n = 588
    x = np.zeros((1, n), np.float32)
    x[0, 0] = 1.0
    re, im = rfft_pair(x, n)
    np.testing.assert_allclose(np.asarray(re), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(im), 0.0, atol=1e-5)
    dc = np.full((1, n), 0.5, np.float32)
    re, im = rfft_pair(dc, n)
    assert np.asarray(re)[0, 0] == pytest.approx(0.5 * n, rel=1e-6)
    assert np.abs(np.asarray(re)[0, 1:]).max() < 1e-3


def test_sine_bin():
    n = 640
    k = 17
    t = np.arange(n)
    x = np.sin(2 * np.pi * k * t / n).astype(np.float32)[None]
    re, im = rfft_pair(x, n)
    assert np.asarray(im)[0, k] == pytest.approx(-n / 2, rel=1e-5)
    masked = np.abs(np.asarray(re)) + np.abs(np.asarray(im))
    masked[0, k] = 0
    assert masked.max() < 2e-2


def test_linearity_and_parseval():
    n = 1176
    rng = np.random.default_rng(2)
    a = rng.standard_normal((1, n)).astype(np.float32)
    b = rng.standard_normal((1, n)).astype(np.float32)
    ra, ia = rfft_pair(a, n)
    rb, ib = rfft_pair(b, n)
    rab, iab = rfft_pair(a + 2 * b, n)
    np.testing.assert_allclose(np.asarray(rab), np.asarray(ra + 2 * rb), atol=1e-3)
    np.testing.assert_allclose(np.asarray(iab), np.asarray(ia + 2 * ib), atol=1e-3)
    # Parseval (rfft half-spectrum accounting)
    spec = np.asarray(ra) + 1j * np.asarray(ia)
    e_spec = (
        np.abs(spec[0, 0]) ** 2
        + 2 * np.sum(np.abs(spec[0, 1:-1]) ** 2)
        + np.abs(spec[0, -1]) ** 2
    ) / n
    np.testing.assert_allclose(e_spec, np.sum(a**2), rtol=1e-4)


def test_realfft_wrapper_and_errors():
    f = RealFft(1176)
    assert "7" in repr(f)
    x = np.zeros((1, 1176), np.float32)
    re, im = f.process(x)
    y = f.process_inverse(re, im)
    assert np.asarray(y).shape == (1, 1176)
    with pytest.raises(ValueError):
        RealFft(9)  # odd
    with pytest.raises(ValueError):
        RealFft(44)  # 22 = 2*11 after the N/2 trick


def test_engine_rfft_backend_matches_matmul():
    """backend="rfft" (device-runnable runtime FFT) equals the projector
    across chunks — the escape hatch for very large custom sizes."""
    from resampler_tpu.engine import fft as fft_engine

    cfg = fft_engine.FftConfig(
        channels=2, fft_size_input=588, fft_size_output=640
    )
    sa = fft_engine.make_fft_step(cfg, backend="matmul")
    sb = fft_engine.make_fft_step(cfg, backend="rfft")
    stm = fft_engine.fft_init(cfg, "matmul")
    str_ = fft_engine.fft_init(cfg, "rfft")
    rng = np.random.default_rng(3)
    import jax.numpy as jnp

    for _ in range(3):
        x = jnp.asarray(rng.standard_normal((2, 588)), jnp.float32)
        stm, a = sa(stm, x)
        str_, b = sb(str_, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
