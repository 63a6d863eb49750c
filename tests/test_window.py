"""Golden-value tests for the filter-design layer.

The numeric anchors are scipy/numpy reference values, the same oracle the
reference crate tests against (reference: src/window.rs:133-410).
"""

import numpy as np
import pytest
import scipy.signal
import scipy.special

from resampler_tpu.dsp import (
    WindowType,
    bessel_i0,
    calculate_cutoff_kaiser,
    make_kaiser_window,
    make_sincs_for_kaiser,
)


def test_bessel_i0_known_values():
    # scipy.special.i0 reference values (reference: src/window.rs:152-160)
    for x, expected in [
        (0.0, 1.000000000000000),
        (1.0, 1.266065877752008),
        (2.0, 2.279585302336067),
        (5.0, 27.239871823604442),
        (10.0, 2815.716628466254),
        (13.0, 49444.489582217575),
    ]:
        assert bessel_i0(x) == pytest.approx(expected, rel=1e-12)


def test_bessel_i0_matches_scipy_vectorized():
    x = np.linspace(0.0, 13.0, 257)
    np.testing.assert_allclose(bessel_i0(x), scipy.special.i0(x), rtol=1e-12)


@pytest.mark.parametrize(
    "n,beta,sym",
    [(5, 0.5, False), (15, 5.0, False), (9, 10.0, False),
     (5, 0.5, True), (15, 5.0, True), (9, 10.0, True),
     (128, 10.0, True), (1024, 13.0, False), (2352, 10.0, False)],
)
def test_kaiser_window_matches_scipy(n, beta, sym):
    wt = WindowType.SYMMETRIC if sym else WindowType.PERIODIC
    ours = make_kaiser_window(n, beta, wt)
    theirs = scipy.signal.windows.kaiser(n, beta, sym=sym)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-14)


def test_kaiser_window_golden_periodic_beta10():
    # scipy.signal.windows.kaiser(9, 10.0, sym=False)
    # (reference: src/window.rs:209-228)
    expected = [
        0.000355149374724, 0.030999213508099, 0.203914483842615,
        0.581810162428082, 0.942963979134466, 0.942963979134466,
        0.581810162428082, 0.203914483842615, 0.030999213508099,
    ]
    np.testing.assert_allclose(
        make_kaiser_window(9, 10.0, WindowType.PERIODIC), expected, rtol=1e-5
    )


def test_calculate_cutoff_kaiser_various_sizes():
    # (reference: src/window.rs:231-237)
    for n, expected in [
        (64, 0.8999482371370552),
        (128, 0.9499741185685276),
        (256, 0.9749870592842638),
        (512, 0.9874935296421319),
        (1024, 0.9937467648210659),
    ]:
        assert calculate_cutoff_kaiser(n, 10.0) == pytest.approx(expected, rel=1e-6)


def test_calculate_cutoff_kaiser_valid_range():
    for size in [16, 32, 64, 128, 256, 512, 1024, 2048]:
        c = calculate_cutoff_kaiser(size, 10.0)
        assert 0.0 < c <= 1.0
    # Tiny filters clamp at the 0.7 floor.
    assert calculate_cutoff_kaiser(16, 13.0) == pytest.approx(0.7)


def test_make_sincs_dimensions():
    table = make_sincs_for_kaiser(4, 2, 0.9, 10.0, WindowType.PERIODIC)
    assert table.shape == (2, 4)
    assert table.dtype == np.float32


def test_make_sincs_reference_values_periodic():
    # (reference: src/window.rs:274-294)
    table = make_sincs_for_kaiser(4, 2, 0.9, 10.0, WindowType.PERIODIC)
    expected = np.array(
        [
            [-0.0084796025, 0.4976338439, 0.4976338439, -0.0084796025],
            [-0.0000355271, 0.0296676259, 0.9623917926, 0.0296676259],
        ]
    )
    np.testing.assert_allclose(table, expected, rtol=1e-4, atol=1e-7)


def test_make_sincs_reference_values_symmetric():
    # (reference: src/window.rs:364-385)
    table = make_sincs_for_kaiser(4, 2, 0.9, 10.0, WindowType.SYMMETRIC)
    expected = np.array(
        [
            [-0.0135119673, 0.6818196469, 0.3016755841, -0.0000802533],
            [-0.0000397065, 0.0471924586, 0.9759149497, 0.0070292878],
        ]
    )
    np.testing.assert_allclose(table, expected, rtol=1e-4, atol=1e-7)


def test_make_sincs_normalization():
    # Each polyphase branch sums to ~1 (reference: src/window.rs:387-410)
    table = make_sincs_for_kaiser(8, 4, 0.95, 10.0, WindowType.PERIODIC)
    assert table.sum() == pytest.approx(4.0, abs=0.01)
    table = make_sincs_for_kaiser(128, 1024, 0.95, 10.0, WindowType.SYMMETRIC)
    np.testing.assert_allclose(table.sum(axis=1), 1.0, atol=2e-3)
