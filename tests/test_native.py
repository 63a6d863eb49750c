"""Native host runtime tests: build the C++ library and differentially test
it against the pure-python implementations (the same scalar-vs-fast pattern
as the reference's SIMD tests, SURVEY.md §4.3)."""

import threading

import numpy as np
import pytest

from resampler_tpu.utils import native
from resampler_tpu.utils.wav import read_wav, write_wav


@pytest.fixture(scope="module")
def lib():
    if not native.is_available():
        if not native.build():
            pytest.skip("native toolchain unavailable")
        native._lib = None  # force reload after build
    lib = native.load()
    if lib is None:
        pytest.skip("native library failed to load")
    return lib


def test_abi_version(lib):
    assert lib.rtpu_abi_version() == 1


def test_wav_native_matches_python(lib, tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(2 * 777) * 0.5).astype(np.float32)
    path = tmp_path / "x.wav"
    write_wav(path, x, 48000, 2)

    samples, rate, channels, bits, fmt = native.wav_read_native(path)
    py_samples, info = read_wav(path)
    assert (rate, channels, bits) == (48000, 2, 32)
    np.testing.assert_array_equal(samples, py_samples)


def test_wav_native_write_roundtrip(lib, tmp_path):
    x = np.linspace(-1, 1, 500).astype(np.float32)
    path = tmp_path / "y.wav"
    native.wav_write_native(path, x, 44100, 1)
    y, info = read_wav(path)
    assert info.sample_rate == 44100
    np.testing.assert_array_equal(x, y)


def test_wav_native_pcm24(lib, tmp_path):
    """Native 24-bit decode matches the python decoder bit-for-bit."""
    import struct

    rng = np.random.default_rng(7)
    ints = rng.integers(-(1 << 23), 1 << 23, size=512, dtype=np.int32)
    b = np.zeros((512, 3), np.uint8)
    b[:, 0] = ints & 0xFF
    b[:, 1] = (ints >> 8) & 0xFF
    b[:, 2] = (ints >> 16) & 0xFF
    data = b.tobytes()
    path = tmp_path / "p24.wav"
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 48000,
                                      48000 * 6, 6, 24))
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    samples, rate, channels, bits, fmt = native.wav_read_native(path)
    py_samples, _ = read_wav(path)
    assert bits == 24
    np.testing.assert_array_equal(samples, py_samples)


def test_native_rejects_garbage(lib, tmp_path):
    path = tmp_path / "junk.wav"
    path.write_bytes(b"this is not audio")
    with pytest.raises(ValueError):
        native.wav_read_native(path)


def test_interleave_roundtrip(lib):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(8 * 123).astype(np.float32)
    planar = native.deinterleave(x, 8)
    assert planar.shape == (8, 123)
    np.testing.assert_array_equal(planar, x.reshape(123, 8).T)
    np.testing.assert_array_equal(native.interleave(planar), x)


def test_stream_pool_native(lib):
    pool = native.HostStreamPool(4, 2, capacity_frames=1024)
    assert pool._pool is not None  # really native
    rng = np.random.default_rng(2)
    data = [rng.standard_normal(2 * n).astype(np.float32)
            for n in (100, 1024, 3, 0)]
    for s, d in enumerate(data):
        accepted = pool.push(s, d)
        assert accepted == min(d.size, 1024 * 2)
    assert pool.pending(0) == 200
    batch, n_valid = pool.fill(256)
    assert batch.shape == (4, 256, 2)
    assert list(n_valid) == [100, 256, 3, 0]
    np.testing.assert_array_equal(
        batch[0, :100].reshape(-1), data[0]
    )
    np.testing.assert_array_equal(batch[0, 100:], 0.0)
    # second fill drains the rest of stream 1
    batch, n_valid = pool.fill(1024)
    assert list(n_valid) == [0, 1024 - 256, 0, 0]


def test_stream_pool_python_fallback():
    pool = native.HostStreamPool.__new__(native.HostStreamPool)
    pool.n_streams, pool.channels, pool.capacity_frames = 2, 2, 64
    pool._lib = None
    pool._pool = None
    pool._queues = [np.zeros(0, np.float32) for _ in range(2)]
    pool._lock = threading.Lock()
    x = np.arange(2 * 50, dtype=np.float32)
    assert pool.push(0, x) == 100
    batch, n_valid = pool.fill(32)
    assert list(n_valid) == [32, 0]
    np.testing.assert_array_equal(batch[0].reshape(-1), x[:64])
    batch, n_valid = pool.fill(32)
    assert list(n_valid) == [18, 0]


def test_pool_concurrent_pushes(lib):
    """Thread-safety of the native pool: concurrent producers."""
    pool = native.HostStreamPool(8, 2, capacity_frames=1 << 16)

    def producer(s):
        for _ in range(50):
            pool.push(s, np.full(2 * 64, float(s + 1), np.float32))

    threads = [threading.Thread(target=producer, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for s in range(8):
        assert pool.pending(s) == 50 * 2 * 64
    batch, n_valid = pool.fill(50 * 64)
    assert list(n_valid) == [50 * 64] * 8
    for s in range(8):
        np.testing.assert_array_equal(batch[s].reshape(-1), float(s + 1))
