"""Channelized-conv FFT backend vs dense projector matmul on the real TPU.

The conv form does (g+1)/(2g) = 0.5625x the FLOPs of the dense [N, 2M]
projector for 44.1<->48 kHz and halves HBM writes (no overlap tail).
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from resampler_tpu.engine import fft as fft_engine

SCAN_LEN = 40
C = 2


def bench(backend, B, dispatches=5, warmup=2):
    cfg = fft_engine.FftConfig(
        channels=C, fft_size_input=1176, fft_size_output=1280
    )
    step = fft_engine.make_fft_fleet_step(cfg, B, backend=backend)
    state = fft_engine.fft_fleet_init(cfg, B, backend)

    def fleet(state, chunks):
        def body(st, _):
            st, out = step(st, chunks)
            return st, jnp.max(jnp.abs(out))
        state, peaks = jax.lax.scan(body, state, None, length=SCAN_LEN)
        return state, jnp.max(peaks)

    fleet = jax.jit(fleet, donate_argnums=0)
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(
        rng.standard_normal((B, C, cfg.fft_size_input)), jnp.float32
    )
    for _ in range(warmup):
        state, peak = fleet(state, chunks)
    jax.block_until_ready(peak)
    t0 = time.perf_counter()
    for _ in range(dispatches):
        state, peak = fleet(state, chunks)
    jax.block_until_ready(peak)
    dt = time.perf_counter() - t0
    return dispatches * SCAN_LEN * B * C * cfg.fft_size_output / dt / 1e6


def main():
    print("backend:", jax.default_backend(), flush=True)
    for backend, B in [
        ("matmul", 8192),
        ("conv", 8192),
        ("conv", 4096),
        ("conv", 16384),
    ]:
        msps = bench(backend, B)
        print(f"{backend:7s} B={B:6d}: {msps:8.1f} Msps ({msps/258.0:5.2f}x ref)",
              flush=True)


if __name__ == "__main__":
    main()
