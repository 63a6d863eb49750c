"""Pallas bf16x3 matmul vs XLA Precision.HIGH on the FFT projector shape."""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from resampler_tpu.engine import fft as fft_engine
from resampler_tpu.ops.matmul3 import matmul3, split_hi_lo

SCAN_LEN = 40
C = 2
N_IN, M_OUT = 1176, 1280


def bench_step(step, state, chunks, dispatches=5, warmup=2):
    def fleet(state, chunks):
        def body(st, _):
            st, out = step(st, chunks)
            return st, jnp.max(jnp.abs(out))
        state, peaks = jax.lax.scan(body, state, None, length=SCAN_LEN)
        return state, jnp.max(peaks)

    fleet = jax.jit(fleet, donate_argnums=0)
    for _ in range(warmup):
        state, peak = fleet(state, chunks)
    jax.block_until_ready(peak)
    t0 = time.perf_counter()
    for _ in range(dispatches):
        state, peak = fleet(state, chunks)
    jax.block_until_ready(peak)
    dt = time.perf_counter() - t0
    B = chunks.shape[0]
    return dispatches * SCAN_LEN * B * C * M_OUT / dt / 1e6


def make_pallas_step(B, tile_m, tile_n):
    proj = jnp.asarray(fft_engine.get_projection_matrix(N_IN, M_OUT))
    p_hi, p_lo = split_hi_lo(proj)

    def step(state, chunks):
        x = chunks.reshape(B * C, N_IN)
        full = matmul3(
            x, p_hi, p_lo, tile_m=tile_m, tile_n=tile_n
        ).reshape(B, C, 2 * M_OUT)
        out = full[:, :, :M_OUT] + state["overlap"]
        return {"overlap": full[:, :, M_OUT:]}, out

    return step


def main():
    print("backend:", jax.default_backend(), flush=True)
    B = 8192
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.standard_normal((B, C, N_IN)), jnp.float32)

    # correctness on device vs f64 host
    small = jnp.asarray(rng.standard_normal((256, N_IN)), jnp.float32)
    proj = jnp.asarray(fft_engine.get_projection_matrix(N_IN, M_OUT))
    p_hi, p_lo = split_hi_lo(proj)
    got = np.asarray(matmul3(small, p_hi, p_lo, tile_m=256, tile_n=512))
    ref = np.asarray(small, np.float64) @ np.asarray(proj, np.float64)
    print("device matmul3 err:", float(np.abs(got - ref).max()), flush=True)

    cfg = fft_engine.FftConfig(channels=C, fft_size_input=N_IN,
                               fft_size_output=M_OUT)
    xla = fft_engine.make_fft_fleet_step(cfg, B)
    msps = bench_step(xla, fft_engine.fft_fleet_init(cfg, B), chunks)
    print(f"xla-HIGH          : {msps:8.1f} Msps ({msps/258.0:5.2f}x)", flush=True)

    for tm, tn in [(512, 512), (256, 512), (1024, 512), (512, 2560), (2048, 512)]:
        step = make_pallas_step(B, tm, tn)
        state = {"overlap": jnp.zeros((B, C, M_OUT), jnp.float32)}
        try:
            msps = bench_step(step, state, chunks)
            print(f"pallas tm={tm:4d} tn={tn:4d}: {msps:8.1f} Msps "
                  f"({msps/258.0:5.2f}x)", flush=True)
        except Exception as e:
            print(f"pallas tm={tm} tn={tn}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
