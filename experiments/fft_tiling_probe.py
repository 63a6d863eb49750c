"""FFT projector matmul tiling probe (round 2, VERDICT item 3).

Measures variants of the [B*C, N] @ [N, 2M] projection matmul on the real
TPU to find the ≥50x configuration:
  - baseline (N=1176 contraction dim, B=8192)
  - K padded to 1280 (tile-aligned contraction)
  - batch sweep
  - split output columns into two 1280 blocks

Throughput is reported as output Msamples/s using the same accounting as
bench.py (B*C*M samples per step, SCAN_LEN steps per dispatch).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from resampler_tpu.engine import fft as fft_engine

SCAN_LEN = 40
N_IN, N_OUT = 1176, 1280


def bench(step_fn, state, chunks, dispatches=5, warmup=2):
    def fleet(state, chunks):
        def body(st, _):
            st, out = step_fn(st, chunks)
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
    return dispatches * SCAN_LEN / dt


def make_variant(kind, B, C=2):
    proj_np = fft_engine.get_projection_matrix(N_IN, N_OUT)  # [1176, 2560]

    if kind == "baseline":
        proj = jnp.asarray(proj_np)
        K = N_IN
    elif kind == "kpad":
        padded = np.zeros((1280, 2 * N_OUT), np.float32)
        padded[:N_IN] = proj_np
        proj = jnp.asarray(padded)
        K = 1280
    elif kind == "colsplit":
        proj = jnp.asarray(proj_np)
        K = N_IN
    else:
        raise ValueError(kind)

    def step(state, chunks):  # chunks [B, C, K]
        x = chunks.reshape(B * C, K)
        if kind == "colsplit":
            a = jnp.dot(x, proj[:, :N_OUT],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)
            b = jnp.dot(x, proj[:, N_OUT:],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)
            full = jnp.concatenate([a, b], axis=1).reshape(B, C, 2 * N_OUT)
        else:
            full = jnp.dot(x, proj,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGH
                           ).reshape(B, C, 2 * N_OUT)
        out = full[:, :, :N_OUT] + state["overlap"]
        return {"overlap": full[:, :, N_OUT:]}, out

    state = {"overlap": jnp.zeros((B, C, N_OUT), jnp.float32)}
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.standard_normal((B, C, K)), jnp.float32)
    return step, state, chunks


def main():
    C = 2
    results = {}
    for kind, B in [
        ("baseline", 8192),
        ("kpad", 8192),
        ("colsplit", 8192),
        ("baseline", 4096),
        ("baseline", 16384),
        ("kpad", 16384),
    ]:
        step, state, chunks = make_variant(kind, B, C)
        steps_per_s = bench(step, state, chunks)
        msps = steps_per_s * B * C * N_OUT / 1e6
        results[f"{kind}-B{B}"] = msps
        print(f"{kind:10s} B={B:6d}: {msps:8.1f} Msps  "
              f"({msps/258.0:5.2f}x ref)", flush=True)
    best = max(results, key=results.get)
    print("BEST:", best, f"{results[best]:.1f} Msps")


if __name__ == "__main__":
    main()
