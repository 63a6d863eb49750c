"""Banded projector as S static column-block matmuls (round 2).

The input-domain operator T2 [2N, M] is banded with slope L'/M'; splitting
the output columns into S blocks lets each block read only its
(g/S + g)*L' input rows -> FLOP ratio (1 + 1/S)/2 of dense, all dense
MXU matmuls with static slices (no conv lowering, no gathers).
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
N, M = 1176, 1280
g, Lp, Mp = 8, 147, 160


def make_split_step(B, S):
    T = fft_engine.spectral_projection_matrix(N, M).astype(np.float64)
    T2 = np.vstack([T[:, M:], T[:, :M]])  # [2N, M]
    span = (g + 1) * Lp
    blocks_per_split = g // S
    cols = M // S
    parts = []
    for q in range(S):
        r0 = q * blocks_per_split * Lp
        rows = (blocks_per_split - 1) * Lp + span
        W = np.ascontiguousarray(
            T2[r0 : r0 + rows, q * cols : (q + 1) * cols], np.float32
        )
        parts.append((r0, rows, jnp.asarray(W)))

    def step(state, chunks):
        x2 = jnp.concatenate([state["prev"], chunks], axis=2).reshape(
            B * C, 2 * N
        )
        outs = []
        for r0, rows, W in parts:
            outs.append(
                jnp.dot(
                    jax.lax.slice_in_dim(x2, r0, r0 + rows, axis=1),
                    W,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGH,
                )
            )
        out = jnp.concatenate(outs, axis=1).reshape(B, C, M)
        return {"prev": chunks}, out

    return step


def bench(B, S, dispatches=5, warmup=2):
    step = make_split_step(B, S)
    state = {"prev": jnp.zeros((B, C, N), jnp.float32)}

    def fleet(state, chunks):
        def body(st, _):
            st, out = step(st, chunks)
            return st, jnp.max(jnp.abs(out))
        state, peaks = jax.lax.scan(body, state, None, length=SCAN_LEN)
        return state, jnp.max(peaks)

    fleet = jax.jit(fleet, donate_argnums=0)
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.standard_normal((B, C, N)), jnp.float32)
    for _ in range(warmup):
        state, peak = fleet(state, chunks)
    jax.block_until_ready(peak)
    t0 = time.perf_counter()
    for _ in range(dispatches):
        state, peak = fleet(state, chunks)
    jax.block_until_ready(peak)
    dt = time.perf_counter() - t0
    return dispatches * SCAN_LEN * B * C * M / dt / 1e6


def main():
    print("backend:", jax.default_backend(), flush=True)
    # correctness spot-check vs dense projector (CPU-cheap, on device)
    B = 2
    step = make_split_step(B, 4)
    dense = fft_engine.make_fft_fleet_step(
        fft_engine.FftConfig(channels=C, fft_size_input=N, fft_size_output=M),
        B,
    )
    rng = np.random.default_rng(1)
    sa = {"prev": jnp.zeros((B, C, N), jnp.float32)}
    sb = fft_engine.fft_fleet_init(
        fft_engine.FftConfig(channels=C, fft_size_input=N, fft_size_output=M),
        B,
    )
    for _ in range(3):
        x = jnp.asarray(rng.standard_normal((B, C, N)), jnp.float32)
        sa, a = step(sa, x)
        sb, b = dense(sb, x)
    print("split-vs-dense max diff:",
          float(jnp.abs(a - b).max()), flush=True)

    for S, B in [(2, 8192), (4, 8192), (8, 8192), (4, 16384)]:
        msps = bench(B, S)
        print(f"S={S} B={B:6d}: {msps:8.1f} Msps ({msps/258.0:5.2f}x ref)",
              flush=True)


if __name__ == "__main__":
    main()
