"""Magnitude-split precision x S-split banded projector (round 2).

Combines the two measured-best structures:
- fft_split_probe.py: S static column-block matmuls over the banded T2
  operator (S=4 reached 8878 Msps at Precision.HIGH) — best banded
  lowering found in XLA (static slices feeding dense dots, no conv).
- fft_magsplit_device_probe.py: per-column-block, replace HIGH's three
  dense bf16 passes with ONE banded bf16 pass (the 9-period band holds
  everything above the f32 design floor) plus TWO narrow correction dots
  (xh@T2l_band + xl@T2h_band over w_p+bps-1 periods), quality measured
  >= HIGH's own device noise floor at w_p>=4.

MXU work per column group drops from 3*K_band to K_band + 2*K_corr
(~0.63-0.73x depending on S, w_p), with identical slicing structure.

Run: python experiments/fft_magsplit_sblock_probe.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from resampler_tpu.engine import fft as fft_engine
from experiments.fft_magsplit_device_probe import split_bf16

SCAN_LEN = 40
C = 2
N, M = 1176, 1280
g, Lp, Mp = 8, 147, 160
SPAN_P = 9  # full-band periods (beyond: < 1.2e-7 of max, f32 design floor)
B0 = {4: 3, 5: 2, 6: 2}


def t2_f64():
    T = fft_engine.spectral_projection_matrix(N, M).astype(np.float64)
    return np.vstack([T[:, M:], T[:, :M]])  # [2N, M]


def make_step(B, S, w_p):
    T2 = t2_f64()
    t2h = T2.astype(np.float32).astype(jnp.bfloat16)
    t2h_f64 = np.asarray(t2h, np.float64)
    t2l = (T2 - t2h_f64).astype(np.float32)
    b0 = B0[w_p]
    bps = g // S
    cols = M // S
    parts = []
    for q in range(S):
        r0 = q * bps * Lp
        rows = (bps - 1 + SPAN_P) * Lp
        wc = (w_p + bps - 1) * Lp
        rb = r0 + b0 * Lp
        Wh = jnp.asarray(
            np.ascontiguousarray(t2h[r0 : r0 + rows, q * cols : (q + 1) * cols]),
            jnp.bfloat16,
        )
        Wl_band = jnp.asarray(
            np.ascontiguousarray(t2l[rb : rb + wc, q * cols : (q + 1) * cols]),
            jnp.bfloat16,
        )
        Wh_band = jnp.asarray(
            np.ascontiguousarray(
                np.asarray(t2h, np.float32)[rb : rb + wc, q * cols : (q + 1) * cols]
            ),
            jnp.bfloat16,
        )
        parts.append((r0, rows, rb, wc, Wh, Wl_band, Wh_band))

    def step(state, chunks):
        x2 = jnp.concatenate([state["prev"], chunks], axis=2).reshape(
            B * C, 2 * N
        )
        xh, xl = split_bf16(x2)
        outs = []
        for r0, rows, rb, wc, Wh, Wl_band, Wh_band in parts:
            y = jnp.dot(
                jax.lax.slice_in_dim(xh, r0, r0 + rows, axis=1),
                Wh,
                preferred_element_type=jnp.float32,
            )
            y = y + jnp.dot(
                jax.lax.slice_in_dim(xh, rb, rb + wc, axis=1),
                Wl_band,
                preferred_element_type=jnp.float32,
            )
            y = y + jnp.dot(
                jax.lax.slice_in_dim(xl, rb, rb + wc, axis=1),
                Wh_band,
                preferred_element_type=jnp.float32,
            )
            outs.append(y)
        out = jnp.concatenate(outs, axis=1).reshape(B, C, M)
        return {"prev": chunks}, out

    return step


def quality(S, w_p):
    Bq = 32
    step = make_step(Bq, S, w_p)
    rng = np.random.default_rng(7)
    prev = rng.standard_normal((Bq, C, N)).astype(np.float32)
    cur = rng.standard_normal((Bq, C, N)).astype(np.float32)
    state, out = jax.jit(step)({"prev": jnp.asarray(prev)}, jnp.asarray(cur))
    T2 = t2_f64()
    x2 = np.concatenate([prev, cur], axis=2).reshape(Bq * C, 2 * N)
    ref = (x2.astype(np.float64) @ T2).reshape(Bq, C, M)
    err = np.asarray(out, np.float64) - ref
    return float(-20 * np.log10(np.sqrt((err**2).mean() / (ref**2).mean())))


def bench(B, S, w_p, dispatches=5, warmup=2):
    step = make_step(B, S, w_p)
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
    for S, w_p in [(4, 4), (4, 5), (8, 4), (2, 4)]:
        db = quality(S, w_p)
        print(f"S={S} w_p={w_p} noise floor: {db:6.1f} dB", flush=True)
    for S, w_p, B in [(4, 4, 8192), (4, 5, 8192), (8, 4, 8192),
                      (2, 4, 8192), (4, 4, 16384)]:
        msps = bench(B, S, w_p)
        print(f"S={S} w_p={w_p} B={B:6d}: {msps:8.1f} Msps "
              f"({msps/258.0:5.2f}x ref)", flush=True)


if __name__ == "__main__":
    main()
