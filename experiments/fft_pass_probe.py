"""Where do Precision.HIGH's 3 passes lose time? (round 2)

Variants on the [16384, 1176] @ [1176, 2560] projector matmul:
  - high:      jnp.dot precision=HIGH (current production, 3 passes)
  - default:   single bf16 pass (quality-invalid; raw MXU ceiling probe)
  - manual3:   x split hi/lo bf16 once; T split at trace time; three
               explicit bf16 dots: hi@Thi + hi@Tlo + lo@Thi
  - stacked3:  same three products as ONE dot with K stacked to 3*1176
  - stacked3p: stacked3 with K padded 3528 -> 3584 (28 exact 128-tiles)
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


def split_hi_lo(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def make_step(kind, B):
    proj = fft_engine.get_projection_matrix(N, M)
    pj = jnp.asarray(proj)
    p_hi, p_lo = split_hi_lo(pj)
    if kind.startswith("stacked3"):
        K = 3 * N if kind == "stacked3" else 3584
        stacked = jnp.zeros((K, 2 * M), jnp.bfloat16)
        stacked = stacked.at[:N].set(p_hi).at[N : 2 * N].set(p_lo)
        stacked = stacked.at[2 * N : 3 * N].set(p_hi)

    def step(state, chunks):
        x = chunks.reshape(B * C, N)
        if kind == "high":
            full = jnp.dot(x, pj, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGH)
        elif kind == "default":
            full = jnp.dot(x, pj, preferred_element_type=jnp.float32)
        elif kind == "manual3":
            x_hi, x_lo = split_hi_lo(x)
            full = (
                jnp.dot(x_hi, p_hi, preferred_element_type=jnp.float32)
                + jnp.dot(x_hi, p_lo, preferred_element_type=jnp.float32)
                + jnp.dot(x_lo, p_hi, preferred_element_type=jnp.float32)
            )
        else:  # stacked3 / stacked3p
            x_hi, x_lo = split_hi_lo(x)
            xs = jnp.concatenate([x_hi, x_lo, x_hi], axis=1)
            if kind == "stacked3p":
                xs = jnp.pad(xs, ((0, 0), (0, 3584 - 3 * N)))
            full = jnp.dot(xs, stacked, preferred_element_type=jnp.float32)
        full = full.reshape(B, C, 2 * M)
        out = full[:, :, :M] + state["overlap"]
        return {"overlap": full[:, :, M:]}, out

    return step


def bench(kind, B, dispatches=5, warmup=2):
    step = make_step(kind, B)
    state = {"overlap": jnp.zeros((B, C, M), jnp.float32)}

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
    # accuracy spot check of manual3 vs HIGH on small shapes
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, N)), jnp.float32)
    pj = jnp.asarray(fft_engine.get_projection_matrix(N, M))
    hi = jnp.dot(x, pj, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGH)
    x_hi, x_lo = split_hi_lo(x)
    p_hi, p_lo = split_hi_lo(pj)
    m3 = (jnp.dot(x_hi, p_hi, preferred_element_type=jnp.float32)
          + jnp.dot(x_hi, p_lo, preferred_element_type=jnp.float32)
          + jnp.dot(x_lo, p_hi, preferred_element_type=jnp.float32))
    ref = np.asarray(x, np.float64) @ np.asarray(pj, np.float64)
    print("err HIGH   :", float(np.abs(np.asarray(hi) - ref).max()))
    print("err manual3:", float(np.abs(np.asarray(m3) - ref).max()), flush=True)

    for kind in ("high", "default", "manual3", "stacked3", "stacked3p"):
        msps = bench(kind, 8192)
        print(f"{kind:10s} B=8192: {msps:8.1f} Msps ({msps/258.0:5.2f}x ref)",
              flush=True)


if __name__ == "__main__":
    main()
