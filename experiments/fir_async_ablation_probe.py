"""Ablation of the async tm fleet step's stages at the bench config.

Times, scan-amortized (J=40) on the current backend:
  conv      — the fleet-wide basis-response conv alone
  takes     — conv + the n_shift static row-takes (sum-reduced)
  combine   — conv + takes + Chebyshev combine + select (the full math)
  step      — the full step (append/schedule/consume/compact included)

Run: python experiments/fir_async_ablation_probe.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from resampler_tpu.engine import fir as fe
from resampler_tpu.types import Attenuation, Latency, reduce_ratio

J = 40
B, C = 256, 2
CHUNK = 2048


def timeit(fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / (3 * J) * 1e3  # ms per iter


def main():
    L_, M_ = reduce_ratio(44100, 44101)
    cfg = fe.FirConfig(
        channels=C, taps=Latency.Sample64.taps, ratio_num=L_, ratio_den=M_
    )
    cutoff = fe.fir_cutoff(
        Latency.Sample64.taps, Attenuation.Db90, 44100 / 44101
    )
    coeffs = fe.fir_coefficients(
        Latency.Sample64.taps, Attenuation.Db90, cutoff
    )
    R = B * C
    N = cfg.out_capacity
    taps = cfg.taps
    d1 = fe.FARROW_DEGREE + 1
    n_shift = 3
    i = np.arange(N, dtype=np.int64)
    j_np = ((i * L_) // M_).astype(np.int32)
    s_np = ((i * L_) % M_).astype(np.int32)
    p_len = int(j_np[-1]) + n_shift
    region_rows = p_len + taps - 1
    A, _ = fe.farrow_matrix(coeffs)
    filt = jnp.asarray(A[:, None, :])
    j_c = jnp.asarray(j_np)
    s_c = jnp.asarray(s_np)
    M = jnp.int32(M_)

    rng = np.random.default_rng(0)
    buf = jnp.asarray(rng.standard_normal((region_rows + 64, R)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, M_, size=B).astype(np.int32))

    def conv_only(buf, pos):
        def body(c, k):
            region = jax.lax.dynamic_slice(
                buf, (k % 8, 0), (region_rows, R)
            )
            y = jax.lax.conv_general_dilated(
                region[:, None, :], filt, window_strides=(1,),
                padding="VALID",
                dimension_numbers=("HCN", "OIH", "HCN"),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return c + jnp.max(jnp.abs(y)), 0

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(J))
        return c

    def takes_only(buf, pos):
        def body(c, k):
            region = jax.lax.dynamic_slice(
                buf, (k % 8, 0), (region_rows, R)
            )
            y = jax.lax.conv_general_dilated(
                region[:, None, :], filt, window_strides=(1,),
                padding="VALID",
                dimension_numbers=("HCN", "OIH", "HCN"),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            acc = jnp.float32(0)
            for s in range(n_shift):
                ys = jnp.take(y, j_c + s, axis=0)
                acc = acc + jnp.max(jnp.abs(ys)) + c * 1e-9
            return c + acc, 0

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(J))
        return c

    def combine_full(buf, pos):
        def body(c, k):
            region = jax.lax.dynamic_slice(
                buf, (k % 8, 0), (region_rows, R)
            )
            y = jax.lax.conv_general_dilated(
                region[:, None, :], filt, window_strides=(1,),
                padding="VALID",
                dimension_numbers=("HCN", "OIH", "HCN"),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            p2 = pos + k  # vary per iter
            r = p2 % M
            wrap = (r[:, None] + s_c[None, :] >= M).astype(jnp.int32)
            shift = wrap
            frac = (
                r[:, None] + s_c[None, :] - M * wrap
            ).astype(jnp.float32) / jnp.float32(M_)
            u = 2.0 * frac - 1.0
            ts = [jnp.ones_like(u), u]
            for _ in range(d1 - 2):
                ts.append(2.0 * u * ts[-1] - ts[-2])
            v = jnp.stack(ts, axis=-1)
            vs = jnp.transpose(v, (1, 2, 0))[:, :, :, None]
            shift_t = jnp.transpose(shift)[:, :, None]
            out = None
            for s in range(n_shift - 1, -1, -1):
                ys = jnp.take(y, j_c + s, axis=0)
                o_s = jnp.sum(ys.reshape(N, d1, B, C) * vs, axis=1)
                out = o_s if out is None else jnp.where(
                    shift_t == s, o_s, out
                )
            return c + jnp.max(jnp.abs(out)), 0

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(J))
        return c

    for name, fn in (
        ("conv", conv_only), ("takes", takes_only), ("combine", combine_full)
    ):
        ms = timeit(jax.jit(fn), buf, pos)
        print(f"{name:8s} {ms:7.3f} ms/iter")

    # full step via the engine
    step = fe.make_fir_fleet_step_async_tm(
        cfg, coeffs, B, max_chunk=CHUNK, horizon=16, out_layout="tm"
    )
    state = fe.fir_fleet_init_async_tm(
        cfg, B, max_chunk=CHUNK, horizon=16,
        pos_num=rng.integers(0, M_, size=B),
    )
    chunks = jnp.asarray(
        rng.standard_normal((8, CHUNK, R)), jnp.float32
    )

    def full(state, chunks):
        def body(st, k):
            st, out, c, p = step(st, chunks[k % 8], jnp.int32(CHUNK))
            return st, (p, jnp.max(jnp.abs(out)))

        st, (ps, peaks) = jax.lax.scan(body, state, jnp.arange(J))
        return st, jnp.sum(ps), jnp.max(peaks)

    fullj = jax.jit(full, donate_argnums=0)
    state, p, peak = fullj(state, chunks)
    jax.block_until_ready(peak)
    t0 = time.perf_counter()
    n = 0
    for _ in range(3):
        state, p, peak = fullj(state, chunks)
        n += int(p)
    jax.block_until_ready(peak)
    dt = time.perf_counter() - t0
    print(f"step     {dt / (3 * J) * 1e3:7.3f} ms/iter   "
          f"({n * B * C / dt / 1e6:.0f} Msps)")


if __name__ == "__main__":
    main()
