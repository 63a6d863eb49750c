"""Ablation of the async tm fleet step using the PRODUCTION structure
(banded-atlas einsum, not the slow-compiling conv form of the retired
fir_async_ablation_probe).  Bench config: B=256 stereo, chunk=2048,
44100->44101, taps=128, max_out=chunk*M/L+128.

Pieces, scan-amortized (J=16):
  contract  — the banded-atlas einsum alone ([Lb*d1, s]x[Kc, s, R])
  takes     — contract + n_shift row-takes of y (sum-reduced)
  cheb      — contract + per-stream frac/wrap + Chebyshev basis build
  combine   — the full math: contract + takes + combine + select
  step      — the production step via the engine

Run: python experiments/fir_async_ablation2_probe.py
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

J = 16
B, C = 256, 2
CHUNK = 2048
IN_HZ, OUT_HZ = 44100, 44101


def timeit(fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / (3 * J) * 1e3  # ms per iter


def main():
    L_, M_ = reduce_ratio(IN_HZ, OUT_HZ)
    taps = Latency.Sample64.taps
    cfg = fe.FirConfig(channels=C, taps=taps, ratio_num=L_, ratio_den=M_)
    cutoff = fe.fir_cutoff(taps, Attenuation.Db90, IN_HZ / OUT_HZ)
    coeffs = fe.fir_coefficients(taps, Attenuation.Db90, cutoff)
    R = B * C
    out_cap = (CHUNK * M_) // L_ + 128  # = bench max_out
    d1 = fe.FARROW_DEGREE + 1
    n_shift = 3

    i = np.arange(out_cap, dtype=np.int64)
    j_np = ((i * L_) // M_).astype(np.int32)
    s_np = ((i * L_) % M_).astype(np.int32)
    j_max = int(j_np[-1])
    p_len = j_max + n_shift
    Lb = 64
    Kc = -(-p_len // Lb)
    p_pad = Kc * Lb
    s_len_c = Lb + taps - 1
    region_rows = p_pad + taps - 1

    A, _ = fe.farrow_matrix(coeffs)
    ab = np.zeros((Lb * d1, s_len_c), np.float32)
    for p in range(Lb):
        ab[p * d1 : (p + 1) * d1, p : p + taps] = A
    ab_c = jnp.asarray(ab)
    j_c = jnp.asarray(j_np)
    s_c = jnp.asarray(s_np)
    M = jnp.int32(M_)

    rng = np.random.default_rng(0)
    buf = jnp.asarray(
        rng.standard_normal((region_rows + 64, R)), jnp.float32
    )
    pos = jnp.asarray(rng.integers(0, M_, size=B).astype(np.int32))

    def contract_y(buffer, k):
        region = jax.lax.dynamic_slice(
            buffer, (k % 8, 0), (region_rows, R)
        )
        segs = jnp.stack(
            [
                jax.lax.slice_in_dim(
                    region, kk * Lb, kk * Lb + s_len_c, axis=0
                )
                for kk in range(Kc)
            ],
            axis=0,
        )
        y = jnp.einsum(
            "qs,ksr->kqr", ab_c, segs,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(p_pad, d1, R)
        return y

    def contract_only(buf, pos):
        def body(c, k):
            y = contract_y(buf, k)
            return c + jnp.max(jnp.abs(y)), 0

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(J))
        return c

    def takes_only(buf, pos):
        def body(c, k):
            y = contract_y(buf, k)
            acc = jnp.float32(0)
            for s in range(n_shift):
                ys = jnp.take(y, j_c + s, axis=0)
                acc = acc + jnp.max(jnp.abs(ys))
            return c + acc, 0

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(J))
        return c

    def cheb_parts(pos, k):
        p2 = pos + k
        r = p2 % M
        wrap = (r[:, None] + s_c[None, :] >= M).astype(jnp.int32)
        shift = wrap  # base_rel=0 in this probe
        frac = (
            r[:, None] + s_c[None, :] - M * wrap
        ).astype(jnp.float32) / jnp.float32(M_)
        u = 2.0 * frac - 1.0
        ts = [jnp.ones_like(u), u]
        for _ in range(d1 - 2):
            ts.append(2.0 * u * ts[-1] - ts[-2])
        v = jnp.stack(ts, axis=-1)  # [B, N, d1]
        return shift, v

    def cheb_only(buf, pos):
        def body(c, k):
            y = contract_y(buf, k)
            shift, v = cheb_parts(pos, k)
            return c + jnp.max(jnp.abs(y)) + jnp.max(v) + jnp.max(
                shift.astype(jnp.float32)
            ), 0

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(J))
        return c

    def combine_full(buf, pos):
        def body(c, k):
            y = contract_y(buf, k)
            shift, v = cheb_parts(pos, k)
            vs = jnp.transpose(v, (1, 2, 0))[:, :, :, None]
            shift_t = jnp.transpose(shift)[:, :, None]
            out = None
            for s in range(n_shift - 1, -1, -1):
                ys = jnp.take(y, j_c + s, axis=0)
                o_s = jnp.sum(ys.reshape(out_cap, d1, B, C) * vs, axis=1)
                out = o_s if out is None else jnp.where(
                    shift_t == s, o_s, out
                )
            return c + jnp.max(jnp.abs(out)), 0

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(J))
        return c

    print(
        f"config: B={B} C={C} R={R} out_cap={out_cap} p_pad={p_pad} "
        f"Kc={Kc} d1={d1} taps={taps} region_rows={region_rows}"
    )
    for name, fn in (
        ("contract", contract_only),
        ("takes", takes_only),
        ("cheb", cheb_only),
        ("combine", combine_full),
    ):
        ms = timeit(jax.jit(fn), buf, pos)
        print(f"{name:9s} {ms:7.3f} ms/iter")

    # full production step
    step = fe.make_fir_fleet_step_async_tm(
        cfg, coeffs, B, max_chunk=CHUNK, horizon=16, out_layout="tm",
        max_out=out_cap,
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
    print(
        f"step      {dt / (3 * J) * 1e3:7.3f} ms/iter   "
        f"({n * B * C / dt / 1e6:.0f} Msps)"
    )


if __name__ == "__main__":
    main()
