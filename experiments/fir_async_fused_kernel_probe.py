"""Fused async-kernel probe: correctness + throughput vs the XLA step.

Bench-identical config (bench_fir_arbitrary_async): 44100->44101,
B=256 stereo, chunk=2048, taps=64, max_out=steady-state, varying feed
(NBUF=8), J=40 scan-amortized.  Run serialized (one TPU job at a time).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from resampler_tpu.engine import fir as fe
from resampler_tpu.types import Attenuation, Latency, reduce_ratio

C = 2
B = 256
CHUNK = 2048
NBUF = 8
J = 40
L, M = reduce_ratio(44100, 44101)
cfg = fe.FirConfig(
    channels=C, taps=Latency.Sample64.taps, ratio_num=L, ratio_den=M
)
cutoff = fe.fir_cutoff(Latency.Sample64.taps, Attenuation.Db90, 44100 / 44101)
coeffs = fe.fir_coefficients(Latency.Sample64.taps, Attenuation.Db90, cutoff)
max_out = (CHUNK * M) // L + 128

rng = np.random.default_rng(0)
phases = rng.integers(0, M, size=B)
chunks = jnp.asarray(
    rng.standard_normal((NBUF, CHUNK, B * C)), jnp.float32
)
idx = np.arange(J, dtype=np.int32) % NBUF


def build(kernel):
    step = fe.make_fir_fleet_step_async_tm(
        cfg, coeffs, B, max_chunk=CHUNK, horizon=16,
        out_layout="tm", max_out=max_out, kernel=kernel,
    )
    state = fe.fir_fleet_init_async_tm(
        cfg, B, max_chunk=CHUNK, horizon=16, pos_num=phases
    )

    def fleet(state, chunks):
        def body(st, i):
            st, out, c, p = step(st, chunks[i], jnp.int32(CHUNK))
            return st, (p * B, jnp.max(jnp.abs(out)))

        state, (produced, peaks) = jax.lax.scan(
            body, state, jnp.asarray(idx)
        )
        return state, jnp.sum(produced), jnp.max(peaks)

    return jax.jit(fleet, donate_argnums=0), state


def correctness(kernel):
    """Few-step differential vs the XLA step on device."""
    outs = {}
    for k in ("xla", kernel):
        step = jax.jit(fe.make_fir_fleet_step_async_tm(
            cfg, coeffs, B, max_chunk=CHUNK, horizon=16,
            out_layout="tm", max_out=max_out, kernel=k,
        ))
        st = fe.fir_fleet_init_async_tm(
            cfg, B, max_chunk=CHUNK, horizon=16, pos_num=phases
        )
        os_ = []
        for t in range(4):
            st, out, c, p = step(st, chunks[t % NBUF], jnp.int32(CHUNK))
            os_.append(np.asarray(out)[: int(p)])
        outs[k] = os_
    worst = max(
        float(np.abs(a - b).max())
        for a, b in zip(outs["xla"], outs[kernel])
    )
    print(f"correctness |xla - {kernel}| = {worst:.3e}")
    assert worst < 8e-5, worst
    return worst


def bench(kernel, warmup=2, reps=5):
    # bench.py methodology: no mid-loop syncs (a blocking int() per rep
    # costs a full axon-tunnel round trip and halves the apparent rate)
    fleet, state = build(kernel)
    for _ in range(warmup):
        state, produced, peak = fleet(state, chunks)
    jax.block_until_ready(peak)
    parts = []
    t0 = time.perf_counter()
    for _ in range(reps):
        state, produced, peak = fleet(state, chunks)
        parts.append(produced)
    jax.block_until_ready(peak)
    dt = time.perf_counter() - t0
    tot = sum(int(p) for p in parts)
    msps = tot * C / dt / 1e6
    print(f"{kernel:8s}: {msps:9.1f} Msps  ({dt/ (reps*J) * 1e3:.3f} ms/step)")
    return msps


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    correctness("pallas")
    x = bench("xla")
    p = bench("pallas")
    print(f"speedup: {p / x:.2f}x   vs reference: {p / 137.0:.1f}x")
