"""Probe: larger input_capacity for heavy coprime downsampling.

At 367500->1601 (L/M ~ 230) the default 4096-frame buffer yields only
~19 outputs per fleet step, so fixed per-step costs (append DUS, region
read, schedule) dominate the OUTPUT-side throughput (measured 68.5
output-Msps / 15.7 input-Gsps on v5e-1).  input_capacity is a config
knob — a larger buffer amortizes the fixed costs over ~4x more outputs
per step at ~the same new-input traffic.  Measures the tm sync fleet at
capacity 4096 vs 16384 vs 32768.

Usage: python experiments/heavy_capacity_probe.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from resampler_tpu.engine import fir as fe  # noqa: E402
from resampler_tpu.types import Attenuation, Latency, reduce_ratio  # noqa: E402

SCAN_LEN = 40


def bench(capacity, n_streams=1024, chunk=None, dispatches=5, warmup=2,
          contraction="auto"):
    C = 2
    if chunk is None:
        # the round-3 sweep kept chunk=4096 for every capacity, so
        # production stayed input-bound (~18 outputs/step) while the
        # contraction grew with out_cap — the chunk must SCALE with the
        # buffer for larger capacity to mean more outputs per step
        chunk = capacity
    L, M = reduce_ratio(367500, 1601)
    cfg = fe.FirConfig(
        channels=C, taps=Latency.Sample64.taps, ratio_num=L, ratio_den=M,
        input_capacity=capacity,
    )
    cutoff = fe.fir_cutoff(
        Latency.Sample64.taps, Attenuation.Db90, 367500 / 1601
    )
    coeffs = fe.fir_coefficients(
        Latency.Sample64.taps, Attenuation.Db90, cutoff
    )
    step = fe.make_fir_fleet_step_sync_tm(
        cfg, coeffs, n_streams, max_chunk=chunk, horizon=8,
        contraction=contraction,
    )
    state = fe.fir_fleet_init_sync_tm(
        cfg, n_streams, max_chunk=chunk, horizon=8
    )

    def fleet(state, chunks):
        def body(st, _):
            st, out, consumed, produced = step(st, chunks, jnp.int32(chunk))
            return st, (produced * n_streams, jnp.max(jnp.abs(out)))

        state, (produced, peaks) = jax.lax.scan(
            body, state, None, length=SCAN_LEN
        )
        return state, jnp.sum(produced), jnp.max(peaks)

    fleet = jax.jit(fleet, donate_argnums=0)
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(
        rng.standard_normal((chunk, n_streams * C)), jnp.float32
    )
    for _ in range(warmup):
        state, produced, peak = fleet(state, chunks)
    jax.block_until_ready(peak)
    parts = []
    t0 = time.perf_counter()
    for _ in range(dispatches):
        state, produced, peak = fleet(state, chunks)
        parts.append(produced)
    jax.block_until_ready(peak)
    dt = time.perf_counter() - t0
    out_msps = sum(int(p) for p in parts) * C / dt / 1e6
    return out_msps


def main():
    for cap in (4096, 16384, 32768):
        for contraction in ("xla", "dma"):
            v = bench(cap, contraction=contraction)
            print(
                f"capacity {cap:6d} chunk=cap {contraction:3s}: "
                f"{v:8.1f} out-Msps "
                f"({v * 367500 / 1601 / 1e3:7.2f} in-Gsps) "
                f"= {v/137.0:.2f}x ref",
                flush=True,
            )


if __name__ == "__main__":
    main()
