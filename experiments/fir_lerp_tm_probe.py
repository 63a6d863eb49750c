"""Probe: exact table-lerp semantics on the sync tm fleet (path="lerp").

VERDICT r4 weak #1 / next-4: the per-stream lerp path (SVD basis +
per-output U-row takes, vmapped) measures 84 Msps = 0.61x reference at
B=256 — the takes are paid PER STREAM.  The tm fleet pays the combine
basis once for the whole fleet, so routing the lerp basis through the
shared positioning matmul (fir_fleets._farrow_tm_plan(basis="lerp"))
should serve table-lerp semantics at farrow-fleet speed.

Measures, at the bench config (44100->44101, B=256 stereo, chunk 2048,
SCAN_LEN-step scan, varying feed shape like bench.py):
  - sync tm fleet path="farrow" (the existing ~85x row)
  - sync tm fleet path="lerp"  (new)
Run SERIALIZED (no concurrent pytest) on the v5e-1 tunnel.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from resampler_tpu.engine import fir as fir_engine
from resampler_tpu.types import Attenuation, Latency, reduce_ratio

NBUF = 4
SCAN_LEN = 32


def bench_tm(path, dispatches=5, warmup=2, n_streams=256, chunk_frames=2048):
    C = 2
    L, M = reduce_ratio(44100, 44101)
    cfg = fir_engine.FirConfig(
        channels=C, taps=Latency.Sample64.taps, ratio_num=L, ratio_den=M
    )
    cutoff = fir_engine.fir_cutoff(
        Latency.Sample64.taps, Attenuation.Db90, 44100 / 44101
    )
    coeffs = fir_engine.fir_coefficients(
        Latency.Sample64.taps, Attenuation.Db90, cutoff
    )
    step = fir_engine.make_fir_fleet_step_sync_tm(
        cfg, coeffs, n_streams, max_chunk=chunk_frames, horizon=16, path=path
    )
    state = fir_engine.fir_fleet_init_sync_tm(
        cfg, n_streams, max_chunk=chunk_frames, horizon=16
    )
    idx = jnp.arange(SCAN_LEN, dtype=jnp.int32) % NBUF

    def fleet(state, chunks):
        def body(st, i):
            st, out, consumed, produced = step(
                st, chunks[i], jnp.int32(chunk_frames)
            )
            return st, (produced * n_streams, jnp.max(jnp.abs(out)))

        state, (produced, peaks) = jax.lax.scan(body, state, idx)
        return state, jnp.sum(produced), jnp.max(peaks)

    fleet = jax.jit(fleet, donate_argnums=0)
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(
        rng.standard_normal((NBUF, chunk_frames, n_streams * C)), jnp.float32
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
    msps = sum(int(p) for p in parts) * C / dt / 1e6
    ms_step = dt / (dispatches * SCAN_LEN) * 1e3
    return msps, ms_step


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for path in ("farrow", "lerp"):
        msps, ms = bench_tm(path)
        print(
            f"sync tm path={path:7s}: {msps:8.1f} Msps "
            f"({msps / 137.0:5.1f}x ref)  {ms:.3f} ms/step"
        )
