"""Probe: is the async step's ~0.16 ms XLA-side residual a ring copy?

ROUND5_NOTES round-6 agenda item 2: with the fused kernel stubbed, the
async step still costs ~0.164 ms of XLA-side work.  Two hypotheses:

1. The compaction ``lax.cond`` fails to alias the identity branch, so
   XLA copies the ~80 MB ring EVERY step (cost scales with horizon).
2. Fixed dispatch/plumbing overhead (cost flat in horizon).

Discriminate by sweeping horizon at the bench config (44100->44101,
B=256 stereo, chunk 2048, fused kernel ON): MXU work is horizon-
invariant, ring bytes are ~linear in horizon.  Also dumps the compiled
HLO and counts full-ring copy/fusion ops.

Run SERIALIZED on the v5e-1 tunnel.
"""

import re
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


def build(horizon, n_streams=256, chunk_frames=2048):
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
    max_out = (chunk_frames * M) // L + 128
    step = fir_engine.make_fir_fleet_step_async_tm(
        cfg, coeffs, n_streams, max_chunk=chunk_frames, horizon=horizon,
        out_layout="tm", max_out=max_out,
    )
    rng = np.random.default_rng(0)
    phases = rng.integers(0, M, size=n_streams)
    state = fir_engine.fir_fleet_init_async_tm(
        cfg, n_streams, max_chunk=chunk_frames, horizon=horizon,
        pos_num=phases,
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
    chunks = jnp.asarray(
        rng.standard_normal((NBUF, chunk_frames, n_streams * C)), jnp.float32
    )
    ring_rows = state["buffer"].shape[0]
    return fleet, state, chunks, ring_rows, n_streams, C


def measure(horizon, dispatches=5, warmup=2):
    fleet, state, chunks, ring_rows, B, C = build(horizon)
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
    ring_mb = ring_rows * B * C * 4 / 1e6
    return msps, ms_step, ring_mb


def hlo_ring_copies(horizon):
    fleet, state, chunks, ring_rows, B, C = build(horizon)
    txt = fleet.lower(state, chunks).compile().as_text()
    shape = f"f32[{ring_rows},{B * C}]"
    copies = len(re.findall(re.escape(shape) + r"\}?\s+copy\(", txt))
    # crude: any op producing a full-ring result inside the while body
    produced = txt.count(shape)
    return copies, produced


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    for h in (4, 16, 32):
        msps, ms, mb = measure(h)
        print(
            f"horizon={h:2d} (ring {mb:6.1f} MB): {msps:8.1f} Msps  "
            f"{ms:.3f} ms/step",
            flush=True,
        )
    c, p = hlo_ring_copies(16)
    print(f"HLO horizon=16: full-ring copy ops = {c}, "
          f"full-ring-shaped results = {p}")
