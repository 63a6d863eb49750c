"""Async tm fleet throughput probe at the bench arbitrary-ratio config.

Compares the new make_fir_fleet_step_async_tm (independent per-stream
positions, shared ring) against the vmapped per-stream farrow baseline
(bench.py fir_arbitrary: 155 Msps = 1.13x on v5e-1).

Run: python experiments/fir_async_fleet_probe.py [--streams N] [--chunk N]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from resampler_tpu.engine import fir as fe
from resampler_tpu.types import Attenuation, Latency, reduce_ratio

SCAN_LEN = 40
NBUF = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--in-hz", type=int, default=44100)
    ap.add_argument("--out-hz", type=int, default=44101)
    ap.add_argument("--dispatches", type=int, default=5)
    ap.add_argument("--max-out", type=int, default=None)
    args = ap.parse_args()

    B, C = args.streams, 2
    L, M = reduce_ratio(args.in_hz, args.out_hz)
    cfg = fe.FirConfig(
        channels=C, taps=Latency.Sample64.taps, ratio_num=L, ratio_den=M
    )
    cutoff = fe.fir_cutoff(
        Latency.Sample64.taps, Attenuation.Db90, args.in_hz / args.out_hz
    )
    coeffs = fe.fir_coefficients(
        Latency.Sample64.taps, Attenuation.Db90, cutoff
    )
    step = fe.make_fir_fleet_step_async_tm(
        cfg, coeffs, B, max_chunk=args.chunk, horizon=16, out_layout="tm",
        max_out=args.max_out,
    )
    rng = np.random.default_rng(0)
    phases = rng.integers(0, M, size=B)
    state = fe.fir_fleet_init_async_tm(
        cfg, B, max_chunk=args.chunk, horizon=16, pos_num=phases
    )
    idx = jnp.arange(SCAN_LEN, dtype=jnp.int32) % NBUF

    def fleet(state, chunks):
        def body(st, i):
            st, out, c, p = step(st, chunks[i], jnp.int32(args.chunk))
            return st, (p * B, jnp.max(jnp.abs(out)))

        state, (produced, peaks) = jax.lax.scan(body, state, idx)
        return state, jnp.sum(produced), jnp.max(peaks)

    fleet = jax.jit(fleet, donate_argnums=0)
    chunks = jnp.asarray(
        rng.standard_normal((NBUF, args.chunk, B * C)), jnp.float32
    )
    for _ in range(2):
        state, produced, peak = fleet(state, chunks)
    jax.block_until_ready(peak)
    parts = []
    t0 = time.perf_counter()
    for _ in range(args.dispatches):
        state, produced, peak = fleet(state, chunks)
        parts.append(produced)
    jax.block_until_ready(peak)
    dt = time.perf_counter() - t0
    msps = sum(int(p) for p in parts) * C / dt / 1e6
    print(
        f"async tm fleet {args.in_hz}->{args.out_hz} B={B} chunk={args.chunk}"
        f": {msps:.1f} Msps ({msps / 137.0:.2f}x reference)"
    )


if __name__ == "__main__":
    main()
