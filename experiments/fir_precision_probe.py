"""Is the time-major FIR fleet step MXU-precision-bound? (round 2)

The sync einsum runs at Precision.HIGHEST (bf16x6).  Raw FLOPs say the
MXU should be ~20% of the measured step time, but the skinny shapes
([160, 294] x [294, K*R]) may run far below peak, making the pass count
the real lever.  Measure HIGHEST vs HIGH vs DEFAULT throughput at the
bench config, plus the alias-rejection quality of each on the
attestation tone (23 kHz @ 48k -> 44.1k).

Run: python experiments/fir_precision_probe.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from resampler_tpu.engine import fir as fir_engine
from resampler_tpu.types import Attenuation, Latency, reduce_ratio

SCAN_LEN = 40


def build(precision, n_streams=1024, chunk=4096):
    C = 2
    L, M = reduce_ratio(44100, 48000)
    cfg = fir_engine.FirConfig(
        channels=C, taps=Latency.Sample64.taps, ratio_num=L, ratio_den=M
    )
    cutoff = fir_engine.fir_cutoff(
        Latency.Sample64.taps, Attenuation.Db90, 44100 / 48000
    )
    coeffs = fir_engine.fir_coefficients(
        Latency.Sample64.taps, Attenuation.Db90, cutoff
    )
    step = fir_engine.make_fir_fleet_step_sync_tm(
        cfg, coeffs, n_streams, max_chunk=chunk, horizon=16,
        precision=precision,
    )
    state = fir_engine.fir_fleet_init_sync_tm(
        cfg, n_streams, max_chunk=chunk, horizon=16
    )
    return cfg, step, state, C


def bench(precision, dispatches=5, warmup=2, n_streams=1024, chunk=4096):
    cfg, step, state, C = build(precision, n_streams, chunk)

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
    return sum(int(p) for p in parts) * C / dt / 1e6


def alias_db(precision):
    """48k -> 44.1k 23 kHz tone alias rejection through the tm step
    (mirrors bench.quality_attestation but drives the fleet step)."""
    C = 2
    B = 8
    chunk = 2048
    L, M = reduce_ratio(48000, 44100)
    cfg = fir_engine.FirConfig(channels=C, taps=128, ratio_num=L, ratio_den=M)
    cutoff = fir_engine.fir_cutoff(128, Attenuation.Db90, 48000 / 44100)
    coeffs = fir_engine.fir_coefficients(128, Attenuation.Db90, cutoff)
    step = jax.jit(
        fir_engine.make_fir_fleet_step_sync_tm(
            cfg, coeffs, B, max_chunk=chunk, precision=precision
        ),
        donate_argnums=0,
    )
    state = fir_engine.fir_fleet_init_sync_tm(cfg, B, max_chunk=chunk)
    t = np.arange(48000) / 48000
    tone = (0.5 * np.sin(2 * np.pi * 23000 * t)).astype(np.float32)
    outs = []
    for k in range(0, len(tone) - chunk + 1, chunk):
        feed = np.broadcast_to(
            tone[k : k + chunk, None], (chunk, B * C)
        ).astype(np.float32)
        state, out, consumed, produced = step(
            state, jnp.asarray(feed), jnp.int32(chunk)
        )
        outs.append(np.asarray(out)[0, : int(produced), 0])
    y = np.concatenate(outs)
    seg = y[2000:-2000]
    return float(-20 * np.log10(np.abs(seg).max() / 0.5 + 1e-12))


def main():
    print("backend:", jax.default_backend(), flush=True)
    P = jax.lax.Precision
    for name, p in [("HIGHEST", P.HIGHEST), ("HIGH", P.HIGH),
                    ("DEFAULT", P.DEFAULT), ("bf16x4", "bf16x4")]:
        db = alias_db(p)
        print(f"{name:8s} alias rejection: {db:6.1f} dB", flush=True)
    for name, p in [("HIGHEST", P.HIGHEST), ("HIGH", P.HIGH),
                    ("DEFAULT", P.DEFAULT), ("bf16x4", "bf16x4")]:
        msps = bench(p)
        print(f"{name:8s} B=1024: {msps:8.1f} Msps ({msps/137.0:6.2f}x ref)",
              flush=True)


if __name__ == "__main__":
    main()
