"""Probe: what does the tm step's batch-major output transpose cost?

The sync tm step ends with `transpose(out.reshape(out_cap, B, C),
(1, 0, 2))` — a [out_cap, B*C] -> [B, out_cap, C] relayout that is
~36 MB/step of pure HBM traffic at the headline config.  Question:
(a) does the BENCH even pay it (its consumer is max|out|, a
layout-invariant reduce XLA can fuse through)? and (b) what does it
cost a consumer that MATERIALIZES the output (a serving pipeline
stacking chunks), i.e. what does `out_layout="tm"` buy?

Method: headline config (44100->48000, B=1024, C=2, chunk 4096),
scan-amortized (J steps inside one jit, memory notes: never time a
single dispatch through the axon tunnel).  Two consumer forms x two
layouts:
  reduce:      body returns max|out|          (the bench's form)
  materialize: scan stacks out into HBM       (a pipeline's form)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from resampler_tpu.engine import fir as fir_engine
from resampler_tpu.types import Attenuation, Latency, reduce_ratio

B, C = 1024, 2
CHUNK = 4096
J = 40  # scan length (materialize form stacks J * ~36 MB; J must be
# large: ~6.5 ms tunnel overhead per dispatch contaminates small-J
# per-step times — the J=8 run read 1.45-1.52 ms/step where the true
# step is ~0.67 ms)
DISPATCHES = 5
WARMUP = 2


def build(out_layout):
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
        cfg, coeffs, B, max_chunk=CHUNK, horizon=16, out_layout=out_layout
    )
    state = fir_engine.fir_fleet_init_sync_tm(
        cfg, B, max_chunk=CHUNK, horizon=16
    )
    return step, state


def timed(fleet, state, chunks):
    fleet = jax.jit(fleet, donate_argnums=0)
    for _ in range(WARMUP):
        state, sig = fleet(state, chunks)
    jax.block_until_ready(sig)
    t0 = time.perf_counter()
    for _ in range(DISPATCHES):
        state, sig = fleet(state, chunks)
    jax.block_until_ready(sig)
    dt = time.perf_counter() - t0
    return dt / (DISPATCHES * J) * 1e3  # ms per step


def run(form, out_layout):
    step, state = build(out_layout)

    if form == "reduce":

        def fleet(state, chunks):
            def body(st, _):
                st, out, _, p = step(st, chunks, jnp.int32(CHUNK))
                return st, (p, jnp.max(jnp.abs(out)))

            state, (prod, peaks) = jax.lax.scan(body, state, None, length=J)
            return state, jnp.max(peaks)

    else:  # materialize: stack every chunk's output into HBM

        def fleet(state, chunks):
            def body(st, _):
                st, out, _, p = step(st, chunks, jnp.int32(CHUNK))
                return st, out

            state, outs = jax.lax.scan(body, state, None, length=J)
            # tiny readback signal; outs stay resident
            return state, outs.ravel()[0]

    rng = np.random.default_rng(0)
    chunks = jnp.asarray(
        rng.standard_normal((CHUNK, B * C)), jnp.float32
    )
    ms = timed(fleet, state, chunks)
    # output samples per step (frames * streams * channels)
    n_out = int(CHUNK * 160 / 147)
    gsps = n_out * B * C / (ms * 1e-3) / 1e9
    print(f"{form:11s} out_layout={out_layout}: {ms:7.3f} ms/step  "
          f"~{gsps:6.2f} Gsps")
    return ms


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    for form in ("reduce", "materialize"):
        for layout in ("bm", "tm"):
            run(form, layout)
