"""Probe: where does the tm sync step's NON-contraction time go?

At the headline config the full step measures ~0.673 ms of which the
DMA contraction alone is ~0.518 ms (fir_tm_dma_probe / round-3 DMA
ledger).  This probe times the other pieces in the same J-scan harness:

  feed      the masked chunk append (dynamic_update_slice of
            [4096, 2048] f32 into the ring) + schedule scalars
  consume   out-masking + bm relayout + reduce (the bench consumer)
  full      the production step (reference point)

If feed+consume account for the 0.155 ms gap, the remaining FIR levers
are (a) a faster contraction (fir_banded_group_dma_probe) and (b)
fusing the append into the contraction kernel's reads (virtual
carry||chunk buffer — an architecture change, only worth it if feed is
a real fraction).

Usage: python experiments/fir_step_ablation_probe.py
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from resampler_tpu.engine import fir as fe  # noqa: E402
from resampler_tpu.types import Attenuation, Latency, reduce_ratio  # noqa: E402

L, M = reduce_ratio(44100, 48000)
TAPS = Latency.Sample64.taps


def main():
    import builtins

    pr = functools.partial(builtins.print, flush=True)
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    B, C, chunk = (8, 2, 256) if smoke else (1024, 2, 4096)
    R = B * C
    cfg = fe.FirConfig(channels=C, taps=TAPS, ratio_num=L, ratio_den=M)
    cutoff = fe.fir_cutoff(TAPS, Attenuation.Db90, 44100 / 48000)
    coeffs = fe.fir_coefficients(TAPS, Attenuation.Db90, cutoff)
    step = fe.make_fir_fleet_step_sync_tm(
        cfg, coeffs, B, max_chunk=chunk, horizon=16
    )
    state0 = fe.fir_fleet_init_sync_tm(cfg, B, max_chunk=chunk, horizon=16)
    ring = state0["buffer"].shape[0]
    pr(f"ring={ring} R={R} out_cap={cfg.out_capacity}")

    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.standard_normal((chunk, R)), jnp.float32)

    J = 2 if smoke else 32

    def harness(body_fn, init_carry):
        @jax.jit
        def run(chunks):
            def body(carry, j):
                return body_fn(carry, chunks, j)

            carry, _ = jax.lax.scan(
                body, init_carry, jnp.arange(J, dtype=jnp.int32)
            )
            return carry

        return run

    # full production step
    def full_body(st, chunks, j):
        st, out, consumed, produced = step(st, chunks, jnp.int32(chunk))
        leaves = jax.tree_util.tree_leaves(st)
        return st, None

    full = harness(full_body, state0)

    # feed-only: append + schedule + consume/compact bookkeeping, NO
    # contraction (replicates the step's data movement minus _contract)
    cap = cfg.input_capacity
    slack = cfg.read_slack
    out_cap = cfg.out_capacity

    def feed_body(st, chunks, j):
        buffer, start, fill, pos = (
            st["buffer"], st["start"], st["fill"], st["pos_num"]
        )
        avail = fill - start
        to_copy = jnp.minimum(jnp.int32(chunk), cap - avail)
        mask = jnp.arange(chunk, dtype=jnp.int32) < to_copy
        chunk_masked = jnp.where(mask[:, None], chunks, 0.0)
        buffer = jax.lax.dynamic_update_slice(buffer, chunk_masked, (fill, 0))
        fill = fill + to_copy
        avail = avail + to_copy
        n_out = fe._compute_n_out(cfg, pos, avail, jnp.int32(out_cap))
        pos_after = pos + n_out * jnp.int32(L)
        consumed = jnp.minimum(pos_after // jnp.int32(M), avail)
        start = start + consumed
        pos = pos_after - consumed * jnp.int32(M)

        def compact(args):
            buf, s, f = args
            ws = jnp.minimum(s, jnp.int32(ring - cap))
            win = jax.lax.dynamic_slice(buf, (ws, 0), (cap, R))
            buf2 = jnp.concatenate(
                [win, jnp.zeros((ring - cap, R), jnp.float32)], axis=0
            )
            return buf2, s - ws, f - ws

        buffer, start, fill = jax.lax.cond(
            fill + jnp.int32(chunk + slack) > jnp.int32(ring),
            compact, lambda a: a, (buffer, start, fill),
        )
        return dict(buffer=buffer, start=start, fill=fill, pos_num=pos), None

    feed = harness(feed_body, dict(state0))

    # feed-b: the SMALL-CARRY alternative (what a fused-feed step would
    # pay instead of the ring append): copy only the ~h leftover tail
    # rows of the chunk into a small carry buffer + the dup-head copy
    # that keeps carry-resident blocks contiguous.  The contraction
    # reads the same bytes either way, so feed - feed_b is the whole
    # end-to-end saving a carry||chunk redesign could deliver.
    span = L + TAPS + 1
    h_cap = min(-(-(span + M + 64) // 8) * 8, chunk)  # leftover bound
    dup = min(-(-(2 * L + span + M + 8) // 8) * 8, chunk)  # dup-head margin

    def feed_b_body(st, chunks, j):
        carry = st["carry"]                        # [h_cap + dup, R]
        pos = st["pos_num"]
        # dup-head: chunk's first `dup` rows appended after the carry
        carry = jax.lax.dynamic_update_slice(
            carry, chunks[:dup], (h_cap, 0)
        )
        avail = jnp.int32(h_cap) + jnp.int32(chunk)
        n_out = fe._compute_n_out(cfg, pos, avail, jnp.int32(out_cap))
        pos_after = pos + n_out * jnp.int32(L)
        consumed = jnp.minimum(pos_after // jnp.int32(M), avail)
        pos = pos_after - consumed * jnp.int32(M)
        # leftover tail of the chunk -> carry start (steady state:
        # leftover < h_cap rows, a ~0.5 MB copy vs the 33.5 MB append)
        h = avail - consumed
        h_c = jnp.minimum(h, jnp.int32(h_cap))
        tail_start = jnp.maximum(jnp.int32(chunk) - h_c, 0)
        tail = jax.lax.dynamic_slice(
            chunks, (tail_start, 0), (h_cap, R)
        )  # [h_cap, R] (over-read; kernel masks by h in the real design)
        carry = jax.lax.dynamic_update_slice(carry, tail, (0, 0))
        return dict(carry=carry, pos_num=pos), None

    feed_b = harness(
        feed_b_body,
        dict(
            carry=jnp.zeros((h_cap + dup, R), jnp.float32),
            pos_num=jnp.int32(0),
        ),
    )

    # consume-only: mask + bm relayout + reduce of a fixed [out_cap, R]
    fake_out = jnp.asarray(
        rng.standard_normal((out_cap, R)), jnp.float32
    )

    def consume_body(carry, chunks, j):
        n_out = jnp.int32(out_cap - (j % 7))
        lane = jnp.arange(out_cap, dtype=jnp.int32)
        out = jnp.where((lane < n_out)[:, None], fake_out + carry, 0.0)
        out = jnp.transpose(out.reshape(out_cap, B, C), (1, 0, 2))
        return carry + jnp.max(jnp.abs(out)), None

    consume = harness(consume_body, jnp.float32(0))

    def time_fn(fn, *args, reps=4, warmup=2):
        for _ in range(warmup):
            r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps

    for name, fn in [
        ("full", full), ("feed", feed), ("feed_b", feed_b),
        ("consume", consume),
    ]:
        t = time_fn(fn, chunks)
        pr(f"{name}: {t*1e3/J:.3f} ms/step")


if __name__ == "__main__":
    main()
