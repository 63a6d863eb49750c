"""Time-major FIR fleet step: where does the non-MXU time go? (round 2)

fir_precision_probe.py established the einsum runs at ~88% MXU util and
is only ~25% of the step (HIGHEST); the rest is HBM on intermediates.
Candidate cuts, measured cumulatively at the bench config:

  base      : production step (HIGHEST)
  nomask    : drop the `where(mask, chunks, 0)` pre-DUS zeroing (33.5 MB
              round trip).  Rows beyond to_copy land ABOVE fill and are
              always fully overwritten by the next append before fill
              passes them (inductive argument in the step docstring), so
              zeroing them is redundant.
  tmout     : skip the [K*M, R] -> [B, out_cap, C] output transpose and
              return time-major [out_cap, R] (73 MB round trip at the
              bench shape).
  noseg     : contract the n_blk region blocks with separate slice
              einsums summed, instead of materializing the duplicated
              segs concat (135 MB round trip).

Run: python experiments/fir_tm_opt_probe.py
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


def make_variant_step(cfg, coeffs, B, max_chunk, *, nomask, tmout, noseg,
                      horizon=16):
    """A copy of make_fir_fleet_step_sync_tm's dataflow with the three
    candidate cuts toggleable (kept in the probe, not production, until
    measured)."""
    L, M, taps, C = cfg.ratio_num, cfg.ratio_den, cfg.taps, cfg.channels
    R = B * C
    cap = cfg.input_capacity
    span = L + taps + 1
    K = -(-cfg.out_capacity // M)
    out_cap = cfg.out_capacity
    slack = cfg.read_slack
    ring = -(-(cap + slack + horizon * max_chunk) // 256) * 256
    n_blk = 1 + -(-(span - L) // L)
    s_len = n_blk * L
    region_rows = (K + n_blk) * L
    a2 = jnp.asarray(fir_engine._sync_atlas(cfg, coeffs))
    l_inv = pow(L, -1, M) if M > 1 else 0

    def step(state, chunks_tm, n_valid):
        chunks_tm = chunks_tm.astype(jnp.float32)
        n_in, _ = chunks_tm.shape
        n_valid = jnp.minimum(jnp.asarray(n_valid, jnp.int32), n_in)
        buffer, start, fill, pos_num = (
            state["buffer"], state["start"], state["fill"], state["pos_num"]
        )
        avail = fill - start
        to_copy = jnp.minimum(n_valid, cap - avail)
        if nomask:
            payload = chunks_tm
        else:
            mask = jnp.arange(n_in, dtype=jnp.int32) < to_copy
            payload = jnp.where(mask[:, None], chunks_tm, 0.0)
        buffer = jax.lax.dynamic_update_slice(buffer, payload, (fill, 0))
        fill = fill + to_copy
        avail = avail + to_copy

        n_out = fir_engine._compute_n_out(cfg, pos_num, avail, jnp.int32(out_cap))
        d_min = pos_num // jnp.int32(M)
        r = pos_num - d_min * jnp.int32(M)
        i0 = (r * jnp.int32(l_inv)) % jnp.int32(M)
        c0 = (i0 * jnp.int32(L)) // jnp.int32(M)
        a = jax.lax.dynamic_slice(a2, (i0, c0), (M, span))
        a_pad = jnp.pad(a, ((0, 0), (0, s_len - span)))

        base = start + d_min
        region = jax.lax.dynamic_slice(buffer, (base, 0), (region_rows, R))
        blocks = region.reshape(K + n_blk, L, R)
        if noseg:
            out = None
            for bb in range(n_blk):
                part = jnp.einsum(
                    "js,ksr->kjr",
                    a_pad[:, bb * L : (bb + 1) * L],
                    jax.lax.slice_in_dim(blocks, bb, bb + K, axis=0),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                out = part if out is None else out + part
        else:
            segs = jnp.concatenate(
                [blocks[bb : bb + K] for bb in range(n_blk)], axis=1
            )
            out = jnp.einsum(
                "js,ksr->kjr", a_pad, segs,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        out = out.reshape(K * M, R)[:out_cap]
        lane = jnp.arange(out_cap, dtype=jnp.int32)
        out = jnp.where((lane < n_out)[:, None], out, 0.0)
        if not tmout:
            out = jnp.transpose(out.reshape(out_cap, B, C), (1, 0, 2))

        pos_after = pos_num + n_out * jnp.int32(L)
        consumed = jnp.minimum(pos_after // jnp.int32(M), avail)
        start = start + consumed
        pos_num = pos_after - consumed * jnp.int32(M)

        def compact(args):
            buf, s, f = args
            ws = jnp.minimum(s, jnp.int32(ring - cap))
            win = jax.lax.dynamic_slice(buf, (ws, 0), (cap, R))
            buf2 = jnp.concatenate(
                [win, jnp.zeros((ring - cap, R), jnp.float32)], axis=0
            )
            return buf2, s - ws, f - ws

        buffer, start, fill = jax.lax.cond(
            fill + jnp.int32(max_chunk + slack) > jnp.int32(ring),
            compact, lambda args: args, (buffer, start, fill),
        )
        return (
            {"buffer": buffer, "start": start, "fill": fill,
             "pos_num": pos_num},
            out, to_copy, n_out,
        )

    return step


def build_cfg():
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
    return cfg, coeffs


def equivalence(nomask, tmout, noseg):
    """Variant equals production across random partial chunks."""
    cfg, coeffs = build_cfg()
    B, n_in = 3, 300
    ref = jax.jit(fir_engine.make_fir_fleet_step_sync_tm(
        cfg, coeffs, B, max_chunk=n_in, horizon=3))
    var = jax.jit(make_variant_step(
        cfg, coeffs, B, n_in, nomask=nomask, tmout=tmout, noseg=noseg,
        horizon=3))
    sa = fir_engine.fir_fleet_init_sync_tm(cfg, B, max_chunk=n_in, horizon=3)
    sb = {k: v for k, v in sa.items()}
    rng = np.random.default_rng(5)
    C = cfg.channels
    for _ in range(32):
        ch = rng.standard_normal((n_in, B * C)).astype(np.float32)
        nv = jnp.int32(int(rng.integers(0, n_in + 1)))
        sa, oa, ca, pa = ref(sa, jnp.asarray(ch), nv)
        sb, ob, cb, pb = var(sb, jnp.asarray(ch), nv)
        assert int(ca) == int(cb) and int(pa) == int(pb)
        if tmout:
            ob = jnp.transpose(
                ob.reshape(cfg.out_capacity, B, C), (1, 0, 2)
            )
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=0)
        np.testing.assert_allclose(
            np.asarray(sa["buffer"][: int(sa["fill"])]),
            np.asarray(sb["buffer"][: int(sb["fill"])]), atol=0,
        )
    return True


def bench(nomask, tmout, noseg, dispatches=5, warmup=2, B=1024, chunk=4096):
    cfg, coeffs = build_cfg()
    C = cfg.channels
    step = make_variant_step(cfg, coeffs, B, chunk,
                             nomask=nomask, tmout=tmout, noseg=noseg)
    state = fir_engine.fir_fleet_init_sync_tm(cfg, B, max_chunk=chunk)

    def fleet(state, chunks):
        def body(st, _):
            st, out, consumed, produced = step(st, chunks, jnp.int32(chunk))
            return st, (produced * B, jnp.max(jnp.abs(out)))
        state, (produced, peaks) = jax.lax.scan(
            body, state, None, length=SCAN_LEN)
        return state, jnp.sum(produced), jnp.max(peaks)

    fleet = jax.jit(fleet, donate_argnums=0)
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.standard_normal((chunk, B * C)), jnp.float32)
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


def main():
    print("backend:", jax.default_backend(), flush=True)
    for nm, tm, ns in [(False, False, False), (True, False, False),
                       (True, True, False), (True, True, True),
                       (False, False, True)]:
        tag = f"nomask={int(nm)} tmout={int(tm)} noseg={int(ns)}"
        if jax.default_backend() != "tpu":
            equivalence(nm, tm, ns)
            print(f"{tag}: equivalent", flush=True)
            continue
        equivalence(nm, tm, ns)
        msps = bench(nm, tm, ns)
        print(f"{tag}: {msps:8.1f} Msps ({msps/137.0:6.2f}x ref)", flush=True)


if __name__ == "__main__":
    main()
