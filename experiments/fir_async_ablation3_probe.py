"""Async tm fleet ablation v3: same harness as bench.py's
bench_fir_arbitrary_async (J=40 scan, rotating chunk feed, warmup=2,
device-kept accumulators), with the step body REBUILT inline so stages
can be subtracted one at a time:

  full      — production math (contract + takes + cheb + select)
  no_sel    — skip the per-stream select: out = o_0 (one take+combine)
  no_comb   — skip takes/combine entirely: out rows from y[:out_cap, 0]
  no_con    — skip the contraction: y = region broadcast (keeps feed,
              schedule, consume, compaction)

Run: python experiments/fir_async_ablation3_probe.py
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

J = 40
B, C = 256, 2
CHUNK = 2048
IN_HZ, OUT_HZ = 44100, 44101


def build_step(cfg, coeffs, max_out, mode):
    """Production async step with stage knockouts (mirrors
    make_fir_fleet_step_async_tm at out_layout='tm')."""
    L_, M_ = cfg.ratio_num, cfg.ratio_den
    taps = cfg.taps
    R = B * C
    cap = cfg.input_capacity
    out_cap = min(cfg.out_capacity, max_out)
    slack = cfg.read_slack
    ring = -(-(cap + slack + 16 * CHUNK) // 256) * 256
    d1 = fe.FARROW_DEGREE + 1
    n_shift = 3

    i = np.arange(out_cap, dtype=np.int64)
    j_np = ((i * L_) // M_).astype(np.int32)
    s_np = ((i * L_) % M_).astype(np.int32)
    p_len = int(j_np[-1]) + n_shift
    Lb = 64
    Kc = -(-p_len // Lb)
    p_pad = Kc * Lb
    s_len_c = Lb + taps - 1
    region_rows = p_pad + taps - 1
    assert region_rows <= slack

    A, _ = fe.farrow_matrix(coeffs)
    ab = np.zeros((Lb * d1, s_len_c), np.float32)
    for p in range(Lb):
        ab[p * d1 : (p + 1) * d1, p : p + taps] = A
    ab_c = jnp.asarray(ab)
    j_c = jnp.asarray(j_np)
    s_c = jnp.asarray(s_np)
    L = jnp.int32(L_)
    M = jnp.int32(M_)

    def step(state, chunks_tm, n_valid):
        buffer = state["buffer"]
        start = state["start"]
        fill = state["fill"]
        pos = state["pos_num"]
        avail = fill - start
        n_in = chunks_tm.shape[0]

        to_copy = jnp.minimum(n_valid, cap - avail)
        mask = jnp.arange(n_in, dtype=jnp.int32) < to_copy
        chunk_masked = jnp.where(mask[:, None], chunks_tm, 0.0)
        buffer = jax.lax.dynamic_update_slice(
            buffer, chunk_masked, (fill, 0)
        )
        fill = fill + to_copy
        avail = avail + to_copy

        n_out = fe._compute_n_out(cfg, jnp.max(pos), avail,
                                  jnp.int32(out_cap))
        b0 = jnp.minimum(jnp.min(pos) // M, avail)
        rel = pos - b0 * M
        base_rel = rel // M
        r = rel - base_rel * M
        wrap = (r[:, None] + s_c[None, :] >= M).astype(jnp.int32)
        shift = base_rel[:, None] + wrap
        frac = (
            r[:, None] + s_c[None, :] - M * wrap
        ).astype(jnp.float32) / jnp.float32(M_)
        u = 2.0 * frac - 1.0
        ts = [jnp.ones_like(u), u]
        for _ in range(d1 - 2):
            ts.append(2.0 * u * ts[-1] - ts[-2])
        v = jnp.stack(ts, axis=-1)

        region = jax.lax.dynamic_slice(
            buffer, (start + b0, 0), (region_rows, R)
        )
        if mode == "no_con":
            y = jnp.broadcast_to(
                region[:p_pad, None, :], (p_pad, d1, R)
            )
        else:
            segs = jnp.stack(
                [
                    jax.lax.slice_in_dim(
                        region, k * Lb, k * Lb + s_len_c, axis=0
                    )
                    for k in range(Kc)
                ],
                axis=0,
            )
            y = jnp.einsum(
                "qs,ksr->kqr", ab_c, segs,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(p_pad, d1, R)

        if mode == "no_comb" or mode == "no_con":
            out = y[:out_cap, 0, :]
        else:
            vs = jnp.transpose(v, (1, 2, 0))[:, :, :, None]
            shift_t = jnp.transpose(shift)[:, :, None]
            out = None
            n_sel = 1 if mode == "no_sel" else n_shift
            for s in range(n_sel - 1, -1, -1):
                ys = jnp.take(y, j_c + s, axis=0)
                o_s = jnp.sum(
                    ys.reshape(out_cap, d1, B, C) * vs, axis=1
                )
                out = o_s if out is None else jnp.where(
                    shift_t == s, o_s, out
                )
            out = out.reshape(out_cap, R)
        lane = jnp.arange(out_cap, dtype=jnp.int32)
        out = jnp.where((lane < n_out)[:, None], out, 0.0)

        pos_after = pos + n_out * L
        consumed = jnp.minimum(jnp.min(pos_after) // M, avail)
        start = start + consumed
        pos_new = pos_after - consumed * M

        def compact(args):
            buf, s_, f_ = args
            ws = jnp.minimum(s_, jnp.int32(ring - cap))
            win = jax.lax.dynamic_slice(buf, (ws, 0), (cap, R))
            buf2 = jnp.concatenate(
                [win, jnp.zeros((ring - cap, R), jnp.float32)], axis=0
            )
            return buf2, s_ - ws, f_ - ws

        buffer, start, fill = jax.lax.cond(
            fill + jnp.int32(CHUNK + slack) > jnp.int32(ring),
            compact,
            lambda a: a,
            (buffer, start, fill),
        )
        return (
            dict(buffer=buffer, start=start, fill=fill, pos_num=pos_new),
            out,
            to_copy,
            n_out,
        )

    return step


def run(mode):
    L_, M_ = reduce_ratio(IN_HZ, OUT_HZ)
    taps = Latency.Sample64.taps
    cfg = fe.FirConfig(channels=C, taps=taps, ratio_num=L_, ratio_den=M_)
    cutoff = fe.fir_cutoff(taps, Attenuation.Db90, IN_HZ / OUT_HZ)
    coeffs = fe.fir_coefficients(taps, Attenuation.Db90, cutoff)
    max_out = (CHUNK * M_) // L_ + 128
    step = build_step(cfg, coeffs, max_out, mode)
    rng = np.random.default_rng(0)
    phases = rng.integers(0, M_, size=B)
    state = fe.fir_fleet_init_async_tm(
        cfg, B, max_chunk=CHUNK, horizon=16, pos_num=phases
    )

    def fleet(state, chunks):
        def body(st, idx):
            st, out, consumed, produced = step(
                st, chunks[idx], jnp.int32(CHUNK)
            )
            return st, (produced * B, jnp.max(jnp.abs(out)))

        idxs = jnp.arange(J, dtype=jnp.int32) % 8
        state, (produced, peaks) = jax.lax.scan(body, state, idxs)
        return state, jnp.sum(produced), jnp.max(peaks)

    fleet = jax.jit(fleet, donate_argnums=0)
    chunks = jnp.asarray(
        rng.standard_normal((8, CHUNK, B * C)), jnp.float32
    )
    for _ in range(2):
        state, produced, peak = fleet(state, chunks)
    jax.block_until_ready(peak)
    parts = []
    t0 = time.perf_counter()
    for _ in range(5):
        state, produced, peak = fleet(state, chunks)
        parts.append(produced)
    jax.block_until_ready(peak)
    dt = time.perf_counter() - t0
    msps = sum(int(p) for p in parts) * C / dt / 1e6
    print(f"{mode:8s} {dt / (5 * J) * 1e3:7.3f} ms/step   {msps:7.0f} Msps")


if __name__ == "__main__":
    for mode in ("full", "no_sel", "no_comb", "no_con"):
        run(mode)
