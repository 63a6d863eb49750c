"""Async tm fleet combine-rewrite candidates (v4).

ablation3 measured the production step at 0.698 ms: select 0.221 +
base 0.190 + contraction 0.184 + combine 0.103 — the 3-pass
take/combine/select is traffic-bound.  Mosaic's dynamic_gather crashes
the backend compiler on this chip (experiments/mosaic_gather_probe.py),
so the rewrites below stay in XLA and attack the traffic structurally:

  full    — production math (anchor; ablation3 measured 0.698 ms)
  fusedA  — (1) base_rel rolled into the REGION read (a skew+1-way
            where over the small [region_rows, R] slice instead of the
            big [N, d1, R] outputs) so the combine selects over the
            wrap bit only (2 candidates, not 3); (2) the take/combine/
            select emitted as ONE expression (no materialized o_s —
            XLA fuses the static-index gathers and the where into the
            reduction loop)
  fusedB  — fusedA but additive masked-weight form (no where on the
            y-sized tensors: out = sum_d w0_d*y0 + w1_d*y1)
  highA   — fusedA with the contraction at precision HIGH (3-pass
            bf16x3) instead of HIGHEST (6-pass)
  a32A    — fusedA with an Lb=32 banded atlas (s_len 159 vs 191:
            ~0.83x contraction FLOPs at skinnier dot shapes)

Each variant is correctness-checked against the production step on one
step from an identical warm state before timing.

Run: python experiments/fir_async_ablation4_probe.py
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
SKEW = 1


def build_step(cfg, coeffs, max_out, mode):
    L_, M_ = cfg.ratio_num, cfg.ratio_den
    taps = cfg.taps
    R = B * C
    cap = cfg.input_capacity
    out_cap = min(cfg.out_capacity, max_out)
    slack = cfg.read_slack
    ring = -(-(cap + slack + 16 * CHUNK) // 256) * 256
    d1 = fe.FARROW_DEGREE + 1
    n_shift = SKEW + 2
    fused = mode in ("fusedA", "fusedB", "highA", "a32A")
    precision = (
        jax.lax.Precision.HIGH if mode == "highA"
        else jax.lax.Precision.HIGHEST
    )

    i = np.arange(out_cap, dtype=np.int64)
    j_np = ((i * L_) // M_).astype(np.int32)
    s_np = ((i * L_) % M_).astype(np.int32)
    p_len = int(j_np[-1]) + (2 if fused else n_shift)
    Lb = 32 if mode == "a32A" else 64
    Kc = -(-p_len // Lb)
    p_pad = Kc * Lb
    s_len_c = Lb + taps - 1
    region_rows = p_pad + taps - 1
    # the fused form shifts the region down by up to SKEW rows
    assert region_rows + (SKEW if fused else 0) <= slack, (
        region_rows, slack
    )

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
        base_rel = rel // M                     # [B] in [0, SKEW]
        r = rel - base_rel * M                  # [B] in [0, M)
        wrap = (r[:, None] + s_c[None, :] >= M).astype(jnp.int32)
        frac = (
            r[:, None] + s_c[None, :] - M * wrap
        ).astype(jnp.float32) / jnp.float32(M_)
        u = 2.0 * frac - 1.0
        ts = [jnp.ones_like(u), u]
        for _ in range(d1 - 2):
            ts.append(2.0 * u * ts[-1] - ts[-2])
        v = jnp.stack(ts, axis=-1)              # [B, N, d1]

        if fused:
            # roll base_rel into the region read: per-LANE row shift on
            # the small region slice (skew+1-way where), so the combine
            # below selects on the wrap bit only
            reg = jax.lax.dynamic_slice(
                buffer, (start + b0, 0), (region_rows + SKEW, R)
            )
            base_lane = jnp.repeat(base_rel, C)          # [R]
            reg_s = reg[:region_rows]
            for sk in range(1, SKEW + 1):
                reg_s = jnp.where(
                    base_lane[None, :] == sk,
                    jax.lax.slice_in_dim(reg, sk, sk + region_rows,
                                         axis=0),
                    reg_s,
                )
            region = reg_s
        else:
            region = jax.lax.dynamic_slice(
                buffer, (start + b0, 0), (region_rows, R)
            )
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
            precision=precision,
        ).reshape(p_pad, d1, R)

        vs = jnp.transpose(v, (1, 2, 0))[:, :, :, None]  # [N, d1, B, 1]
        if fused:
            wrap_t = jnp.transpose(wrap)[:, None, :, None]  # [N,1,B,1]
            y0 = jnp.take(y, j_c, axis=0).reshape(out_cap, d1, B, C)
            y1 = jnp.take(y, j_c + 1, axis=0).reshape(out_cap, d1, B, C)
            if mode == "fusedB":
                w1 = vs * wrap_t.astype(jnp.float32)
                w0 = vs - w1
                out = jnp.sum(y0 * w0 + y1 * w1, axis=1)
            else:
                out = jnp.sum(
                    jnp.where(wrap_t == 1, y1, y0) * vs, axis=1
                )
            out = out.reshape(out_cap, R)
        else:
            shift = base_rel[:, None] + wrap
            shift_t = jnp.transpose(shift)[:, :, None]
            out = None
            for s in range(n_shift - 1, -1, -1):
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


def make_parts():
    L_, M_ = reduce_ratio(IN_HZ, OUT_HZ)
    taps = Latency.Sample64.taps
    cfg = fe.FirConfig(channels=C, taps=taps, ratio_num=L_, ratio_den=M_)
    cutoff = fe.fir_cutoff(taps, Attenuation.Db90, IN_HZ / OUT_HZ)
    coeffs = fe.fir_coefficients(taps, Attenuation.Db90, cutoff)
    max_out = (CHUNK * M_) // L_ + 128
    return cfg, coeffs, max_out


def correctness(mode):
    cfg, coeffs, max_out = make_parts()
    step_ref = build_step(cfg, coeffs, max_out, "full")
    step_new = build_step(cfg, coeffs, max_out, mode)
    rng = np.random.default_rng(0)
    phases = rng.integers(0, cfg.ratio_den, size=B)
    state = fe.fir_fleet_init_async_tm(
        cfg, B, max_chunk=CHUNK, horizon=16, pos_num=phases
    )
    sr = sn = state
    worst = 0.0
    for k in range(4):  # a few steps so skews/wraps are exercised
        chunk = jnp.asarray(
            rng.standard_normal((CHUNK, B * C)), jnp.float32
        )
        sr, o_r, _, n_r = jax.jit(step_ref)(sr, chunk, jnp.int32(CHUNK))
        sn, o_n, _, n_n = jax.jit(step_new)(sn, chunk, jnp.int32(CHUNK))
        assert int(n_r) == int(n_n), (int(n_r), int(n_n))
        d = float(jnp.max(jnp.abs(o_r - o_n)))
        worst = max(worst, d)
    print(f"  {mode}: worst |diff| vs full over 4 steps = {worst:.3e}")
    return worst


def run(mode):
    cfg, coeffs, max_out = make_parts()
    step = build_step(cfg, coeffs, max_out, mode)
    rng = np.random.default_rng(0)
    phases = rng.integers(0, cfg.ratio_den, size=B)
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
    print("correctness (vs production math):")
    for mode in ("fusedA", "fusedB", "highA", "a32A"):
        correctness(mode)
    print("timing:")
    for mode in ("full", "fusedA", "fusedB", "highA", "a32A"):
        run(mode)
