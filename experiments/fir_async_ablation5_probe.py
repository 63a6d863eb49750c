"""Async tm fleet combine-rewrite candidates (v5).

ablation4 measured: full 0.699 -> fusedA 0.576 ms (base_rel rolled into
the region read + single-expression wrap-only combine).  v5 stacks two
more structural cuts on top of fusedA:

  fusedA  — anchor (ablation4 winner)
  fusedC  — fusedA with the Chebyshev combine LOOP-ACCUMULATED per
            degree in [N, B] native layout: no [B, N, d1] v stack, no
            transposes (~36 MB/step of avoidable traffic); the per-d
            y takes/where stay inside one accumulation chain
  fusedD  — fusedC with the banded contraction done by
            dma_banded_contract on the (materialized) shifted region —
            replaces the [Kc, s_len, R] segs stack (~27 MB/step)
            with in-kernel double-buffered DMA reads

Run: python experiments/fir_async_ablation5_probe.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from resampler_tpu.engine import fir as fe
from resampler_tpu.ops.fir_dma_kernel import dma_banded_contract
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

    i = np.arange(out_cap, dtype=np.int64)
    j_np = ((i * L_) // M_).astype(np.int32)
    s_np = ((i * L_) % M_).astype(np.int32)
    p_len = int(j_np[-1]) + 2
    Lb = 64
    Kc = -(-p_len // Lb)
    p_pad = Kc * Lb
    s_len_c = Lb + taps - 1
    region_rows = p_pad + taps - 1
    assert region_rows + SKEW <= slack, (region_rows, slack)

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

        # region with base_rel rolled in (per-lane row shift)
        reg = jax.lax.dynamic_slice(
            buffer, (start + b0, 0), (region_rows + SKEW, R)
        )
        base_lane = jnp.repeat(base_rel, C)              # [R]
        region = reg[:region_rows]
        for sk in range(1, SKEW + 1):
            region = jnp.where(
                base_lane[None, :] == sk,
                jax.lax.slice_in_dim(reg, sk, sk + region_rows, axis=0),
                region,
            )

        if mode == "fusedD":
            y = dma_banded_contract(
                region, jnp.int32(0), ab_c,
                L=Lb, M=Lb * d1, span=s_len_c, K=Kc,
            ).reshape(p_pad, d1, R)
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

        if mode == "fusedA":
            wrap = (r[:, None] + s_c[None, :] >= M).astype(jnp.int32)
            frac = (
                r[:, None] + s_c[None, :] - M * wrap
            ).astype(jnp.float32) / jnp.float32(M_)
            u = 2.0 * frac - 1.0
            ts = [jnp.ones_like(u), u]
            for _ in range(d1 - 2):
                ts.append(2.0 * u * ts[-1] - ts[-2])
            v = jnp.stack(ts, axis=-1)                  # [B, N, d1]
            vs = jnp.transpose(v, (1, 2, 0))[:, :, :, None]
            wrap_t = jnp.transpose(wrap)[:, None, :, None]
            y0 = jnp.take(y, j_c, axis=0).reshape(out_cap, d1, B, C)
            y1 = jnp.take(y, j_c + 1, axis=0).reshape(out_cap, d1, B, C)
            out = jnp.sum(jnp.where(wrap_t == 1, y1, y0) * vs, axis=1)
            out = out.reshape(out_cap, R)
        else:  # fusedC / fusedD: loop-accumulated combine, [N, B] native
            wrap_nb = (s_c[:, None] + r[None, :] >= M)   # [N, B] bool
            frac = (
                s_c[:, None] + r[None, :]
                - M * wrap_nb.astype(jnp.int32)
            ).astype(jnp.float32) / jnp.float32(M_)
            u = 2.0 * frac - 1.0                         # [N, B]
            wrap_e = wrap_nb[:, :, None]                 # [N, B, 1]
            y0 = jnp.take(y, j_c, axis=0).reshape(out_cap, d1, B, C)
            y1 = jnp.take(y, j_c + 1, axis=0).reshape(out_cap, d1, B, C)
            t_prev = jnp.ones_like(u)
            t_cur = u
            acc = jnp.where(wrap_e, y1[:, 0], y0[:, 0])  # T_0 = 1
            for d in range(1, d1):
                ysel = jnp.where(wrap_e, y1[:, d], y0[:, d])
                acc = acc + t_cur[:, :, None] * ysel
                t_prev, t_cur = t_cur, 2.0 * u * t_cur - t_prev
            out = acc.reshape(out_cap, R)
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
    step_ref = build_step(cfg, coeffs, max_out, "fusedA")
    step_new = build_step(cfg, coeffs, max_out, mode)
    rng = np.random.default_rng(0)
    phases = rng.integers(0, cfg.ratio_den, size=B)
    state = fe.fir_fleet_init_async_tm(
        cfg, B, max_chunk=CHUNK, horizon=16, pos_num=phases
    )
    sr = sn = state
    worst = 0.0
    for k in range(4):
        chunk = jnp.asarray(
            rng.standard_normal((CHUNK, B * C)), jnp.float32
        )
        sr, o_r, _, n_r = jax.jit(step_ref)(sr, chunk, jnp.int32(CHUNK))
        sn, o_n, _, n_n = jax.jit(step_new)(sn, chunk, jnp.int32(CHUNK))
        assert int(n_r) == int(n_n), (int(n_r), int(n_n))
        d = float(jnp.max(jnp.abs(o_r - o_n)))
        worst = max(worst, d)
    print(f"  {mode}: worst |diff| vs fusedA over 4 steps = {worst:.3e}")


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
    print("correctness (vs fusedA):")
    for mode in ("fusedC", "fusedD"):
        correctness(mode)
    print("timing:")
    for mode in ("fusedA", "fusedC", "fusedD"):
        run(mode)
