"""Time-major ring sync fleet: buffer [ring, B*C] (frames MAJOR), append
via dynamic_update_slice at a major-axis offset (the true KV-cache
pattern), consume = advance a scalar, compaction via cond every ~H steps.

The minor-axis ring measured 2.3x slower than the slide (XLA copies the
buffer for lane-offset DUS); this probe tests whether the major-axis DUS
is in-place and whether the transposed matmul holds up.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from resampler_tpu.engine import fir as fe
from resampler_tpu.types import Attenuation, Latency, reduce_ratio

B, C, CHUNK, SCAN = 1024, 2, 4096, 40
R = B * C
L, M = reduce_ratio(44100, 48000)
cfg = fe.FirConfig(channels=C, taps=Latency.Sample64.taps, ratio_num=L,
                   ratio_den=M)
taps = cfg.taps
cutoff = fe.fir_cutoff(taps, Attenuation.Db90, 44100 / 48000)
coeffs = fe.fir_coefficients(taps, Attenuation.Db90, cutoff)

cap = cfg.input_capacity
span = L + taps + 1
K = -(-cfg.out_capacity // M)
out_cap = cfg.out_capacity
n_blk = 1 + -(-(span - L) // L)
s_len = n_blk * L
region_rows = (K + n_blk) * L
slack = cfg.read_slack


def make_ring_tm(horizon):
    ring = -(-(cap + slack + horizon * CHUNK) // 256) * 256

    table = np.asarray(coeffs, np.float32)
    rho = np.arange(M, dtype=np.int64)
    pf = rho * cfg.phases
    p1 = pf // M
    p2 = np.minimum(p1 + 1, cfg.phases - 1)
    fr = ((pf - p1 * M) / M).astype(np.float32)[:, None]
    w_resid = (1.0 - fr) * table[p1] + fr * table[p2]
    i = np.arange(2 * M, dtype=np.int64)
    a2_np = np.zeros((2 * M, 2 * L + taps + 1), np.float32)
    for ii in range(2 * M):
        off = int((i[ii] * L) // M)
        a2_np[ii, off : off + taps] = w_resid[int((i[ii] * L) % M)]
    a2 = jnp.asarray(a2_np)
    l_inv = pow(L, -1, M)

    def init():
        return dict(
            buffer=jnp.zeros((ring, R), jnp.float32),
            start=jnp.zeros((), jnp.int32),
            fill=jnp.zeros((), jnp.int32),
            pos_num=jnp.zeros((), jnp.int32),
        )

    def step(state, chunks_tm, n_valid):
        # chunks_tm: [CHUNK, R] time-major
        buffer = state["buffer"]
        start = state["start"]
        fill = state["fill"]
        pos_num = state["pos_num"]
        avail = fill - start

        to_copy = jnp.minimum(n_valid, cap - avail)
        mask = jnp.arange(CHUNK, dtype=jnp.int32) < to_copy
        chunk_masked = jnp.where(mask[:, None], chunks_tm, 0.0)
        buffer = jax.lax.dynamic_update_slice(buffer, chunk_masked, (fill, 0))
        fill = fill + to_copy
        avail = avail + to_copy

        n_out = fe._compute_n_out(cfg, pos_num, avail, jnp.int32(out_cap))
        d_min = pos_num // jnp.int32(M)
        r = pos_num - d_min * jnp.int32(M)
        i0 = (r * jnp.int32(l_inv)) % jnp.int32(M)
        c0 = (i0 * jnp.int32(L)) // jnp.int32(M)
        a = jax.lax.dynamic_slice(a2, (i0, c0), (M, span))
        a_pad = jnp.pad(a, ((0, 0), (0, s_len - span)))

        base = start + d_min
        region = jax.lax.dynamic_slice(buffer, (base, 0), (region_rows, R))
        blocks = region.reshape(K + n_blk, L, R)
        segs = jnp.concatenate(
            [blocks[bb : bb + K] for bb in range(n_blk)], axis=1
        )  # [K, s_len, R]
        out = jnp.einsum(
            "js,ksr->kjr",
            a_pad,
            segs,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [K, M, R]
        out = out.reshape(K * M, R)[:out_cap]
        lane = jnp.arange(out_cap, dtype=jnp.int32)
        out = jnp.where((lane < n_out)[:, None], out, 0.0)
        # [out_cap, B, C] -> [B, out_cap, C]
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
            fill + jnp.int32(CHUNK + slack) > jnp.int32(ring),
            compact,
            lambda args: args,
            (buffer, start, fill),
        )
        return (
            dict(buffer=buffer, start=start, fill=fill, pos_num=pos_num),
            out,
            to_copy,
            n_out,
        )

    return init, step


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # ---- correctness vs the slide sync step (device, small) ----
    global B, R, CHUNK
    B_s, CHUNK_s = 8, 512
    # (reuse module-level shapes by rebinding globals for the probe)
    B, R, CHUNK = B_s, B_s * C, CHUNK_s
    init, ring_step = make_ring_tm(horizon=3)
    xla = jax.jit(fe.make_fir_fleet_step_sync(cfg, coeffs, B_s, channel_major=True))
    ring_step_j = jax.jit(ring_step)
    sa = fe.fir_fleet_init_sync(cfg, B_s)
    sb = init()
    ok = True
    worst = 0.0
    for it in range(30):
        ch = rng.standard_normal((B_s, C, CHUNK_s)).astype(np.float32)
        nv = jnp.int32(int(rng.integers(0, CHUNK_s + 1)))
        sa, oa, ca, pa = xla(sa, jnp.asarray(ch), nv)
        ch_tm = jnp.asarray(
            np.ascontiguousarray(ch.reshape(B_s * C, CHUNK_s).T)
        )
        sb, ob, cb, pb = ring_step_j(sb, ch_tm, nv)
        ok &= int(ca) == int(cb) and int(pa) == int(pb)
        worst = max(worst, float(jnp.abs(oa - ob).max()))
    print(f"correctness: ok={ok} out_maxdiff={worst:.2e}", flush=True)

    # ---- throughput, headline ----
    B, CHUNK = 1024, 4096
    R = B * C
    for H in (4, 8):
        init, ring_step = make_ring_tm(horizon=H)

        def fleet(state, chunks_tm):
            def body(st, _):
                st, out, cons, prod = ring_step(st, chunks_tm, jnp.int32(CHUNK))
                return st, (prod, jnp.max(jnp.abs(out)))
            state, (prods, peaks) = jax.lax.scan(body, state, None, length=SCAN)
            return state, jnp.sum(prods * B), jnp.max(peaks)

        fleet = jax.jit(fleet, donate_argnums=0)
        chunks_tm = jnp.asarray(
            rng.standard_normal((CHUNK, R)), jnp.float32
        )
        st = init()
        for _ in range(2):
            st, prod, peak = fleet(st, chunks_tm)
        jax.block_until_ready(peak)
        t0 = time.perf_counter()
        parts = []
        for _ in range(5):
            st, prod, peak = fleet(st, chunks_tm)
            parts.append(prod)
        jax.block_until_ready(peak)
        dt = time.perf_counter() - t0
        msps = sum(int(p) for p in parts) * C / dt / 1e6
        print(f"time-major ring H={H}: {msps:8.1f} Msps ({msps/137.0:6.1f}x ref)",
              flush=True)


if __name__ == "__main__":
    main()
