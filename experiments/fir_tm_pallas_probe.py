"""Pallas fused contraction for the time-major FIR fleet step (round 2).

The XLA tm step at DEFAULT einsum precision measures 14.6 Gsps — the
einsum is ~25% of the step; the rest is HBM on intermediates, dominated
by the segs concat (~135 MB round trip) and the out mask/transpose
(~110 MB).  This kernel fuses region->windows->banded-dot->mask->store
into one pass over VMEM:

  grid over lane tiles; per tile load region [region_rows, tl],
  for k in range(K): acc = dot(a_pad [M, s_len], win_k [s_len, tl])
  mask rows >= n_out, store [K*M, tl] time-major.

Variants: per-k dots on static sublane slices ("kdots") vs a stacked
[K, s_len, tl] window tensor with a fori batched dot ("stack").
Output stays TIME-MAJOR [K*M, R] (the fleet feed is already
time-major; the [B, out_cap, C] transpose is a consumer choice).

Run: python experiments/fir_tm_pallas_probe.py
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).parent.parent))

from resampler_tpu.engine import fir as fe
from resampler_tpu.types import Attenuation, Latency, reduce_ratio

SCAN_LEN = 40


def _kernel(nout_ref, a_ref, region_ref, o_ref, *, K, L, M, s_len, variant):
    a = a_ref[:]  # [M, s_len]
    n_out = nout_ref[0]
    for k in range(K):
        win = region_ref[k * L : k * L + s_len, :]  # [s_len, tl]
        acc = jax.lax.dot_general(
            a, win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [M, tl]
        rows = k * M + jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
        acc = jnp.where(rows < n_out, acc, 0.0)
        o_ref[k * M : (k + 1) * M, :] = acc


def make_pallas_contract(cfg, tile_l, variant="kdots"):
    L, M, taps = cfg.ratio_num, cfg.ratio_den, cfg.taps
    span = L + taps + 1
    n_blk = 1 + -(-(span - L) // L)
    s_len = n_blk * L
    K = -(-cfg.out_capacity // M)
    region_rows = (K + n_blk) * L
    out_rows = K * M

    kern = functools.partial(
        _kernel, K=K, L=L, M=M, s_len=s_len, variant=variant
    )

    @functools.partial(jax.jit, static_argnames=())
    def contract(n_out, a_pad, region):
        R = region.shape[1]
        grid = (R // tile_l,)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((M, s_len), lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((region_rows, tile_l), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((out_rows, tile_l), lambda i, *_: (0, i),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((out_rows, R), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=6 * 2 * K * M * s_len * R,
                bytes_accessed=region_rows * R * 4 + out_rows * R * 4,
                transcendentals=0,
            ),
        )(jnp.asarray([n_out], jnp.int32), a_pad, region)

    return contract, K, s_len, region_rows


def make_step_pallas(cfg, coeffs, B, max_chunk, tile_l=128, horizon=16):
    """Time-major step with the Pallas contraction; append/consume/compact
    stay in XLA (the DUS and cond are already efficient there)."""
    L, M, taps, C = cfg.ratio_num, cfg.ratio_den, cfg.taps, cfg.channels
    R = B * C
    cap = cfg.input_capacity
    out_cap = cfg.out_capacity
    slack = cfg.read_slack
    ring = -(-(cap + slack + horizon * max_chunk) // 256) * 256
    a2 = jnp.asarray(fe._sync_atlas(cfg, coeffs))
    l_inv = pow(L, -1, M) if M > 1 else 0
    span = L + taps + 1
    contract, K, s_len, region_rows = make_pallas_contract(cfg, tile_l)

    def step(state, chunks_tm, n_valid):
        chunks_tm = chunks_tm.astype(jnp.float32)
        n_in, _ = chunks_tm.shape
        n_valid = jnp.minimum(jnp.asarray(n_valid, jnp.int32), n_in)
        buffer, start, fill, pos_num = (
            state["buffer"], state["start"], state["fill"], state["pos_num"]
        )
        avail = fill - start
        to_copy = jnp.minimum(n_valid, cap - avail)
        # nomask append (rows beyond to_copy land above fill and are
        # always overwritten before fill passes them)
        buffer = jax.lax.dynamic_update_slice(buffer, chunks_tm, (fill, 0))
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
        out = contract(n_out, a_pad, region)[:out_cap]  # [out_cap, R] tm

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
    cfg = fe.FirConfig(
        channels=C, taps=Latency.Sample64.taps, ratio_num=L, ratio_den=M
    )
    cutoff = fe.fir_cutoff(
        Latency.Sample64.taps, Attenuation.Db90, 44100 / 48000
    )
    coeffs = fe.fir_coefficients(
        Latency.Sample64.taps, Attenuation.Db90, cutoff
    )
    return cfg, coeffs


def equivalence(tile_l=128):
    cfg, coeffs = build_cfg()
    B, n_in = 64, 256  # R = 128 lanes = one tile
    ref = jax.jit(fe.make_fir_fleet_step_sync_tm(
        cfg, coeffs, B, max_chunk=n_in, horizon=3))
    pal = jax.jit(make_step_pallas(cfg, coeffs, B, n_in, tile_l=tile_l,
                                   horizon=3))
    sa = fe.fir_fleet_init_sync_tm(cfg, B, max_chunk=n_in, horizon=3)
    sb = dict(sa)
    rng = np.random.default_rng(5)
    C = cfg.channels
    for it in range(24):
        ch = rng.standard_normal((n_in, B * C)).astype(np.float32)
        nv = jnp.int32(int(rng.integers(0, n_in + 1)))
        sa, oa, ca, pa = ref(sa, jnp.asarray(ch), nv)
        sb, ob, cb, pb = pal(sb, jnp.asarray(ch), nv)
        assert int(ca) == int(cb) and int(pa) == int(pb), it
        # tm-out vs [B, out_cap, C]
        ob_t = jnp.transpose(
            ob.reshape(cfg.out_capacity, B, C), (1, 0, 2)
        )
        np.testing.assert_allclose(
            np.asarray(oa), np.asarray(ob_t), atol=1e-5
        )
    return True


def bench(kind, tile_l=128, dispatches=5, warmup=2, B=1024, chunk=4096):
    cfg, coeffs = build_cfg()
    C = cfg.channels
    if kind == "xla":
        step0 = fe.make_fir_fleet_step_sync_tm(
            cfg, coeffs, B, max_chunk=chunk, horizon=16)
        step = step0
    else:
        step = make_step_pallas(cfg, coeffs, B, chunk, tile_l=tile_l)
    state = fe.fir_fleet_init_sync_tm(cfg, B, max_chunk=chunk, horizon=16)

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
    equivalence()
    print("equivalence OK", flush=True)
    if jax.default_backend() != "tpu":
        return
    print("xla :", round(bench("xla"), 1), "Msps", flush=True)
    for tl in (128, 256):
        try:
            msps = bench("pallas", tile_l=tl)
            print(f"pallas tl={tl}: {msps:8.1f} Msps "
                  f"({msps/137.0:6.2f}x ref)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pallas tl={tl}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
