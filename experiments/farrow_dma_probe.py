"""Probe: manual-DMA region access for the sync FARROW contraction.

The farrow tm contraction (engine/fir.py _contract_farrow) materializes
``region`` + K stacked static block slices ``region_blk [K, w_blk, R]``
(~35 + ~100 MB/step at the 44100->44101 bench config) before the blocked
matmul.  Same lever as the periodic DMA kernel (+13.7%), with a twist
that makes it FREE to align: the per-block DMA must start at an
8-aligned row, and the remainder ``rem_k = (base + block_base_k) % 8``
can be folded into the POSITIONING MATMUL itself — the one-hot local
offset becomes ``jl + rem_k``, so ``Ablk`` comes out pre-shifted for its
block's aligned read.  Costs only ~8 extra columns of ``n_jl``/``w_blk``
(~+12% positioning FLOPs, +4% contraction FLOPs), no extra weight
materialization.

Risk: K ~ 63 small dots ([q=64, ~208] x [~208, R]) per call — the
small-dot overhead class.  ``group`` fuses G consecutive blocks into one
dot by DMA-ing their union span (blocks overlap, so the union is barely
wider) — G=2/4 trade a few wasted columns for half/quarter the dots.

Usage: python experiments/farrow_dma_probe.py
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from resampler_tpu.engine import fir as fe  # noqa: E402
from resampler_tpu.types import Attenuation, Latency, reduce_ratio  # noqa: E402

IN_HZ, OUT_HZ = 44100, 44101
TAPS = Latency.Sample64.taps


def build(B=1024, C=2):
    L, M = reduce_ratio(IN_HZ, OUT_HZ)
    cfg = fe.FirConfig(channels=C, taps=TAPS, ratio_num=L, ratio_den=M)
    cutoff = fe.fir_cutoff(TAPS, Attenuation.Db90, IN_HZ / OUT_HZ)
    coeffs = fe.fir_coefficients(TAPS, Attenuation.Db90, cutoff)
    fp = fe._farrow_tm_plan(cfg, coeffs)
    R = B * C
    ring = -(-(cfg.input_capacity + cfg.read_slack + 16 * 4096) // 256) * 256
    return cfg, coeffs, fp, R, ring


def make_xla(cfg, fp, R):
    """The production XLA farrow contraction, lifted from
    engine/fir.py _contract_farrow (kept in sync manually)."""
    M_ = cfg.ratio_den
    j_loc_c = jnp.asarray(fp["j_loc"])
    s_c = jnp.asarray(fp["s_pad"].astype(np.int32))
    ashift2_c = jnp.asarray(fp["ashift2"])
    q, K = fp["q"], fp["K"]
    n_jl, w_blk, d1 = fp["n_jl"], fp["w_blk"], fp["d1"]
    region_rows = fp["region_rows"]
    out_cap = cfg.out_capacity

    def contract(buffer, base, r):
        region = jax.lax.dynamic_slice(buffer, (base, 0), (region_rows, R))
        region_blk = jnp.stack(
            [
                jax.lax.slice_in_dim(region, int(b), int(b) + w_blk, axis=0)
                for b in fp["block_base"]
            ],
            axis=0,
        )
        wrap = (r + s_c >= jnp.int32(M_)).astype(jnp.int32)
        frac = (r + s_c - jnp.int32(M_) * wrap).astype(jnp.float32) / float(M_)
        u = 2.0 * frac - 1.0
        ts = [jnp.ones_like(u), u]
        for _ in range(d1 - 2):
            ts.append(2.0 * u * ts[-1] - ts[-2])
        t_cheb = jnp.stack(ts, axis=-1)
        jl = j_loc_c + wrap
        onehot = (
            jl[:, :, None] == jnp.arange(n_jl, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.float32)
        p_mat = (t_cheb[:, :, :, None] * onehot[:, :, None, :]).reshape(
            fp["n_pad"], d1 * n_jl
        )
        a_blk = jnp.einsum(
            "np,pw->nw", p_mat, ashift2_c,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(K, q, w_blk)
        out = jnp.einsum(
            "kqw,kwr->kqr", a_blk, region_blk,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.reshape(fp["n_pad"], R)[:out_cap]

    return contract


def _dma_kernel(base_ref, ablk_ref, buf_ref, o_ref, seg_ref, sem_ref, *,
                K, w_dma):
    k = pl.program_id(0)
    base = base_ref[0]

    def get_dma(slot, kk):
        start = base + _bb_lookup(kk)
        aligned = (start // 8) * 8
        return pltpu.make_async_copy(
            buf_ref.at[pl.ds(aligned, w_dma), :],
            seg_ref.at[slot],
            sem_ref.at[slot],
        )

    def _bb_lookup(kk):
        # static per-block base offsets live in SMEM via the prefetch arg
        return base_ref[1 + kk]

    @pl.when(k == 0)
    def _warm():
        get_dma(0, 0).start()

    @pl.when(k + 1 < K)
    def _next():
        get_dma((k + 1) % 2, k + 1).start()

    get_dma(k % 2, k).wait()
    o_ref[0] = jax.lax.dot(
        ablk_ref[0],
        seg_ref[k % 2],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def make_dma(cfg, fp, R):
    """DMA farrow contraction: the alignment remainder is folded into the
    positioning one-hot (jl + rem_k), so Ablk is built pre-shifted for
    each block's ALIGNED read."""
    M_ = cfg.ratio_den
    q, K = fp["q"], fp["K"]
    n_jl0, w_blk0, d1 = fp["n_jl"], fp["w_blk"], fp["d1"]
    n_jl = n_jl0 + 8          # room for the per-block alignment remainder
    taps = cfg.taps
    w_blk = n_jl - 1 + taps
    w_dma = -(-w_blk // 8) * 8
    # rebuild ashift2 at the widened geometry
    from resampler_tpu.engine.fir import farrow_matrix
    coeffs = fe.fir_coefficients(
        taps, Attenuation.Db90,
        fe.fir_cutoff(taps, Attenuation.Db90, IN_HZ / OUT_HZ),
    )
    Am, _ = farrow_matrix(coeffs, fe.FARROW_DEGREE)
    ashift2 = np.zeros((d1 * n_jl, w_dma), np.float32)
    for d in range(d1):
        for j in range(n_jl):
            if j + taps <= w_dma:
                ashift2[d * n_jl + j, j : j + taps] = Am[d]
    ashift2_c = jnp.asarray(ashift2)
    j_loc_c = jnp.asarray(fp["j_loc"])
    s_c = jnp.asarray(fp["s_pad"].astype(np.int32))
    block_base = fp["block_base"].astype(np.int32)
    out_cap = cfg.out_capacity

    def contract(buffer, base, r):
        wrap = (r + s_c >= jnp.int32(M_)).astype(jnp.int32)
        frac = (r + s_c - jnp.int32(M_) * wrap).astype(jnp.float32) / float(M_)
        u = 2.0 * frac - 1.0
        ts = [jnp.ones_like(u), u]
        for _ in range(d1 - 2):
            ts.append(2.0 * u * ts[-1] - ts[-2])
        t_cheb = jnp.stack(ts, axis=-1)
        # fold each block's DMA alignment remainder into the local offset
        rem = ((base + jnp.asarray(block_base)) % 8).astype(jnp.int32)  # [K]
        jl = j_loc_c + wrap + rem[:, None]
        onehot = (
            jl[:, :, None] == jnp.arange(n_jl, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.float32)
        p_mat = (t_cheb[:, :, :, None] * onehot[:, :, None, :]).reshape(
            fp["n_pad"], d1 * n_jl
        )
        a_blk = jnp.einsum(
            "np,pw->nw", p_mat, ashift2_c,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(K, q, w_dma)

        kern = functools.partial(_dma_kernel, K=K, w_dma=w_dma)
        scalars = jnp.concatenate(
            [
                jnp.reshape(jnp.asarray(base, jnp.int32), (1,)),
                jnp.asarray(block_base),
            ]
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(K,),
            in_specs=[
                pl.BlockSpec((1, q, w_dma), lambda k, b: (k, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, q, R), lambda k, b: (k, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, w_dma, R), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((K, q, R), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * K * q * w_dma * R * 6,
                bytes_accessed=K * w_dma * R * 4 + K * q * R * 4,
                transcendentals=0,
            ),
        )(scalars, a_blk, buffer)
        return out.reshape(fp["n_pad"], R)[:out_cap]

    return contract


def main():
    import builtins

    pr = functools.partial(builtins.print, flush=True)
    cfg, coeffs, fp, R, ring = build()
    pr(f"q={fp['q']} K={fp['K']} n_jl={fp['n_jl']} w_blk={fp['w_blk']} R={R}")
    xla_c = make_xla(cfg, fp, R)
    dma_c = make_dma(cfg, fp, R)
    rng = np.random.default_rng(0)
    buffer = jnp.asarray(rng.standard_normal((ring, R)), jnp.float32)

    pr("compiling xla form...")
    ref = np.asarray(jax.jit(xla_c)(buffer, jnp.int32(1234), jnp.int32(777)))
    pr("compiling dma form...")
    got = np.asarray(jax.jit(dma_c)(buffer, jnp.int32(1234), jnp.int32(777)))
    d = np.abs(got - ref).max()
    pr(f"max |dma - xla| = {d:.2e}")
    assert d < 1e-4, d

    J = 32

    @functools.partial(jax.jit, static_argnames=("mode",))
    def scan_many(buffer, *, mode):
        def body(carry, j):
            base = (j * 97) % 3000
            r = (j * 131) % cfg.ratio_den
            out = (xla_c if mode == "xla" else dma_c)(buffer, base, r)
            return carry + jnp.max(jnp.abs(out)), None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(J, dtype=jnp.int32)
        )
        return acc

    def time_fn(fn, *args, reps=4, warmup=2):
        for _ in range(warmup):
            res = fn(*args)
        jax.block_until_ready(res)
        t0 = time.perf_counter()
        for _ in range(reps):
            res = fn(*args)
        jax.block_until_ready(res)
        return (time.perf_counter() - t0) / reps

    out_samples = cfg.out_capacity * R
    for mode in ("xla", "dma"):
        t = time_fn(lambda b, _m=mode: scan_many(b, mode=_m), buffer)
        pr(
            f"{mode}: {t*1e3/J:.3f} ms/contraction = "
            f"{J*out_samples/t/1e9:.2f} Gsps (contraction-only)"
        )


if __name__ == "__main__":
    main()
