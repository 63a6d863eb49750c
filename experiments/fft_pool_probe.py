"""Probe: why is the scalar-prefetched pool magsplit SLOWER than the
materialized form? (bench: pool 6436 vs materialized 10171 Msps.)

Variants (J-scan amortized, headline 1176->1280 shape, R=16384):
  mat      materialized: chunks[idx] slice + magsplit_projector
  pool2x   magsplit_projector_pool(pool, pool) — same array twice
  poolAB   pool passed as two DISTINCT arrays (aliasing-copy hypothesis)
  poolcur  only cur from pool, prev materialized state (single indexed
           operand hypothesis)

Usage: python experiments/fft_pool_probe.py
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

from resampler_tpu.engine import fft as fe  # noqa: E402
from resampler_tpu.ops.fft_magsplit_kernel import (  # noqa: E402
    _kernel_pool,
    _tile_rows,
    magsplit_projector,
    magsplit_projector_pool,
    magsplit_weights,
    plan_magsplit,
)

J = 40
NBUF = 8


def main():
    R = 16384
    n_in, n_out = 1176, 1280
    plan = plan_magsplit(n_in, n_out)
    wh, wcorr = magsplit_weights(plan)
    rng = np.random.default_rng(0)
    pool = jnp.asarray(
        rng.standard_normal((NBUF, R, n_in)), jnp.float32
    )
    idxs = jnp.arange(J, dtype=jnp.int32) % NBUF

    def run(name, fn, *args):
        f = jax.jit(fn)
        o = f(*args)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(3):
            o = f(*args)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / 3 / J
        print(
            f"{name}: {dt*1e3:.3f} ms/step = "
            f"{R * n_out / dt / 1e9:.2f} Gsps",
            flush=True,
        )

    def mat(pool):
        def body(c, i):
            prev = pool[(i - 1) % NBUF]
            cur = pool[i]
            out = magsplit_projector(prev, cur, wh, wcorr, plan=plan)
            return c + jnp.max(jnp.abs(out)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), idxs)
        return c

    def pool2x(pool):
        def body(c, i):
            out = magsplit_projector_pool(
                pool, (i - 1) % NBUF, i, wh, wcorr, plan=plan
            )
            return c + jnp.max(jnp.abs(out)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), idxs)
        return c

    # two distinct arrays (same contents) — tests the aliasing-copy theory
    def _pool_ab(pa, pb, ip, ic):
        P, R_, n = pa.shape
        tile_r = _tile_rows(R_)
        kern = functools.partial(_kernel_pool, plan=plan)
        idx = jnp.stack([jnp.asarray(ip, jnp.int32), jnp.asarray(ic, jnp.int32)])
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R_ // tile_r,),
            in_specs=[
                pl.BlockSpec((1, tile_r, n), lambda i, s: (s[0], i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_r, n), lambda i, s: (s[1], i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((plan.s, plan.rows, plan.cols),
                             lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((plan.s, 2 * plan.wc, plan.cols),
                             lambda i, s: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_r, plan.n_out), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((R_, plan.n_out), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(idx, pa, pb, wh, wcorr)

    def poolab(pa, pb):
        def body(c, i):
            out = _pool_ab(pa, pb, (i - 1) % NBUF, i)
            return c + jnp.max(jnp.abs(out)), None
        c, _ = jax.lax.scan(body, jnp.float32(0), idxs)
        return c

    run("mat", mat, pool)
    run("pool2x", pool2x, pool)
    pool_b = pool + 0.0
    run("poolAB", poolab, pool, pool_b)


if __name__ == "__main__":
    main()
