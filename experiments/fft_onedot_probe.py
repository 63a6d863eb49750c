"""Probe: ONE dot per column group for the magsplit kernel.

The production kernel runs 2 dots per group (pass-1 banded hi, then the
hi|lo-stacked correction) — 8 dots per row tile at the bench geometry,
and sits at ~44% MXU util of its own banded FLOPs.  Same arithmetic as
one K-stacked dot per group:

    y = [hi_band | hi_corr | lo_corr] @ [wh ; wc_lo ; wc_hi]

(K = rows + 2*wc = 2940, identical FLOPs, half the dot count).  If
Mosaic's per-dot issue overhead is what caps util, this gains; if the
MXU is already saturated inside each dot, it is a wash.

Usage: python experiments/fft_onedot_probe.py
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

from resampler_tpu.ops.fft_magsplit_kernel import (  # noqa: E402
    MagsplitPlan,
    magsplit_projector,
    magsplit_weights,
    plan_magsplit,
)
from resampler_tpu.ops.matmul3 import split_hi_lo  # noqa: E402


def onedot_weights(plan: MagsplitPlan):
    """[S, rows + 2*wc, cols] bf16: pass-1 band stacked over the
    correction stack (t2_lo band, then t2_hi band)."""
    wh, wc = magsplit_weights(plan)  # [S, rows, cols], [S, 2wc, cols]
    return jnp.concatenate([wh, wc], axis=1)


def _kernel_onedot(prev_ref, cur_ref, w_ref, o_ref, *, plan: MagsplitPlan):
    x2 = jnp.concatenate([prev_ref[:], cur_ref[:]], axis=1)
    hi, lo = split_hi_lo(x2)
    lp = plan.lp
    for q in range(plan.s):
        r0 = q * plan.bps * lp
        rb = r0 + plan.b0 * lp
        op = jnp.concatenate(
            [
                hi[:, r0 : r0 + plan.rows],
                hi[:, rb : rb + plan.wc],
                lo[:, rb : rb + plan.wc],
            ],
            axis=1,
        )  # [tr, rows + 2wc]
        o_ref[:, q * plan.cols : (q + 1) * plan.cols] = jnp.dot(
            op, w_ref[q], preferred_element_type=jnp.float32
        )


@functools.partial(jax.jit, static_argnames=("plan", "tile_r"))
def magsplit_onedot(prev, cur, w, *, plan: MagsplitPlan, tile_r: int):
    R, n = prev.shape
    kern = functools.partial(_kernel_onedot, plan=plan)
    kdim = plan.rows + 2 * plan.wc
    return pl.pallas_call(
        kern,
        grid=(R // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.s, kdim, plan.cols), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, plan.n_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, plan.n_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * kdim * plan.cols * plan.s,
            bytes_accessed=2 * R * n * 4 + R * plan.n_out * 4,
            transcendentals=0,
        ),
    )(prev, cur, w)


def main():
    import builtins

    pr = functools.partial(builtins.print, flush=True)
    R, n_in, n_out = 16384, 1176, 1280
    plan = plan_magsplit(n_in, n_out)
    wh, wc = magsplit_weights(plan)
    w1 = onedot_weights(plan)
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((R, n_in)), jnp.float32)
    cur = jnp.asarray(rng.standard_normal((R, n_in)), jnp.float32)

    ref = np.asarray(magsplit_projector(prev, cur, wh, wc, plan=plan))
    got = np.asarray(magsplit_onedot(prev, cur, w1, plan=plan, tile_r=512))
    d = np.abs(got - ref).max()
    pr(f"max |onedot - prod| = {d:.2e}")  # accumulation order differs
    assert d < 2e-4, d

    J = 8

    @functools.partial(jax.jit, static_argnames=("mode", "tile_r"))
    def scan_many(prev, cur, *, mode, tile_r):
        def body(c, _):
            p, peak = c
            if mode == "prod":
                out = magsplit_projector(p, cur, wh, wc, plan=plan)
            else:
                out = magsplit_onedot(p, cur, w1, plan=plan, tile_r=tile_r)
            return (p + 1e-30 * out[:, :n_in], peak + jnp.max(jnp.abs(out))), None

        (p, peak), _ = jax.lax.scan(body, (prev, jnp.float32(0)), None,
                                    length=J)
        return peak

    def time_fn(fn, *args, reps=4, warmup=2):
        for _ in range(warmup):
            r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps

    samples = R * n_out
    for mode, tile_r in (("prod", 512), ("onedot", 512), ("onedot", 256)):
        t = time_fn(
            lambda a, b, _m=mode, _tr=tile_r: scan_many(a, b, mode=_m,
                                                        tile_r=_tr),
            prev, cur,
        )
        pr(f"{mode} tile_r={tile_r}: {t*1e3/J:.3f} ms/chunk = "
           f"{J*samples/t/1e9:.2f} Gsps")


if __name__ == "__main__":
    main()
