"""Probe: is the magsplit kernel's floor the DOTS or the in-kernel SPLIT?

Evidence so far: dot count is a wash (onedot), operand alignment is a
wash (+14.8% FLOPs -> +1.9% time, align probe), input traffic ~13%
(chunk-batching ledger).  That arithmetic only works if a large
FLOPs-independent serial term dominates — the prime suspect is the
in-kernel ``split_hi_lo`` + concat VPU prologue, serialized against the
MXU inside each grid step.

This probe feeds PRE-SPLIT bf16 operands (hi2/lo2 computed outside) so
the kernel body is dots only (aligned slices, pre-shifted weights from
fft_align_probe).  Three measurements:

- prod:      production kernel (split inside)      — baseline
- puredot:   dots-only kernel on pre-split inputs  — kernel floor
- hoisted:   puredot + the XLA-side split of `cur` charged inside the
             scan body (the honest production accounting: `prev`'s
             hi/lo would be carried in state, only `cur` is split)

Usage: python experiments/fft_puredot_probe.py
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
    magsplit_projector,
    magsplit_weights,
    plan_magsplit,
)
from resampler_tpu.ops.matmul3 import split_hi_lo  # noqa: E402
from experiments.fft_align_probe import aligned_weights  # noqa: E402


def _kernel_puredot(hi_ref, lo_ref, wh_ref, wcl_ref, wch_ref, o_ref, *,
                    plan, offs, kp1, kpc):
    for q in range(plan.s):
        r0a, rba = offs[q]
        y = jnp.dot(
            hi_ref[:, r0a : r0a + kp1], wh_ref[q],
            preferred_element_type=jnp.float32,
        )
        y = y + jnp.dot(
            hi_ref[:, rba : rba + kpc], wcl_ref[q],
            preferred_element_type=jnp.float32,
        )
        y = y + jnp.dot(
            lo_ref[:, rba : rba + kpc], wch_ref[q],
            preferred_element_type=jnp.float32,
        )
        o_ref[:, q * plan.cols : (q + 1) * plan.cols] = y


@functools.partial(jax.jit, static_argnames=("plan", "tile_r", "meta"))
def magsplit_puredot(hi2, lo2, wh, wcl, wch, *, plan, tile_r, meta):
    offs, n2p, kp1, kpc = meta
    R = hi2.shape[0]
    kern = functools.partial(
        _kernel_puredot, plan=plan, offs=offs, kp1=kp1, kpc=kpc
    )
    return pl.pallas_call(
        kern,
        grid=(R // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, n2p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, n2p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.s, kp1, plan.cols), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.s, kpc, plan.cols), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.s, kpc, plan.cols), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, plan.n_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, plan.n_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * (kp1 + 2 * kpc) * plan.cols * plan.s,
            bytes_accessed=2 * R * n2p * 2 + R * plan.n_out * 4,
            transcendentals=0,
        ),
    )(hi2, lo2, wh, wcl, wch)


def split_pad(prev, cur, n2p):
    """XLA-side prologue: concat, pad to the aligned width, bf16-split."""
    R = prev.shape[0]
    n2 = prev.shape[1] + cur.shape[1]
    x2 = jnp.concatenate(
        [prev, cur, jnp.zeros((R, n2p - n2), jnp.float32)], axis=1
    )
    return split_hi_lo(x2)


def main():
    import builtins

    pr = functools.partial(builtins.print, flush=True)
    R, n_in, n_out = 16384, 1176, 1280
    plan = plan_magsplit(n_in, n_out)
    wh, wc = magsplit_weights(plan)
    wha, wcl, wch, offs, n2p, kp1, kpc = aligned_weights(plan)
    meta = (offs, n2p, kp1, kpc)
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((R, n_in)), jnp.float32)
    cur = jnp.asarray(rng.standard_normal((R, n_in)), jnp.float32)

    ref = np.asarray(magsplit_projector(prev, cur, wh, wc, plan=plan))
    hi2, lo2 = jax.jit(functools.partial(split_pad, n2p=n2p))(prev, cur)
    got = np.asarray(magsplit_puredot(hi2, lo2, wha, wcl, wch, plan=plan,
                                      tile_r=512, meta=meta))
    d = np.abs(got - ref).max()
    pr(f"max |puredot - prod| = {d:.2e}")
    assert d < 2e-4, d

    J = 8
    flops = 2 * R * (kp1 + 2 * kpc) * plan.cols * plan.s

    @functools.partial(jax.jit, static_argnames=("mode", "tile_r"))
    def scan_many(prev, cur, *, mode, tile_r):
        if mode == "puredot":
            h0, l0 = split_pad(prev, cur, n2p)

            def body(c, _):
                h, peak = c
                out = magsplit_puredot(h, l0, wha, wcl, wch, plan=plan,
                                       tile_r=tile_r, meta=meta)
                dep = (h.astype(jnp.float32)
                       + 1e-30 * jnp.pad(out, ((0, 0), (0, n2p - n_out)))
                       ).astype(jnp.bfloat16)
                return (dep, peak + jnp.max(jnp.abs(out))), None

            (h, peak), _ = jax.lax.scan(body, (h0, jnp.float32(0)), None,
                                        length=J)
            return peak

        def body(c, _):
            p, peak = c
            if mode == "prod":
                out = magsplit_projector(p, cur, wh, wc, plan=plan)
            else:  # hoisted: charge prev's split to the body (cur's
                # hi/lo would be the carried state in production; here
                # prev varies, so split prev per step — same cost shape)
                h, lo = split_pad(p, cur, n2p)
                out = magsplit_puredot(h, lo, wha, wcl, wch, plan=plan,
                                       tile_r=tile_r, meta=meta)
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
    for mode, tile_r in (
        ("prod", 512),
        ("puredot", 512),
        ("puredot", 256),
        ("hoisted", 512),
    ):
        t = time_fn(
            lambda a, b, _m=mode, _tr=tile_r: scan_many(a, b, mode=_m,
                                                        tile_r=_tr),
            prev, cur,
        )
        util = J * flops / t / 197e12
        pr(f"{mode} tile_r={tile_r}: {t*1e3/J:.3f} ms/chunk = "
           f"{J*samples/t/1e9:.2f} Gsps  (MXU util of own FLOPs "
           f"{util*100:.0f}%)")


if __name__ == "__main__":
    main()
