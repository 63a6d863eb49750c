"""Probe: 128-lane-ALIGNED operand slices for the magsplit kernel.

The production kernel sits at ~44% MXU util of its own banded FLOPs.
Dot count is a wash (fft_onedot_probe) and input traffic is ~13%
(chunk-batching ledger) — the remaining suspect is operand staging:
every group slice starts at lane offset ``294*q`` (not 128-aligned) and
the ``[prev|cur]`` concat joins at 1176 (also unaligned), so Mosaic must
lane-rotate every dot operand.

This probe applies the farrow-DMA alignment trick: fetch each band from
the 128-aligned FLOOR of its offset and absorb the remainder into
ZERO-PADDED, PRE-SHIFTED weights.  K grows 2940 -> 3328 (+13% FLOPs) but
every dot operand becomes an aligned slice.  Variants:

- prod:    production kernel (baseline)
- par:     production + dimension_semantics=("parallel",)
- align:   aligned slices, 3 dots/group (no hl concat), padded x2
- align_c: aligned slices, 2 dots/group (hl concat of aligned slices)

Usage: python experiments/fft_align_probe.py
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
    _t2_f64,
    _bf16_np,
    magsplit_projector,
    magsplit_weights,
    plan_magsplit,
)
from resampler_tpu.ops.matmul3 import split_hi_lo  # noqa: E402

LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def aligned_weights(plan: MagsplitPlan):
    """Pre-shifted zero-padded weight stacks for aligned-slice dots.

    Returns (wh_al [S, kp1, cols], wcl_al [S, kpc, cols],
    wch_al [S, kpc, cols], offs) where for group q the pass-1 band is
    read at x2p[:, r0a : r0a + kp1] with r0a = 128*floor(r0/128), and
    the weight rows are shifted down by (r0 - r0a); likewise for the
    correction band at rb.
    """
    T2 = _t2_f64(plan.n_in, plan.n_out)
    t2h = _bf16_np(T2)
    t2l = (T2 - t2h.astype(np.float64)).astype(np.float32)
    lp = plan.lp
    n2p = _ceil_to(2 * plan.n_in, LANE)
    kp1 = _ceil_to(plan.rows + LANE - 1, LANE)
    kpc = _ceil_to(plan.wc + LANE - 1, LANE)
    whs, wcls, wchs, offs = [], [], [], []
    for q in range(plan.s):
        r0 = q * plan.bps * lp
        rb = r0 + plan.b0 * lp
        r0a = (r0 // LANE) * LANE
        rba = (rb // LANE) * LANE
        # keep the read window inside the padded array
        r0a = min(r0a, n2p - kp1)
        rba = min(rba, n2p - kpc)
        csl = slice(q * plan.cols, (q + 1) * plan.cols)
        wh = np.zeros((kp1, plan.cols), np.float32)
        wh[r0 - r0a : r0 - r0a + plan.rows] = t2h[r0 : r0 + plan.rows, csl]
        wcl = np.zeros((kpc, plan.cols), np.float32)
        wcl[rb - rba : rb - rba + plan.wc] = t2l[rb : rb + plan.wc, csl]
        wch = np.zeros((kpc, plan.cols), np.float32)
        wch[rb - rba : rb - rba + plan.wc] = t2h[rb : rb + plan.wc, csl]
        whs.append(wh)
        wcls.append(wcl)
        wchs.append(wch)
        offs.append((r0a, rba))
    return (
        jnp.asarray(np.stack(whs), jnp.bfloat16),
        jnp.asarray(np.stack(wcls), jnp.bfloat16),
        jnp.asarray(np.stack(wchs), jnp.bfloat16),
        tuple(offs),
        n2p,
        kp1,
        kpc,
    )


def _kernel_align(prev_ref, cur_ref, wh_ref, wcl_ref, wch_ref, o_ref, *,
                  plan: MagsplitPlan, offs, n2p, kp1, kpc, concat_hl):
    n2 = 2 * plan.n_in
    x2 = jnp.concatenate(
        [prev_ref[:], cur_ref[:],
         jnp.zeros((prev_ref.shape[0], n2p - n2), jnp.float32)],
        axis=1,
    )
    hi, lo = split_hi_lo(x2)
    for q in range(plan.s):
        r0a, rba = offs[q]
        y = jnp.dot(
            hi[:, r0a : r0a + kp1],
            wh_ref[q],
            preferred_element_type=jnp.float32,
        )
        if concat_hl:
            hl = jnp.concatenate(
                [hi[:, rba : rba + kpc], lo[:, rba : rba + kpc]], axis=1
            )
            wc2 = jnp.concatenate([wcl_ref[q], wch_ref[q]], axis=0)
            y = y + jnp.dot(hl, wc2, preferred_element_type=jnp.float32)
        else:
            y = y + jnp.dot(
                hi[:, rba : rba + kpc],
                wcl_ref[q],
                preferred_element_type=jnp.float32,
            )
            y = y + jnp.dot(
                lo[:, rba : rba + kpc],
                wch_ref[q],
                preferred_element_type=jnp.float32,
            )
        o_ref[:, q * plan.cols : (q + 1) * plan.cols] = y


@functools.partial(
    jax.jit, static_argnames=("plan", "tile_r", "meta", "concat_hl")
)
def magsplit_align(prev, cur, wh, wcl, wch, *, plan, tile_r, meta,
                   concat_hl):
    offs, n2p, kp1, kpc = meta
    R, n = prev.shape
    kern = functools.partial(
        _kernel_align, plan=plan, offs=offs, n2p=n2p, kp1=kp1, kpc=kpc,
        concat_hl=concat_hl,
    )
    return pl.pallas_call(
        kern,
        grid=(R // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, n), lambda i: (i, 0),
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
            bytes_accessed=2 * R * n * 4 + R * plan.n_out * 4,
            transcendentals=0,
        ),
    )(prev, cur, wh, wcl, wch)


def magsplit_prod_par(prev, cur, wh, wcorr, *, plan, tile_r):
    """Production kernel body with dimension_semantics=("parallel",)."""
    from resampler_tpu.ops.fft_magsplit_kernel import _kernel

    R, n = prev.shape
    kern = functools.partial(_kernel, plan=plan)
    return pl.pallas_call(
        kern,
        grid=(R // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.s, plan.rows, plan.cols), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.s, 2 * plan.wc, plan.cols),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, plan.n_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, plan.n_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * (plan.rows + 2 * plan.wc) * plan.cols * plan.s,
            bytes_accessed=2 * R * n * 4 + R * plan.n_out * 4,
            transcendentals=0,
        ),
    )(prev, cur, wh, wcorr)


magsplit_prod_par = functools.partial(jax.jit, static_argnames=(
    "plan", "tile_r"))(magsplit_prod_par)


def main():
    import builtins

    pr = functools.partial(builtins.print, flush=True)
    R, n_in, n_out = 16384, 1176, 1280
    plan = plan_magsplit(n_in, n_out)
    pr(f"plan: g={plan.g} lp={plan.lp} mp={plan.mp} bps={plan.bps} "
       f"b0={plan.b0} w_p={plan.w_p} rows={plan.rows} wc={plan.wc} "
       f"s={plan.s} cols={plan.cols}")
    wh, wc = magsplit_weights(plan)
    wha, wcl, wch, offs, n2p, kp1, kpc = aligned_weights(plan)
    meta = (offs, n2p, kp1, kpc)
    pr(f"aligned: n2p={n2p} kp1={kp1} kpc={kpc} offs={offs} "
       f"flops x{(kp1 + 2 * kpc) / (plan.rows + 2 * plan.wc):.3f}")
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((R, n_in)), jnp.float32)
    cur = jnp.asarray(rng.standard_normal((R, n_in)), jnp.float32)

    ref = np.asarray(magsplit_projector(prev, cur, wh, wc, plan=plan))
    for cc in (False, True):
        got = np.asarray(magsplit_align(
            prev, cur, wha, wcl, wch, plan=plan, tile_r=512, meta=meta,
            concat_hl=cc,
        ))
        d = np.abs(got - ref).max()
        pr(f"max |align(concat={cc}) - prod| = {d:.2e}")
        assert d < 2e-4, d

    J = 8

    @functools.partial(jax.jit, static_argnames=("mode", "tile_r"))
    def scan_many(prev, cur, *, mode, tile_r):
        def body(c, _):
            p, peak = c
            if mode == "prod":
                out = magsplit_projector(p, cur, wh, wc, plan=plan)
            elif mode == "par":
                out = magsplit_prod_par(p, cur, wh, wc, plan=plan,
                                        tile_r=tile_r)
            elif mode == "align":
                out = magsplit_align(p, cur, wha, wcl, wch, plan=plan,
                                     tile_r=tile_r, meta=meta,
                                     concat_hl=False)
            else:  # align_c
                out = magsplit_align(p, cur, wha, wcl, wch, plan=plan,
                                     tile_r=tile_r, meta=meta,
                                     concat_hl=True)
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
    import os

    if os.environ.get("TILE1024"):
        # follow-up question: does a taller row tile amortize per-grid-
        # step fixed costs (MXU weight-tile reloads)?  `par` is the
        # prod-body kernel with a tile_r knob.
        cases = (("par", 512), ("par", 1024), ("align", 1024))
    else:
        cases = (
            ("prod", 512),
            ("par", 512),
            ("align", 512),
            ("align_c", 512),
            ("align", 256),
        )
    for mode, tile_r in cases:
        t = time_fn(
            lambda a, b, _m=mode, _tr=tile_r: scan_many(a, b, mode=_m,
                                                        tile_r=_tr),
            prev, cur,
        )
        pr(f"{mode} tile_r={tile_r}: {t*1e3/J:.3f} ms/chunk = "
           f"{J*samples/t/1e9:.2f} Gsps")


if __name__ == "__main__":
    main()
