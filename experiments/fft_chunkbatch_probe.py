"""Probe: input-stationary CHUNK BATCHING for the magsplit kernel.

ROUND2_NOTES' last named FFT schedule idea: process H chunks per kernel
invocation with the weights resident, so consecutive chunks share work.
The engine's chunk operator is ``out_t = [x_{t-1} | x_t] @ T2`` — chunk
``t``'s ``cur`` half is chunk ``t+1``'s ``prev`` half, so a sequential
per-chunk kernel reads every input row-block TWICE from HBM and splits
it hi/lo twice.  The batched kernel carries the previous chunk's hi/lo
split in VMEM scratch across an inner ``h`` grid axis:

  grid = (R/tile_r, H), h fastest; scratch (hi_prev, lo_prev) persists
  across grid iterations; x0 is fetched once per row tile (constant-in-h
  index map -> Mosaic skips the refetch); each x_{h+1} block is read
  exactly once.

Upper bound on the win at the bench shape (R=16384, N=1176, M=1280,
step ~1.43 ms at 14.7 Gsps): input traffic 154 -> ~77 MB (~94 us) plus
half the VPU split work — ~7%.  Run on v5e-1 to get the real number.

Usage: python experiments/fft_chunkbatch_probe.py [H] [R]
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


def _kernel_batched(
    x0_ref, xc_ref, wh_ref, wc_ref, o_ref, hip_ref, lop_ref, *,
    plan: MagsplitPlan,
):
    h = pl.program_id(1)

    @pl.when(h == 0)
    def _seed():
        hi0, lo0 = split_hi_lo(x0_ref[0])
        hip_ref[:] = hi0
        lop_ref[:] = lo0

    hic, loc = split_hi_lo(xc_ref[0])
    hi = jnp.concatenate([hip_ref[:], hic], axis=1)  # [tr, 2N] bf16
    lo = jnp.concatenate([lop_ref[:], loc], axis=1)
    lp = plan.lp
    for q in range(plan.s):
        r0 = q * plan.bps * lp
        rb = r0 + plan.b0 * lp
        y = jnp.dot(
            hi[:, r0 : r0 + plan.rows],
            wh_ref[q],
            preferred_element_type=jnp.float32,
        )
        hl = jnp.concatenate(
            [hi[:, rb : rb + plan.wc], lo[:, rb : rb + plan.wc]], axis=1
        )
        y = y + jnp.dot(hl, wc_ref[q], preferred_element_type=jnp.float32)
        o_ref[0, :, q * plan.cols : (q + 1) * plan.cols] = y
    hip_ref[:] = hic
    lop_ref[:] = loc


@functools.partial(jax.jit, static_argnames=("plan", "tile_r"))
def magsplit_batched(x_seq, wh, wcorr, *, plan: MagsplitPlan, tile_r: int):
    """``x_seq [H+1, R, N] -> out [H, R, M]`` with out[h] =
    [x_seq[h] | x_seq[h+1]] @ T2."""
    Hp1, R, n = x_seq.shape
    H = Hp1 - 1
    kern = functools.partial(_kernel_batched, plan=plan)
    return pl.pallas_call(
        kern,
        grid=(R // tile_r, H),
        in_specs=[
            pl.BlockSpec((1, tile_r, n), lambda i, h: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r, n), lambda i, h: (h + 1, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.s, plan.rows, plan.cols),
                         lambda i, h: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.s, 2 * plan.wc, plan.cols),
                         lambda i, h: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_r, plan.n_out),
                               lambda i, h: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, R, plan.n_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_r, n), jnp.bfloat16),
            pltpu.VMEM((tile_r, n), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * R * (plan.rows + 2 * plan.wc) * plan.cols * plan.s,
            bytes_accessed=(Hp1 * R * n * 4 + H * R * plan.n_out * 4),
            transcendentals=0,
        ),
    )(x_seq, x_seq, wh, wcorr)


def _kernel_flat(
    x0_ref, xc_ref, wh_ref, wc_ref, o_ref, hip_ref, lop_ref, *,
    plan: MagsplitPlan,
):
    """Scratch-carry with FLAT 2D blocks (same block type as the
    original kernel — isolates whether the leading-1 3D blocks eat the
    batching savings)."""
    h = pl.program_id(1)

    @pl.when(h == 0)
    def _seed():
        hi0, lo0 = split_hi_lo(x0_ref[:])
        hip_ref[:] = hi0
        lop_ref[:] = lo0

    hic, loc = split_hi_lo(xc_ref[:])
    hi = jnp.concatenate([hip_ref[:], hic], axis=1)
    lo = jnp.concatenate([lop_ref[:], loc], axis=1)
    lp = plan.lp
    for q in range(plan.s):
        r0 = q * plan.bps * lp
        rb = r0 + plan.b0 * lp
        y = jnp.dot(
            hi[:, r0 : r0 + plan.rows],
            wh_ref[q],
            preferred_element_type=jnp.float32,
        )
        hl = jnp.concatenate(
            [hi[:, rb : rb + plan.wc], lo[:, rb : rb + plan.wc]], axis=1
        )
        y = y + jnp.dot(hl, wc_ref[q], preferred_element_type=jnp.float32)
        o_ref[:, q * plan.cols : (q + 1) * plan.cols] = y
    hip_ref[:] = hic
    lop_ref[:] = loc


@functools.partial(jax.jit, static_argnames=("plan", "tile_r", "H", "R"))
def magsplit_flat(x_flat, wh, wcorr, *, plan: MagsplitPlan, tile_r: int,
                  H: int, R: int):
    """``x_flat [(H+1)*R, N] -> out [H*R, M]`` — 2D blocks throughout."""
    return _magsplit_flat_call(
        x_flat, wh, wcorr, plan=plan, tile_r=tile_r, H=H, R=R
    )


def _magsplit_flat_call(x_flat, wh, wcorr, *, plan, tile_r, H, R):
    nt = R // tile_r
    kern = functools.partial(_kernel_flat, plan=plan)
    return pl.pallas_call(
        kern,
        grid=(nt, H),
        in_specs=[
            pl.BlockSpec((tile_r, plan.n_in), lambda i, h: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, plan.n_in),
                         lambda i, h, _nt=nt: ((h + 1) * _nt + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.s, plan.rows, plan.cols),
                         lambda i, h: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.s, 2 * plan.wc, plan.cols),
                         lambda i, h: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, plan.n_out),
                               lambda i, h, _nt=nt: (h * _nt + i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H * R, plan.n_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_r, plan.n_in), jnp.bfloat16),
            pltpu.VMEM((tile_r, plan.n_in), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * R * (plan.rows + 2 * plan.wc) * plan.cols * plan.s,
            bytes_accessed=((H + 1) * R * plan.n_in * 4
                            + H * R * plan.n_out * 4),
            transcendentals=0,
        ),
    )(x_flat, x_flat, wh, wcorr)


def _kernel_inbody(x_ref, wh_ref, wc_ref, o_ref, *, plan: MagsplitPlan,
                   H: int):
    """Variant B: whole [H+1] time axis resident per row tile; one grid
    axis, no scratch, split each chunk exactly once in registers."""
    lp = plan.lp
    his = []
    los = []
    for h in range(H + 1):
        hi_h, lo_h = split_hi_lo(x_ref[h])
        his.append(hi_h)
        los.append(lo_h)
    for h in range(H):
        hi = jnp.concatenate([his[h], his[h + 1]], axis=1)
        lo = jnp.concatenate([los[h], los[h + 1]], axis=1)
        for q in range(plan.s):
            r0 = q * plan.bps * lp
            rb = r0 + plan.b0 * lp
            y = jnp.dot(
                hi[:, r0 : r0 + plan.rows],
                wh_ref[q],
                preferred_element_type=jnp.float32,
            )
            hl = jnp.concatenate(
                [hi[:, rb : rb + plan.wc], lo[:, rb : rb + plan.wc]], axis=1
            )
            y = y + jnp.dot(hl, wc_ref[q], preferred_element_type=jnp.float32)
            o_ref[h, :, q * plan.cols : (q + 1) * plan.cols] = y


@functools.partial(jax.jit, static_argnames=("plan", "tile_r"))
def magsplit_inbody(x_seq, wh, wcorr, *, plan: MagsplitPlan, tile_r: int):
    Hp1, R, n = x_seq.shape
    H = Hp1 - 1
    kern = functools.partial(_kernel_inbody, plan=plan, H=H)
    return pl.pallas_call(
        kern,
        grid=(R // tile_r,),
        in_specs=[
            pl.BlockSpec((Hp1, tile_r, n), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.s, plan.rows, plan.cols), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.s, 2 * plan.wc, plan.cols),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, tile_r, plan.n_out), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, R, plan.n_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * H * R * (plan.rows + 2 * plan.wc) * plan.cols * plan.s,
            bytes_accessed=(Hp1 * R * n * 4 + H * R * plan.n_out * 4),
            transcendentals=0,
        ),
    )(x_seq, wh, wcorr)


def main():
    import builtins, functools as _ft
    global print
    print = _ft.partial(builtins.print, flush=True)
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    n_in, n_out = 1176, 1280
    plan = plan_magsplit(n_in, n_out)
    assert plan is not None
    print(f"plan: {plan}")
    wh, wc = magsplit_weights(plan)
    rng = np.random.default_rng(0)
    x_seq = jnp.asarray(
        rng.standard_normal((H + 1, R, n_in)), jnp.float32
    )

    # correctness vs the sequential kernel
    out_b = np.asarray(magsplit_batched(x_seq, wh, wc, plan=plan, tile_r=512))
    for h in range(H):
        ref = np.asarray(
            magsplit_projector(x_seq[h], x_seq[h + 1], wh, wc, plan=plan)
        )
        d = np.abs(out_b[h] - ref).max()
        assert d == 0.0, (h, d)
    print("bit-exact vs sequential kernel")

    # --- timing: sequential calls (tuple return: stacking the pallas
    # outputs inside one fusion exceeds scoped vmem) ---
    @jax.jit
    def seq(x_seq):
        outs = []
        for h in range(H):
            outs.append(
                magsplit_projector(x_seq[h], x_seq[h + 1], wh, wc, plan=plan)
            )
        return tuple(outs)

    def time_fn(fn, *args, reps=8, warmup=3):
        for _ in range(warmup):
            r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps

    samples = H * R * n_out
    del seq  # single-dispatch timings recorded in earlier runs; the
    # dispatch-amortized scans below are the decision-grade numbers

    # --- dispatch-amortized comparison (the ENGINE-realistic measure):
    # J iterations inside one jit, data-dependency-chained so XLA cannot
    # CSE; per-dispatch tunnel latency (~6 ms here) amortizes over J*H
    # chunks exactly like bench.py's 40-step scan. ---
    J = 6

    @functools.partial(jax.jit, static_argnames=("tile_r", "mode"))
    def scan_many(x_seq, *, tile_r, mode):
        def body(xs, _):
            if mode == "batched":
                out = magsplit_batched(xs, wh, wc, plan=plan, tile_r=tile_r)
            else:
                out = magsplit_inbody(xs, wh, wc, plan=plan, tile_r=tile_r)
            xs = xs + 1e-30 * out[0, 0, 0]
            return xs, jnp.max(jnp.abs(out))
        xs, peaks = jax.lax.scan(body, x_seq, None, length=J)
        return jnp.max(peaks)

    @jax.jit
    def scan_engine_style(x_seq):
        # the engine pattern: carry prev, one kernel call per chunk
        def body(carry, h):
            prev, acc = carry
            cur = jax.lax.dynamic_index_in_dim(
                x_seq, h + 1, axis=0, keepdims=False
            )
            out = magsplit_projector(prev, cur, wh, wc, plan=plan)
            return (cur + 1e-30 * out[0, 0], acc + jnp.max(jnp.abs(out))), None
        (prev, acc), _ = jax.lax.scan(
            body, (x_seq[0], jnp.float32(0)), jnp.arange(J * H) % H
        )
        return acc

    # flat-2D variant: correctness + scan timing
    x_flat = x_seq.reshape((H + 1) * R, n_in)
    of = np.asarray(
        magsplit_flat(x_flat, wh, wc, plan=plan, tile_r=512, H=H, R=R)
    ).reshape(H, R, plan.n_out)
    assert np.array_equal(of, out_b), np.abs(of - out_b).max()
    print("flat-2D variant bit-exact too")

    @functools.partial(jax.jit, static_argnames=("tile_r",))
    def scan_flat(x_flat, *, tile_r):
        def body(xs, _):
            out = magsplit_flat(xs, wh, wc, plan=plan, tile_r=tile_r,
                                H=H, R=R)
            xs = xs + 1e-30 * out[0, 0]
            return xs, jnp.max(jnp.abs(out))
        xs, peaks = jax.lax.scan(body, x_flat, None, length=J)
        return jnp.max(peaks)

    for tile_r in (512, 256):
        t = time_fn(
            lambda xs, _tr=tile_r: scan_flat(xs, tile_r=_tr), x_flat, reps=4
        )
        print(f"scan[{J}] flat2d tile_r={tile_r}: "
              f"{t*1e3/J/H:.3f} ms/chunk = {J*samples/t/1e9:.2f} Gsps")

    for mode, tile_r in (("batched", 512),):
        t = time_fn(
            lambda xs, _tr=tile_r, _m=mode: scan_many(xs, tile_r=_tr, mode=_m),
            x_seq, reps=4,
        )
        print(f"scan[{J}] {mode} tile_r={tile_r}: "
              f"{t*1e3/J/H:.3f} ms/chunk = {J*samples/t/1e9:.2f} Gsps")
    t = time_fn(scan_engine_style, x_seq, reps=4)
    print(f"scan[{J*H}] engine-style sequential: {t*1e3/J/H:.3f} ms/chunk = "
          f"{J*samples/t/1e9:.2f} Gsps")


if __name__ == "__main__":
    main()
