"""Pallas bf16x3 matmul — the FFT projector's hot kernel, hand-pipelined.

``matmul3(x, t) ~= jnp.dot(x, t, precision=HIGH)``: the same three-pass
bf16 decomposition XLA uses for ``Precision.HIGH`` (hi*hi + hi*lo +
lo*hi, each a bf16 MXU pass accumulated in f32), but with the operand
tiles staged in VMEM ONCE and all three passes run from on-chip memory.
Measured motivation (experiments/fft_pass_probe.py, v5e-1): XLA's HIGH
matmul on the [16384, 1176] @ [1176, 2560] projector spends ~1.5 ms of
MXU time plus ~0.6 ms of UN-overlapped HBM traffic per step; a fused
pipeline hides the traffic behind the passes.

Kernel design (see /opt/skills/guides/pallas_guide.md):
- grid = (N/TN, M/TM) with the column index OUTER, so the weight tile
  (index depends only on the outer axis) stays resident across all row
  tiles — Pallas skips the re-fetch when a block index repeats.
- T is pre-split hi/lo bf16 at trace time (weights are constants in this
  framework — the projector analog of the reference's cached filter
  spectra); x is split in-kernel on the VPU.
- K is carried whole (the projector's K=1176 fits VMEM comfortably).

(reference analog: the FFT butterfly SIMD layer this framework absorbs
into one matmul — SURVEY.md §2.5; this kernel is that matmul's native
implementation.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["matmul3", "split_hi_lo"]


def split_hi_lo(a):
    """Two-term bf16 decomposition: ``a ~= hi + lo`` with ``hi = bf16(a)``.

    CRITICAL: the naive ``lo = a - bf16(a).astype(f32)`` is silently
    simplified to ZERO under jit — XLA's excess-precision rule elides the
    f32->bf16->f32 convert round-trip (verified on both CPU and TPU
    backends; it cost two rounds of probe numerics before being caught).
    The rounding must therefore be done with integer bit ops, which no
    simplification pass touches: round-to-nearest-even to the upper 16
    bits, as bf16 conversion does.
    """
    a = a.astype(jnp.float32)
    u = jax.lax.bitcast_convert_type(a, jnp.uint32)
    u_r = (u + 0x7FFF + ((u >> 16) & 1)) & jnp.uint32(0xFFFF0000)
    hi_f = jax.lax.bitcast_convert_type(u_r, jnp.float32)
    # The rounding add carries into the exponent for non-finite values
    # (NaNs with low-mantissa payloads would collapse to Inf) and rounds
    # near-max-magnitude finites to Inf; pass non-finites through
    # unchanged so glitched input propagates as visibly non-finite output,
    # like the plain f32 paths do.  (One VPU compare+select per element —
    # not measurable against the surrounding MXU passes.)
    hi_f = jnp.where(jnp.isfinite(a), hi_f, a)
    return hi_f.astype(jnp.bfloat16), (a - hi_f).astype(jnp.bfloat16)


def _kernel(x_ref, thi_ref, tlo_ref, o_ref):
    x = x_ref[:]
    x_hi, x_lo = split_hi_lo(x)
    t_hi = thi_ref[:]
    t_lo = tlo_ref[:]
    acc = jnp.dot(x_hi, t_hi, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(x_lo, t_hi, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(x_hi, t_lo, preferred_element_type=jnp.float32)
    o_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("tile_m", "tile_n", "interpret")
)
def matmul3(x, t_hi, t_lo, *, tile_m: int = 512, tile_n: int = 512,
            interpret: bool = False):
    """``x [M, K] f32 @ (t_hi + t_lo) [K, N] bf16 -> [M, N] f32`` with
    bf16x3 arithmetic (three MXU passes, f32 accumulation).

    ``M`` must divide by ``tile_m`` and ``N`` by ``tile_n``; ``K`` is
    carried whole per tile (pad K outside if very large).
    """
    M, K = x.shape
    K2, N = t_hi.shape
    assert K == K2 and t_lo.shape == (K, N)
    assert M % tile_m == 0 and N % tile_n == 0, (M, N, tile_m, tile_n)

    grid = (N // tile_n, M // tile_m)  # column tile OUTER
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_m, K), lambda j, i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (K, tile_n), lambda j, i: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (K, tile_n), lambda j, i: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda j, i: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * M * K * N,
            bytes_accessed=M * K * 4 + 2 * K * N * 2 + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, t_hi, t_lo)
