"""Manual-DMA banded contraction for the time-major sync FIR fleet.

The XLA form of the tm periodic contraction materializes ``region``
(one [~(K+2)L, R] dynamic_slice) and ``segs`` ([K, s_len, R]
shifted-concat) in HBM before the fat einsum reads them back — ~72 MB of
avoidable traffic per step at the bench config (ROUND2_NOTES' last named
FIR lever).  This kernel reads each block's rows straight out of the
HBM ring buffer instead: per grid step ``k`` it DMAs
``buffer[base + k*L : +s_len, :]`` into a double-buffered VMEM scratch
(overlapped with the previous block's dot) and writes one ``[M, R]``
output block.  Zero intermediates.

Mosaic constraints shaped the design (each cost a probe iteration,
experiments/fir_tm_dma_probe.py):

- DMA slice shapes AND start offsets must be 8-row aligned; ``base+k*L``
  is arbitrary, so the DMA fetches from the aligned floor and the
  traced sub-tile remainder ``rem in [0, 8)`` is absorbed into the
  WEIGHTS — ``a8[r]`` is the banded atlas window with its columns
  pre-shifted by ``r`` (built per step from the traced atlas slice; tiny
  [8, M, s_dma]).  A traced ``dynamic_slice`` of the 2.5 MB segment
  instead hung the Mosaic compiler; value-level ``dynamic_slice`` is
  unimplemented in the TPU lowering — ref-level major-axis indexing
  (``a8_ref[rem]``) is the supported form.

Measured (v5e-1, 147/160 taps=128, B=1024, R=2048, dispatch-amortized):
contraction 0.589 -> 0.518 ms (+13.7%), |dma - xla| <= 1.4e-6 (f32
accumulation order).  (reference analog: the FIR convolve inner loop,
src/fir/avx.rs:14-61, here fused with its data movement.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "dma_banded_contract",
    "dma_farrow_contract",
    "dma_farrow_contract_packed",
    "build_shifted_atlas",
]


def build_shifted_atlas(a, span: int, s_dma: int):
    """``[8, M, s_dma]`` with ``a8[r, :, r:r+span] = a`` — the 8 possible
    DMA sub-tile remainders folded into the weight columns."""
    return jnp.stack(
        [jnp.pad(a, ((0, 0), (r, s_dma - span - r))) for r in range(8)]
    )


def _kernel(base_ref, a8_ref, buf_ref, o_ref, seg_ref, sem_ref, *, L, K,
            s_dma, n_rows):
    k = pl.program_id(0)
    base = base_ref[0]

    def get_dma(slot, kk):
        start = base + kk * L
        aligned = (start // 8) * 8
        return pltpu.make_async_copy(
            buf_ref.at[pl.ds(aligned, s_dma), :],
            seg_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(k == 0)
    def _warm():
        get_dma(0, 0).start()

    @pl.when(k + 1 < K)
    def _next():
        get_dma((k + 1) % 2, k + 1).start()

    get_dma(k % 2, k).wait()
    rem = (base + k * L) % 8
    a_r = a8_ref[rem]  # [M, s_dma]
    o_ref[0] = jax.lax.dot(
        a_r,
        seg_ref[k % 2],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _farrow_kernel(sc_ref, ablk_ref, buf_ref, o_ref, seg_ref, sem_ref, *,
                   K, w_dma):
    """Farrow variant: per-block base offsets come from the scalar-
    prefetch array (``sc_ref = [base, block_base_0..K-1]``); the weights
    ``ablk`` arrive PRE-SHIFTED for each block's aligned read (the
    alignment remainder was folded into the positioning one-hot by the
    caller), so the kernel is pure DMA + dot."""
    k = pl.program_id(0)
    base = sc_ref[0]

    def get_dma(slot, kk):
        start = base + sc_ref[1 + kk]
        aligned = (start // 8) * 8
        return pltpu.make_async_copy(
            buf_ref.at[pl.ds(aligned, w_dma), :],
            seg_ref.at[slot],
            sem_ref.at[slot],
        )

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


def _farrow_packed_kernel(sc_ref, apack_ref, buf_ref, o_ref, seg_ref,
                          sem_ref, *, Kg, G, s_sub):
    """Packed variant for SMALL farrow blocks (q < 8, heavy coprime
    downsampling): each grid step handles a GROUP of G consecutive
    blocks with G independent sub-DMAs — block j's ``s_sub`` tap-window
    rows land at seg rows ``[j*s_sub, (j+1)*s_sub)`` — then one
    block-diagonal dot ``[G*q, G*s_sub] x [G*s_sub, R]``.  Unlike a
    union-span read this touches only ~taps rows per output (heavy
    blocks do not overlap) and its VMEM footprint is independent of the
    decimation ratio L/M."""
    g = pl.program_id(0)
    base = sc_ref[0]

    def get_dma(slot, gg, j):
        start = base + sc_ref[1 + gg * G + j]
        aligned = (start // 8) * 8
        return pltpu.make_async_copy(
            buf_ref.at[pl.ds(aligned, s_sub), :],
            seg_ref.at[slot, pl.ds(j * s_sub, s_sub)],
            sem_ref.at[slot, j],
        )

    @pl.when(g == 0)
    def _warm():
        for j in range(G):
            get_dma(0, 0, j).start()

    @pl.when(g + 1 < Kg)
    def _next():
        for j in range(G):
            get_dma((g + 1) % 2, g + 1, j).start()

    for j in range(G):
        get_dma(g % 2, g, j).wait()
    o_ref[0] = jax.lax.dot(
        apack_ref[0],
        seg_ref[g % 2],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("G", "s_sub", "interpret"))
def dma_farrow_contract_packed(buffer, base, a_pack, block_base, *,
                               G: int, s_sub: int,
                               interpret: bool = False):
    """``out[g, j*q + l, r] = sum_c a_pack[g, j*q + l, j*s_sub + c] *
    buffer[align8(base + block_base[g*G + j]) + c, r]`` — the grouped
    farrow contraction for q < 8 ratios, fed by per-block packed
    sub-DMAs.  ``a_pack [Kg, G*q, G*s_sub]`` is block-diagonal: block
    ``j``'s rows occupy columns ``[j*s_sub, (j+1)*s_sub)``, pre-shifted
    for each block's ALIGNED read (the caller folds
    ``(base + block_base) % 8`` into the positioning one-hot).
    ``block_base [Kg*G]`` int32.  Returns ``[Kg, G*q, R]`` f32."""
    Kg, rows, width = a_pack.shape
    assert width == G * s_sub, (width, G, s_sub)
    _, R = buffer.shape
    kern = functools.partial(
        _farrow_packed_kernel, Kg=Kg, G=G, s_sub=s_sub
    )
    scalars = jnp.concatenate(
        [
            jnp.reshape(jnp.asarray(base, jnp.int32), (1,)),
            jnp.asarray(block_base, jnp.int32),
        ]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Kg,),
        in_specs=[
            pl.BlockSpec((1, rows, width), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, rows, R), lambda g, b: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, G * s_sub, R), jnp.float32),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Kg, rows, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Kg * rows * width * R * 6,
            bytes_accessed=Kg * width * R * 4 + Kg * rows * R * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scalars, a_pack, buffer)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dma_farrow_contract(buffer, base, a_blk, block_base, *,
                        interpret: bool = False):
    """``out[k, l, r] = sum_s a_blk[k, l, s] * buffer[align8(base +
    block_base[k]) + s, r]`` — the synchronized-Farrow blocked
    contraction fed straight from the HBM ring buffer.  ``a_blk
    [K, q, w_dma]`` must be built against each block's ALIGNED read (the
    engine folds ``(base + block_base_k) % 8`` into the positioning
    one-hot).  Measured +48% over the XLA region/region_blk form at the
    44100->44101 bench config (experiments/farrow_dma_probe.py)."""
    K, q, w_dma = a_blk.shape
    _, R = buffer.shape
    kern = functools.partial(_farrow_kernel, K=K, w_dma=w_dma)
    scalars = jnp.concatenate(
        [
            jnp.reshape(jnp.asarray(base, jnp.int32), (1,)),
            jnp.asarray(block_base, jnp.int32),
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
    return pl.pallas_call(
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
        interpret=interpret,
    )(scalars, a_blk, buffer)


@functools.partial(
    jax.jit, static_argnames=("L", "M", "span", "K", "interpret")
)
def dma_banded_contract(
    buffer, base, a, *, L: int, M: int, span: int, K: int,
    interpret: bool = False,
):
    """``out[k, j, r] = sum_s a[j, s] * buffer[base + k*L + s, r]`` for
    ``k < K`` — the tm periodic contraction read directly from the ring
    buffer.  ``buffer [ring, R]`` f32 (stays in HBM), ``base`` traced
    int32 row offset, ``a [M, span]`` the (traced) banded atlas window.
    Returns ``[K, M, R]`` f32."""
    _, R = buffer.shape
    s_dma = -(-span // 8) * 8 + 8
    a8 = build_shifted_atlas(a, span, s_dma)
    kern = functools.partial(
        _kernel, L=L, K=K, s_dma=s_dma, n_rows=buffer.shape[0]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((8, M, s_dma), lambda k, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, M, R), lambda k, b: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, s_dma, R), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, M, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * M * s_dma * R * 6,  # HIGHEST ~ 6 bf16 passes
            bytes_accessed=K * s_dma * R * 4 + K * M * R * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([base], jnp.int32).astype(jnp.int32), a8, buffer)
