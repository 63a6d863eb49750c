"""Fused Pallas TPU kernel for the complete FIR stream step.

One kernel per stream (grid over the batch) performs what the XLA path
(resampler_tpu/engine/fir.py) expresses as ~10 separate HLO ops — masked
copy-in, end-aligned re-window, banded-kernel atlas slice, im2col, MXU
matmul, output masking, consume bookkeeping — with the stream buffer
resident in VMEM for the whole step.  Per stream the only HBM traffic is
the buffer block in/out, the chunk in, and the outputs (~0.4 MB), versus
the XLA path's materialization of every intermediate.

Semantics are identical to ``make_fir_step`` (differentially tested,
bit-exact, in tests/test_pallas.py via interpret mode).

STATUS: **experimental — interpret-mode correct; blocked on Mosaic
lowering gaps on real TPU.**  Findings so far (each fixed in this file,
uncovering the next):

1. Mosaic vector loads need 128-aligned dynamic lane offsets → all
   dynamic windows routed through DMAs.  SOLVED.
2. Value-level reshape ``[C, N*L] -> [C, N, L]`` is an unsupported lane
   split → use REF-level ``ref.reshape`` (``tpu.memref_reshape``), which
   views before the load.  SOLVED.
3. Lane-concat of shifted slices trips "result/input offset mismatch on
   non-concat dimension" → decompose the im2col contraction into n_blk
   per-shift matmuls summed in f32.  SOLVED.
4. CURRENT blocker: ``tpu.memref_slice`` of a VMEM ref at a DYNAMIC
   minor-dim offset (the atlas window DMA source
   ``a2_ref.at[pl.ds(i0, M), pl.ds(c0, span)]``).  Next attempt: keep
   dynamically-windowed DMA sources in HBM (``pltpu.ANY`` specs) — HBM
   DMA descriptors take arbitrary offsets; VMEM tiled memrefs do not.

Design notes for that revision: (a) the Pallas grid is sequential on the
single v5e TensorCore, so the per-stream kernel must stay in the ~µs
range to beat XLA; (b) the synchronized-fleet XLA path
(engine/fir.py make_fir_fleet_step_sync) already reaches the fusion goal
for phase-locked fleets (59x reference measured) — this kernel matters
for fleets with DIVERGENT per-stream phase state.

(reference native analog: the hand-written SIMD convolution kernels,
reference: src/fir/avx512.rs, SURVEY.md §2.6)
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine.fir import FirConfig

__all__ = ["make_fir_fleet_step_pallas"]


def _build_atlas(config: FirConfig, coeffs: np.ndarray) -> np.ndarray:
    """Static doubled banded-kernel atlas (same math as the engine's
    periodic path; see engine/fir.py _convolve_periodic docstring)."""
    L, M, taps = config.ratio_num, config.ratio_den, config.taps
    table = np.asarray(coeffs, np.float32)
    rho = np.arange(M, dtype=np.int64)
    pf = rho * config.phases
    p1 = pf // M
    p2 = np.minimum(p1 + 1, config.phases - 1)
    frac = ((pf - p1 * M) / M).astype(np.float32)[:, None]
    w_resid = (1.0 - frac) * table[p1] + frac * table[p2]

    i = np.arange(2 * M, dtype=np.int64)
    a2 = np.zeros((2 * M, 2 * L + taps + 1), np.float32)
    for ii in range(2 * M):
        off = int((i[ii] * L) // M)
        a2[ii, off : off + taps] = w_resid[int((i[ii] * L) % M)]
    return a2


def make_fir_fleet_step_pallas(
    config: FirConfig, coeffs: np.ndarray, n_in: int, *, interpret: bool = False
):
    """Build the fused fleet step.

    ``step(buffers [B, C, alloc], chunks [B, n_in, C], avail [B],
    pos_num [B], n_valid [B], budget [B]) ->
    (buffers', out [B, out_cap, C], avail' [B], pos_num' [B],
    consumed [B], produced [B])``

    Only the periodic (atlas) path is supported — the fleet-serving
    configurations all are; arbitrary coprime rates use the XLA step.
    """
    L, M, taps = config.ratio_num, config.ratio_den, config.taps
    C = config.channels
    alloc = config.buffer_alloc
    span = L + taps + 1
    K = -(-config.out_capacity // M)
    out_cap = config.out_capacity
    n_blk = 1 + -(-(span - L) // L)
    s_len = n_blk * L
    a2_np = _build_atlas(config, coeffs)
    a2_rows, a2_cols = a2_np.shape
    l_inv = pow(L, -1, M) if M > 1 else 0
    valid_end = config.input_capacity
    ext_cols = valid_end + n_in + (alloc - valid_end)

    region_cols = (K + n_blk) * L

    def kernel(
        avail_ref, pos_ref, nvalid_ref, budget_ref,  # scalar prefetch [B]
        buf_ref, chunk_ref, a2_ref,                  # VMEM blocks
        buf_out_ref, out_ref, avail_out_ref, pos_out_ref,
        consumed_ref, produced_ref,
        ext_ref, region_ref, a_ref, sems,            # VMEM scratch + DMA sems
    ):
        b = pl.program_id(0)
        avail = avail_ref[b]
        pos_num = pos_ref[b]
        n_valid = jnp.minimum(nvalid_ref[b], n_in)
        budget = budget_ref[b]

        # ---- copy-in: end-aligned concat + window ----
        # Mosaic vector loads need 128-aligned dynamic lane offsets, so
        # every dynamic-offset window moves via DMA (the DMA engine
        # handles arbitrary offsets): stage the extended array once, then
        # DMA out the re-based buffer and the convolution region.
        to_copy = jnp.minimum(n_valid, valid_end - avail)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_in), 1)
        chunk_masked = jnp.where(col < to_copy, chunk_ref[0].T, 0.0)
        ext_ref[:, :valid_end] = buf_ref[0, :, :valid_end]
        ext_ref[:, valid_end : valid_end + n_in] = chunk_masked
        ext_ref[:, valid_end + n_in :] = jnp.zeros(
            (C, ext_cols - valid_end - n_in), jnp.float32
        )
        avail = avail + to_copy

        # ---- schedule ----
        limit = (avail - taps + 1) * M - pos_num
        n_from_input = jnp.where(limit > 0, (limit + L - 1) // L, 0)
        n_out = jnp.clip(n_from_input, 0, budget)

        # ---- banded-kernel atlas window (DMA: c0 is lane-unaligned) ----
        d_min = pos_num // M
        r = pos_num - d_min * M
        i0 = (r * l_inv) % M
        c0 = (i0 * L) // M
        dma_a = pltpu.make_async_copy(
            a2_ref.at[pl.ds(i0, M), pl.ds(c0, span)], a_ref, sems.at[0]
        )
        dma_a.start()

        # ---- convolution region + re-based buffer (DMAs) ----
        read_pos = valid_end - avail
        base = read_pos + d_min
        dma_r = pltpu.make_async_copy(
            ext_ref.at[:, pl.ds(to_copy + base, region_cols)],
            region_ref,
            sems.at[1],
        )
        dma_r.start()
        dma_b = pltpu.make_async_copy(
            ext_ref.at[:, pl.ds(to_copy, alloc)], buf_out_ref.at[0], sems.at[2]
        )
        dma_b.start()

        dma_a.wait()
        a_pad = jnp.concatenate(
            [a_ref[:, :], jnp.zeros((M, s_len - span), jnp.float32)], axis=1
        )

        # ---- im2col + MXU matmul ----
        dma_r.wait()
        # value-level reshape [C, N*L] -> [C, N, L] is an unsupported lane
        # split in Mosaic; the REF-level reshape (tpu.memref_reshape) takes
        # the view before the load instead.
        # Lane-concat of shifted views trips Mosaic layout offsets, so the
        # im2col contraction is decomposed per shifted block:
        #   out = sum_b blocks[:, b:b+K, :] . A[:, b*L:(b+1)*L]^T
        blocks3 = region_ref.reshape(C, K + n_blk, L)
        out = jnp.zeros((C * K, M), jnp.float32)
        for bb in range(n_blk):
            seg_b = blocks3[:, bb : bb + K, :].reshape(C * K, L)
            a_b = a_pad[:, bb * L : (bb + 1) * L]
            out = out + jax.lax.dot_general(
                seg_b,
                a_b,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [C*K, M]
        out = out.reshape(C, K, M)
        out = jnp.transpose(out, (1, 2, 0)).reshape(K * M, C)
        lane = jax.lax.broadcasted_iota(jnp.int32, (K * M, 1), 0)
        out = jnp.where(lane < n_out, out, 0.0)

        # ---- consume ----
        pos_after = pos_num + n_out * L
        consumed = jnp.minimum(pos_after // M, avail)
        avail = avail - consumed
        pos_num = pos_after - consumed * M

        # ---- writes ----
        out_ref[0] = out[:out_cap]
        avail_out_ref[b] = avail
        pos_out_ref[b] = pos_num
        consumed_ref[b] = to_copy
        produced_ref[b] = n_out
        dma_b.wait()

    def step(buffers, chunks, avail, pos_num, n_valid, budget):
        B = buffers.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(
                    (1, C, alloc), lambda b, *_: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, n_in, C), lambda b, *_: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (a2_rows, a2_cols), lambda b, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, C, alloc), lambda b, *_: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, out_cap, C), lambda b, *_: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((C, ext_cols), jnp.float32),
                pltpu.VMEM((C, region_cols), jnp.float32),
                pltpu.VMEM((M, span), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, C, alloc), jnp.float32),
                jax.ShapeDtypeStruct((B, out_cap, C), jnp.float32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
            ],
            input_output_aliases={4: 0},  # buffers -> buffers'
            interpret=interpret,
        )(avail, pos_num, n_valid, budget, buffers, chunks, jnp.asarray(a2_np))

    return step
