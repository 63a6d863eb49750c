"""Fused Pallas kernel for the SYNCHRONIZED FIR fleet step.

The production serving path (engine/fir.py make_fir_fleet_step_sync) is
HBM-bound under XLA: the end-aligned copy-in materializes concat +
re-slice intermediates (~3x the buffer bytes per step) that a fused
kernel never writes back.  This kernel runs the whole data plane —
masked copy-in, end-aligned re-window, banded-atlas window, K
strided-window MXU matmuls, output masking — per row-tile of the
``[B*C, alloc]`` fleet buffer with everything resident in VMEM.

The schedule (``to_copy, n_out, i0, c0, base`` and the state update) is
shared by the whole fleet, computed OUTSIDE in a few scalar XLA ops and
passed via scalar prefetch, so the kernel is purely data movement +
matmuls over a grid of row tiles.

Mosaic workarounds carried over from ops/fir_kernel.py (all verified on
device, see that module's catalog and experiments/):
- every traced-shift ``pltpu.roll`` width is a POWER OF TWO;
- no lane-split reshapes anywhere;
- atlas sublane windows via 8-aligned load + 8-way switch;
- strided im2col windows as static lane-offset slices feeding
  ``dot_general`` directly (experiments/slice_dot_probe.py).

MEASURED VERDICT (v5e-1, headline config B=1024 stereo 44.1->48k
taps=128 chunk=4096): 7110 Msamples/s at tile_rows=128 — 88% of the XLA
sync step's 8106.  Correct on hardware (stream buffer BIT-exact vs the
XLA step at every config tested; tests_tpu/test_pallas_device.py).  The
residual gap is the K=27 small [tile, span]x[span, M] dot dispatches per
tile plus two full-width rolls; larger tiles (256/512) measured worse or
exceeded VMEM, and grouping k-blocks into wider dots grows FLOPs by
span_G/span.  The XLA synchronized fleet stays the production path; this
kernel is the hardware-verified fused design + workaround showcase.

(reference analog: the SIMD convolve kernels + buffer management,
reference: src/fir/avx512.rs, src/resampler_fir.rs:509-621)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine.fir import FirConfig, _use_im2col, resolve_convolve_path
from .fir_kernel import _build_atlas, _next_pow2

__all__ = ["make_fir_fleet_step_sync_pallas"]


def make_fir_fleet_step_sync_pallas(
    config: FirConfig,
    coeffs: np.ndarray,
    n_streams: int,
    n_in: int,
    *,
    tile_rows: int = 128,
    interpret: bool = False,
):
    """Build the fused synchronized-fleet step.

    ``step(state, chunks [B, C, n_in] channel-major, n_valid scalar) ->
    (state', out [B, out_cap, C], consumed, produced)`` — same contract
    and state pytree as ``make_fir_fleet_step_sync(channel_major=True)``.
    """
    if resolve_convolve_path(config) != "periodic":
        raise ValueError("sync Pallas step requires the periodic path")
    L, M, taps = config.ratio_num, config.ratio_den, config.taps
    C = config.channels
    B = n_streams
    R = B * C
    if R % tile_rows:
        # fall back to a divisor tile
        tile_rows = next(t for t in (64, 32, 16, 8) if R % t == 0)
    valid_end = config.input_capacity
    alloc = config.buffer_alloc
    span = L + taps + 1
    K = -(-config.out_capacity // M)
    out_cap = config.out_capacity
    # ext holds only [valid | chunk] — the kernel never reads the
    # buffer's slack, so the roll width is pow2(valid+chunk), HALF of the
    # naive pow2(alloc+chunk).  Rotate wrap-around can surface buffer-head
    # junk at ext positions >= ext_cols - to_copy; it is (a) masked out of
    # the buffer store below and (b) harmless in the region matmul, where
    # every junk column multiplies a STRUCTURAL ZERO of the banded atlas
    # (active windows only read real data by the schedule invariant).
    ext_cols = _next_pow2(valid_end + n_in)
    store_cols = min(alloc, ext_cols)
    a2_np = _build_atlas(config, coeffs)
    a2_rows, a2_cols = a2_np.shape
    l_inv = pow(L, -1, M) if M > 1 else 0

    def kernel(sc_ref, buf_ref, chunk_ref, a2_ref,
               buf_out_ref, out_ref):
        to_copy = sc_ref[0]
        n_out = sc_ref[1]
        i0 = sc_ref[2]
        c0 = sc_ref[3]
        shift2 = sc_ref[4]  # to_copy + base (read start of the region)

        # ---- copy-in: end-aligned concat + pow2 dynamic rotate ----
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_in), 1)
        chunk_masked = jnp.where(col < to_copy, chunk_ref[:, :], 0.0)
        parts = [buf_ref[:, :valid_end], chunk_masked]
        if ext_cols > valid_end + n_in:
            parts.append(
                jnp.zeros(
                    (tile_rows, ext_cols - valid_end - n_in), jnp.float32
                )
            )
        ext = jnp.concatenate(parts, axis=1)  # [tile_rows, ext_cols]
        slid = pltpu.roll(ext, -to_copy, axis=1)[:, :store_cols]
        scol = jax.lax.broadcasted_iota(jnp.int32, (1, store_cols), 1)
        buf_out_ref[:, :store_cols] = jnp.where(
            scol < ext_cols - to_copy, slid, 0.0
        )
        if store_cols < alloc:
            buf_out_ref[:, store_cols:] = jnp.zeros(
                (tile_rows, alloc - store_cols), jnp.float32
            )

        # ---- banded-kernel atlas window (shared; cheap per tile) ----
        i0_al = pl.multiple_of((i0 // 8) * 8, 8)
        rem_i = i0 - i0_al
        a_big = a2_ref[pl.ds(i0_al, M + 8), :]
        a_rows = jax.lax.switch(
            rem_i, [lambda k=k: a_big[k : k + M, :] for k in range(8)]
        )
        a_win = pltpu.roll(a_rows, -c0, axis=1)[:, :span]  # [M, span]

        # ---- K strided windows -> MXU matmuls ----
        rolled = pltpu.roll(ext, -shift2, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
        blks = []
        for kk in range(K):
            seg = rolled[:, kk * L : kk * L + span]  # [tile_rows, span]
            blk = jax.lax.dot_general(
                seg,
                a_win,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [tile_rows, M]
            blks.append(jnp.where(lane + kk * M < n_out, blk, 0.0))
        # single store; the matmul outputs share an offset-0 layout so
        # their lane concat is uniform (the round-1 concat failure was
        # between SHIFTED slices)
        out_ref[:, :] = jnp.concatenate(blks, axis=1)

    grid = (R // tile_rows,)

    def raw_step(buffers_flat, chunks_flat, scalars):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(
                        (tile_rows, alloc), lambda g, *_: (g, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (tile_rows, n_in), lambda g, *_: (g, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (a2_rows, a2_cols), lambda g, *_: (0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (tile_rows, alloc), lambda g, *_: (g, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (tile_rows, K * M), lambda g, *_: (g, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((R, alloc), jnp.float32),
                jax.ShapeDtypeStruct((R, K * M), jnp.float32),
            ],
            input_output_aliases={1: 0},  # buffers -> buffers'
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * R * K * span * M,
                bytes_accessed=R * (2 * alloc + n_in + K * M) * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(scalars, buffers_flat, chunks_flat, jnp.asarray(a2_np))

    def step(state, chunks, n_valid):
        chunks = chunks.astype(jnp.float32)
        assert chunks.shape == (B, C, n_in)
        n_valid = jnp.minimum(jnp.asarray(n_valid, jnp.int32), n_in)

        avail = state["available_frames"]
        pos_num = state["pos_num"]

        # ---- shared schedule (XLA scalar ops) ----
        to_copy = jnp.minimum(n_valid, valid_end - avail)
        avail2 = avail + to_copy
        limit = (avail2 - taps + 1) * jnp.int32(M) - pos_num
        n_from_input = jnp.where(
            limit > 0, (limit + jnp.int32(L) - 1) // jnp.int32(L), 0
        )
        n_out = jnp.clip(n_from_input, 0, jnp.int32(out_cap)).astype(
            jnp.int32
        )
        d_min = pos_num // jnp.int32(M)
        r = pos_num - d_min * jnp.int32(M)
        i0 = (r * jnp.int32(l_inv)) % jnp.int32(M)
        c0 = (i0 * jnp.int32(L)) // jnp.int32(M)
        read_pos = jnp.int32(valid_end) - avail2
        shift2 = to_copy + read_pos + d_min

        scalars = jnp.stack([to_copy, n_out, i0, c0, shift2]).astype(
            jnp.int32
        )
        buffers_flat = state["buffer"].reshape(R, alloc)
        chunks_flat = chunks.reshape(R, n_in)
        new_buf, out_flat = raw_step(buffers_flat, chunks_flat, scalars)

        out = out_flat.reshape(B, C, K * M)[:, :, :out_cap]
        out = jnp.transpose(out, (0, 2, 1))  # [B, out_cap, C]

        pos_after = pos_num + n_out * jnp.int32(L)
        consumed = jnp.minimum(pos_after // jnp.int32(M), avail2)
        new_state = dict(
            buffer=new_buf.reshape(B, C, alloc),
            available_frames=avail2 - consumed,
            pos_num=pos_after - consumed * jnp.int32(M),
        )
        return new_state, out, to_copy, n_out

    return step
