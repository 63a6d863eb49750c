"""Fused Pallas contraction+combine for the ASYNC time-major FIR fleet.

The XLA async step (engine/fir_fleets.py make_fir_fleet_step_async_tm)
is traffic-bound: it materializes the basis responses ``y [p_pad, d1,
R]`` in HBM (~36 MB at the bench config), reads them TWICE through the
wrap takes, and pays a third pass for the per-stream region select —
measured 0.221 (select) + 0.184 (contraction) + 0.103 (combine) ms of a
0.576 ms step.  Mosaic ``dynamic_gather`` (which would fold the takes
into one op) crashes this toolchain's backend compiler
(experiments/mosaic_gather_probe.py), so this kernel removes the takes
STATICALLY instead:

- The grid runs over GROUPS of ``GROUP = 2`` blocks of ``Nb = 64``
  OUTPUT LANES (per-grid-step overhead dominates at these block sizes:
  ungrouped vs grouped measured 0.301 vs 0.226 ms/call in the same run
  — /tmp probes, ledgered in ROUND5_NOTES).  Lane ``n`` needs the basis
  responses at buffer row ``j_n = (n*L)//M`` — a trace-time constant —
  so a per-block streamed atlas evaluates the responses DIRECTLY AT
  each lane's row.
- The wrap bit needs the NEIGHBOR row ``j_n + 1`` too.  Two forms:

  * **shift** (auto for ``L <= M``, i.e. upsampling/near-unity — the
    async fleet's serving shapes): ``j`` increments by 0/1, so
    ``y[j_n + 1]`` is ``z0`` at the nearest lane ``n + k_n`` whose row
    advanced — a per-lane STATIC distance ``k_n <= kmax``.  The atlas
    covers ``Nb + kmax`` lanes and the wrap candidate is a
    ``kmax``-way static-shift select — the dot stays SINGLE-width.
  * **dual** (fallback for downsampling): the atlas carries both
    ``c in {0, 1}`` row copies — a doubled dot, fully general.

- The block's input rows stream straight from the HBM ring buffer via
  double-buffered DMA (8-row-aligned; the remainder is absorbed by an
  8-way static-slice switch on the landed segment — the workaround
  vocabulary proven in ops/fir_sync_kernel.py / ops/fir_dma_kernel.py).
- The per-stream frame skew ``base_rel in [0, skew_periods]`` becomes a
  per-LANE static-shift select on the segment (same absorption as the
  XLA step's region select, now in VMEM).
- The per-(lane, stream) phase residues are computed IN KERNEL from the
  streamed static split plane ``s_n = (n*L) % M`` and the per-stream
  residue row ``r_b`` (all exact ints below 2^24 in f32): ``t = s + r``,
  ``wrap = t >= M``, ``u = 2(t - M*wrap)/M - 1``, then the Chebyshev
  recurrence and the wrap combine on the VPU — the XLA step's ~9 MB of
  u/wrap planes and their [B, N] -> [N, R] relayout never exist.  WIDE
  (u32 two-word) schedules exceed the f32 envelope and ship exact
  precomputed u/wrap planes instead (``planes=True``).
- The ``n_out`` emission mask applies in the kernel epilogue (one VPU
  select), so the XLA side never re-reads the output.
- Contraction precision: ``bf16x4`` (default on hardware) with
  DEGREE-BANDED corrections — the Chebyshev basis rows decay steeply
  with degree (|A_d|/|A_0| ~ 7e-4 by d=5), so the three bf16 refinement
  dots cover only the contiguous low-degree row prefix (cut chosen at
  build where dropped terms sit >= 10x below the bf16x4 floor; ~-105 dB
  on unit signals; bf16x3/HIGH measured -78 dB on this contraction in
  round 4 and fails the 90 dB gates).  ``highest`` keeps the 6-pass f32
  form for differentials.

MEASURED VERDICT (v5e-1, bench config 44100->44101 B=256 stereo
chunk=2048, varying feed, clean serialized runs): XLA step 0.568
ms/step (1 846 Msps, 13.5x ref) -> dual-atlas bf16x4 0.351 (2 989,
21.8x) -> shift form + in-kernel n_out mask 0.273 (3 847, 28.1x) ->
degree-banded corrections 0.250 (4 200, 30.7x).  Grouped grid steps
(this revision) measured a 25% KERNEL-ALONE win (0.226 vs 0.301
ms/call) but are STEP-neutral (0.251 vs 0.250 — the XLA side already
overlaps the per-grid-step overhead); kept because it also unifies the
shift/dual kernels into one body.  In a
long bench run fleet timings drift ~20% downward (thermal/allocator;
ROUND5_NOTES) — bench.py therefore measures the async rows right after
the headline.  Differentials: CPU interpret at 6 ratio shapes <= 2.4e-5
vs the XLA step (tests/test_async_kernel.py); on-device R=128 cases
(narrow + wide) in tests_tpu/test_async_device.py.

(reference capability being scaled: per-stream instance parallelism,
reference: src/resampler_fir.rs:509-621; per-kernel differential rule:
reference: src/fft/butterflies/mod.rs:129-290.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matmul3 import split_hi_lo

__all__ = ["build_async_combine", "async_combine_supported"]

#: Output lanes per block (one MXU row tile at d1=8: 8*64 = 512
#: single-width / 1024 dual-width atlas rows per block).
NB = 64
#: Blocks processed per grid step (kernel-alone: 25% win at GROUP=2;
#: step-level: neutral — the XLA side overlaps the grid overhead).
GROUP = 2
#: Atlas column bound: heavy downsampling blocks span ``Nb*L/M + taps``
#: input rows; past this the atlas is too sparse for the dense dot to
#: win and the XLA step keeps the path.
MAX_SDMA = 640
#: Shift-form bound on the per-lane wrap-neighbor distance (covers
#: upsampling ratios to ~1:8; larger M/L falls back to the dual form).
MAX_KSHIFT = 8


def async_combine_supported(
    *, wide: bool, R: int, L: int, M: int, taps: int,
    skew_periods: int,
) -> bool:
    """Gate for the fused kernel: Mosaic-tileable lane count, bounded
    block span (near-unity / upsampling ratios — the multi-tenant
    serving shapes the async fleet exists for).  Wide (u32 two-word)
    pairs are supported through the PLANE interface: their residues
    exceed f32/int32 exactness, so the XLA side ships precomputed
    u/wrap planes instead of the in-kernel residue computation."""
    if R % 128 != 0:
        return False
    s_dma = NB * L // M + 1 + skew_periods + taps + 16
    return s_dma <= MAX_SDMA


def _build_atlas(j_np, A, Nb, Ko, s_dma, taps, n_copies, lanes):
    """``[Ko, n_copies*d1*lanes, s_dma]`` f32: block ``k``'s row
    ``(d, c, n)`` (degree-MAJOR, so the degree-banded correction rows
    are one prefix slice) carries ``A[d]`` at columns
    ``j[k*Nb+n] - j[k*Nb] + c``."""
    d1 = A.shape[0]
    ab = np.zeros((Ko, n_copies * d1 * lanes, s_dma), np.float32)
    for k in range(Ko):
        j_base = int(j_np[k * Nb])
        for n in range(lanes):
            off = int(j_np[k * Nb + n]) - j_base
            for c in range(n_copies):
                rows = (np.arange(d1) * n_copies + c) * lanes + n
                ab[k, rows, off + c : off + c + taps] = A
    return ab


def _contract(seg_sk, a_hi, a_lo, bf16x4, rows_c):
    if bf16x4:
        # DEGREE-BANDED corrections (the magsplit idea applied to the
        # Farrow basis): refinement products only matter for the
        # low-degree rows — the contiguous ``rows_c`` prefix.
        s_hi, s_lo = split_hi_lo(seg_sk)
        y = jax.lax.dot(a_hi, s_hi, preferred_element_type=jnp.float32)
        corr = jax.lax.dot(
            a_hi[0:rows_c, :], s_lo, preferred_element_type=jnp.float32
        ) + jax.lax.dot(
            a_lo[0:rows_c, :], s_hi, preferred_element_type=jnp.float32
        ) + jax.lax.dot(
            a_lo[0:rows_c, :], s_lo, preferred_element_type=jnp.float32
        )
        return jnp.concatenate(
            [y[0:rows_c, :] + corr, y[rows_c:, :]], axis=0
        )
    return jax.lax.dot(
        a_hi,
        seg_sk,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _residues(s_col, r_row, m_f):
    """In-kernel phase residues for NARROW schedules (all quantities are
    exact integers below 2^24 in f32)."""
    t = s_col + r_row              # [Nb, R], exact ints < 2^24
    w = (t >= m_f).astype(jnp.float32)
    u = 2.0 * ((t - m_f * w) * (1.0 / m_f)) - 1.0
    return u, w


def _combine(zz, u, w, d1, Nb, lanes, z1_of):
    """Chebyshev recurrence + wrap combine over precomputed residues."""
    t_prev = jnp.ones_like(u)
    t_cur = u
    acc = None
    for d in range(d1):
        z0 = zz[d * lanes : d * lanes + Nb, :]
        z1 = z1_of(zz, d)
        term = z0 + w * (z1 - z0)
        if d == 0:
            acc = term                      # T_0 = 1
        else:
            acc = acc + t_cur * term
            if d + 1 < d1:
                t_nxt = 2.0 * u * t_cur - t_prev
                t_prev, t_cur = t_cur, t_nxt
    return acc


def _kernel(sc_ref, *refs, G, Ko, Nb, d1, s_dma, skew, n_load, m_f,
            bf16x4, rows_c, planes, use_shift, kmax, lanes, n_copies):
    """One grid step = ``G`` consecutive lane-blocks (double-buffered
    G-way sub-DMAs + G dots/combines).  Operand order (after the scalar
    prefetch): ab, ab_lo, s-or-u, r-or-wrap, [k-plane if shift], skewm,
    buffer; then out, seg scratch, sem scratch."""
    if use_shift:
        (ab_ref, ab2_ref, su_ref, rw_ref, km_ref, skewm_ref,
         buf_ref, o_ref, seg_ref, sem_ref) = refs
    else:
        (ab_ref, ab2_ref, su_ref, rw_ref, skewm_ref,
         buf_ref, o_ref, seg_ref, sem_ref) = refs
        km_ref = None
    g = pl.program_id(0)
    Kg = Ko // G

    def get_dma(slot, gg, jsub):
        start = sc_ref[0] + sc_ref[1 + gg * G + jsub]
        aligned = (start // 8) * 8
        return pltpu.make_async_copy(
            buf_ref.at[pl.ds(aligned, n_load), :],
            seg_ref.at[slot, jsub],
            sem_ref.at[slot, jsub],
        )

    @pl.when(g == 0)
    def _warm():
        for jsub in range(G):
            get_dma(0, 0, jsub).start()

    @pl.when(g + 1 < Kg)
    def _next():
        for jsub in range(G):
            get_dma((g + 1) % 2, g + 1, jsub).start()

    base_lane = skewm_ref[0:1, :]  # [1, R] per-lane frame skew (f32)
    n_out = sc_ref[1 + Ko]
    for jsub in range(G):
        get_dma(g % 2, g, jsub).wait()
        seg8 = seg_ref[g % 2, jsub]  # [n_load, R]
        rem = (sc_ref[0] + sc_ref[1 + g * G + jsub]) % 8
        # 8-way static-slice switch absorbs the DMA alignment remainder
        # (traced sublane offsets are unsupported; static slices free)
        seg = jax.lax.switch(
            rem,
            [lambda c=c, s8=seg8: s8[c : c + s_dma + skew, :]
             for c in range(8)],
        )
        # per-LANE frame-skew select mirrors the XLA region select
        seg_sk = seg[0:s_dma, :]
        for sk in range(1, skew + 1):
            seg_sk = jnp.where(
                base_lane == float(sk), seg[sk : sk + s_dma, :], seg_sk
            )

        zz = _contract(
            seg_sk, ab_ref[jsub], ab2_ref[jsub], bf16x4, rows_c
        )  # [n_copies*d1*lanes, R]

        if use_shift:
            k_col = km_ref[jsub * Nb : (jsub + 1) * Nb, 0:1]

            def z1_of(zz, d):
                # y[j_n + 1] = z0 at lane n + k_n: kmax-way static shift
                z1 = zz[d * lanes + 1 : d * lanes + 1 + Nb, :]
                for c in range(2, kmax + 1):
                    z1 = jnp.where(
                        k_col == float(c),
                        zz[d * lanes + c : d * lanes + c + Nb, :],
                        z1,
                    )
                return z1

            span_l = lanes
        else:

            def z1_of(zz, d):
                return zz[(2 * d + 1) * Nb : (2 * d + 2) * Nb, :]

            span_l = 2 * Nb

        if planes:
            # wide schedules: residues exceed f32/int32 exactness, so
            # the XLA side ships precomputed u/wrap plane blocks
            u = su_ref[jsub * Nb : (jsub + 1) * Nb, :]
            w = rw_ref[jsub * Nb : (jsub + 1) * Nb, :]
        else:
            u, w = _residues(
                su_ref[jsub * Nb : (jsub + 1) * Nb, 0:1],
                rw_ref[0:1, :],
                m_f,
            )
        acc = _combine(zz, u, w, d1, Nb, span_l, z1_of)
        # n_out emission mask (one VPU select)
        row = (g * G + jsub) * Nb + jax.lax.broadcasted_iota(
            jnp.int32, (Nb, 1), 0
        )
        o_ref[jsub * Nb : (jsub + 1) * Nb, :] = jnp.where(
            row < n_out, acc, 0.0
        )


def build_async_combine(
    *, j_np: np.ndarray, s_np: np.ndarray, A: np.ndarray, taps: int,
    R: int, L: int, M: int, skew_periods: int, out_cap: int,
    precision: str = "bf16x4", interpret: bool = False,
    planes: bool = False,
):
    """Build the fused combine: ``fn(buffer [ring, R], base0 scalar,
    n_out scalar, r_arg, base_lane [8, R] f32) -> out [n_pad, R]``
    (n_out-masked; caller slices ``[:out_cap]``).  ``r_arg`` is the
    per-stream residue row ``[8, R]`` f32 (narrow), or the
    ``(u [n_pad, R], wrap [n_pad, R])`` plane tuple (``planes=True``,
    wide schedules — their residues exceed f32/int32 exactness, so the
    XLA step computes them exactly in u32; the extra ~2 planes of HBM
    traffic is the price of the u32 envelope).

    ``j_np``/``s_np`` are the static per-lane split tables ``(n*L)//M``
    / ``(n*L)%M`` (length >= out_cap; the shift form reads up to
    ``out_cap + kmax + GROUP*Nb`` entries, recomputed here from
    ``L``/``M`` and used only where they match the caller's table —
    wide schedules clamp ``j`` at the buffer edge), ``A [d1, taps]``
    the Farrow basis.

    The division ``frac = rem/M`` runs as ``rem * (1/M)`` on the VPU; vs
    the XLA step's f32 divide this differs by <= 1 ulp of frac — below
    the bf16x4/f32 contraction floor (differentially tested).

    Returns ``(fn, n_pad, reach)`` — ``reach`` is the highest buffer row
    the kernel can read relative to ``base0`` (for the caller's slack
    assert)."""
    if precision not in ("bf16x4", "highest"):
        raise ValueError(f"unknown precision {precision!r}")
    d1 = A.shape[0]
    Nb = NB
    G = GROUP
    n_pad = -(-out_cap // (Nb * G)) * (Nb * G)
    Ko = n_pad // Nb
    skew = int(skew_periods)

    # extended true split tables (shift form reads past out_cap)
    i_ext = np.arange(n_pad + MAX_KSHIFT + 1, dtype=np.int64)
    j_ext = (i_ext * L) // M

    # shift form: per-lane distance to the next row increment.  Only
    # valid when the recomputed unclamped table matches the caller's
    # (wide schedules clamp j at the buffer edge, where the neighbor-
    # shift identity breaks) — otherwise the dual form handles it.
    j_caller = np.asarray(j_np[:out_cap], np.int64)
    use_shift = False
    kmax = 0
    if L <= M and np.array_equal(j_ext[:out_cap], j_caller):
        k_n = np.zeros(n_pad, np.int64)
        ok = True
        for n in range(out_cap):
            nxt = np.nonzero(
                j_ext[n + 1 : n + MAX_KSHIFT + 1] == j_ext[n] + 1
            )[0]
            if nxt.size == 0:
                ok = False
                break
            k_n[n] = nxt[0] + 1
        if ok:
            kmax = int(k_n[:out_cap].max()) if out_cap else 1
            k_n[out_cap:] = 1  # padded lanes: any valid shift (masked)
            use_shift = kmax <= MAX_KSHIFT

    if use_shift:
        lanes = Nb + kmax
        n_copies = 1
        span = int(
            max(
                j_ext[k * Nb + lanes - 1] - j_ext[k * Nb]
                for k in range(Ko)
            )
        )
        s_dma = span + 1 + taps
        atlas_j = j_ext
    else:
        lanes = Nb
        n_copies = 2
        j_dual = np.concatenate(
            [j_caller,
             np.full(n_pad - out_cap,
                     int(j_caller[-1]) if out_cap else 0, np.int64)]
        )
        span = int(
            max(
                j_dual[k * Nb + Nb - 1] - j_dual[k * Nb]
                for k in range(Ko)
            )
        )
        s_dma = span + 1 + taps
        atlas_j = j_dual

    j_base = atlas_j[: Ko * Nb : Nb].astype(np.int32)  # [Ko]
    n_load = -(-(s_dma + skew + 8) // 8) * 8
    reach = int(j_base.max()) + n_load  # relative to aligned(base0)

    ab_np = _build_atlas(
        atlas_j, np.asarray(A, np.float32), Nb, Ko, s_dma, taps,
        n_copies, lanes,
    )
    rows2 = n_copies * d1 * lanes
    bf16x4 = precision == "bf16x4"
    # degree-banded correction cut: drop refinement products for degrees
    # whose rows sit <= 1e-3 of the basis max — their bf16 products are
    # >= 10x below the bf16x4 floor (|A_d| * 2^-8 relative)
    a_np = np.asarray(A, np.float64)
    rel = np.abs(a_np).max(axis=1) / np.abs(a_np).max()
    dc = d1 - 1
    while dc > 0 and rel[dc] <= 1e-3:
        dc -= 1
    rows_c = (dc + 1) * n_copies * lanes
    if bf16x4:
        hi = jnp.asarray(ab_np).astype(jnp.bfloat16)
        lo = (
            jnp.asarray(ab_np[:, :rows_c, :])
            - hi[:, :rows_c, :].astype(jnp.float32)
        ).astype(jnp.bfloat16)
        ab_c, ab2_c = hi, lo
        ab2_rows = rows_c
    else:
        ab_c = jnp.asarray(ab_np)
        ab2_c = jnp.zeros((Ko, 1, s_dma), jnp.float32)  # unused
        ab2_rows = 1

    if not planes:
        # static split plane, one value per output lane, lanes padded to
        # the f32 tile width (read back as [Nb, 1] columns per block)
        s_pad = np.zeros(n_pad, np.int64)
        s_pad[:out_cap] = np.asarray(s_np[:out_cap], np.int64)
        s_plane = jnp.asarray(
            np.broadcast_to(
                s_pad.astype(np.float32)[:, None], (n_pad, 128)
            ).copy()
        )
    if use_shift:
        k_plane = jnp.asarray(
            np.broadcast_to(
                k_n.astype(np.float32)[:, None], (n_pad, 128)
            ).copy()
        )

    kern = functools.partial(
        _kernel, G=G, Ko=Ko, Nb=Nb, d1=d1, s_dma=s_dma, skew=skew,
        n_load=n_load, m_f=float(M), bf16x4=bf16x4, rows_c=rows_c,
        planes=planes, use_shift=use_shift, kmax=kmax, lanes=lanes,
        n_copies=n_copies,
    )

    def fn(buffer, base0, n_out, r_arg, base_lane):
        scalars = jnp.concatenate(
            [
                jnp.reshape(jnp.asarray(base0, jnp.int32), (1,)),
                jnp.asarray(j_base, jnp.int32),
                jnp.reshape(jnp.asarray(n_out, jnp.int32), (1,)),
            ]
        )
        # operand order matches _kernel's unpack: ab, ab_lo, s-or-u,
        # r-or-wrap, [k-plane if shift], skewm, buffer
        in_specs = [
            pl.BlockSpec((G, rows2, s_dma), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, ab2_rows, s_dma), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if planes:
            u_plane, wrap_plane = r_arg
            in_specs += [
                pl.BlockSpec((G * Nb, R), lambda g, b: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G * Nb, R), lambda g, b: (g, 0),
                             memory_space=pltpu.VMEM),
            ]
            args = [ab_c, ab2_c, u_plane, wrap_plane]
        else:
            in_specs += [
                pl.BlockSpec((G * Nb, 128), lambda g, b: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, R), lambda g, b: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
            args = [ab_c, ab2_c, s_plane, r_arg]
        if use_shift:
            in_specs.append(
                pl.BlockSpec((G * Nb, 128), lambda g, b: (g, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(k_plane)
        in_specs += [
            pl.BlockSpec((8, R), lambda g, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        args += [base_lane, buffer]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Ko // G,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((G * Nb, R), lambda g, b: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, G, n_load, R), jnp.float32),
                pltpu.SemaphoreType.DMA((2, G)),
            ],
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_pad, R), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Ko * s_dma * R * (
                    (rows2 + 3 * ab2_rows) if bf16x4 else 6 * rows2
                ),
                bytes_accessed=(
                    Ko * rows2 * s_dma * 4
                    + Ko * n_load * R * 4
                    + n_pad * R * 4
                ),
                transcendentals=0,
            ),
            interpret=interpret,
        )(scalars, *args)

    return fn, n_pad, reach
