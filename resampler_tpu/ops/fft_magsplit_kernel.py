"""Fused banded magnitude-split FFT projector — the production TPU kernel.

The FFT engine's chunk operator, written in the input domain
(``out_t = [x_{t-1}; x_t] @ T2``, ``T2 [2N, M]``), is a banded Toeplitz
matrix with period structure ``T2[i+lp, j+mp] = T2[i, j]``
(``lp = N/g, mp = M/g, g = gcd(N, M)``): each ``mp``-column block only
reads a ``(g+1)``-period row band (entries outside are below the f32
design floor), and 99.7% of the operator's energy sits in ONE period.

``Precision.HIGH`` (what the dense projector path uses) spends three full
bf16 MXU passes.  This kernel exploits both structures:

- **pass 1**: one banded bf16 pass over the full ``g+1``-period band
  (numerically identical to a dense bf16 pass — the omitted tail is
  < 1.2e-7 of max);
- **correction**: the two refinement passes (``xh @ T2_lo`` and
  ``xl @ T2_hi``) matter only where ``|T2|`` is large, so they run over a
  ``w_p``-period magnitude band, stacked hi|lo into ONE dot per column
  group.

MXU work drops to ``(rows + 2*wc) / (3 * 2N)`` of HIGH (0.42x for
44.1<->48 kHz) while the measured noise floor *improves* (device,
[2N=2352] operator: 102.0 dB vs HIGH's 98.9).  XLA cannot be coaxed into
this schedule — every sliced-dot / conv lowering measured SLOWER than its
own fused HIGH matmul (experiments/fft_magsplit_sblock_probe.py); the
fused Pallas kernel measures **15.35 Gsamples/s vs HIGH's 10.0** at the
bench shape ([16384, 2352] @ [2352, 1280], v5e-1).

Plan selection is self-validating: ``plan_magsplit`` picks the narrowest
band whose HOST-simulated (bit-exact bf16, ml_dtypes) noise floor clears
``target_floor_db``, and returns ``None`` when the pair's geometry or
quality cannot — callers then fall back to the dense HIGH projector.

(reference analog: the FFT butterfly SIMD layer absorbed into the chunk
matmul, SURVEY.md §2.5; the banded structure is the same one documented
in ``engine.fft.input_domain_conv_operator``.)

CRITICAL implementation note: the hi/lo bf16 split must use integer bit
ops (``ops.matmul3.split_hi_lo``) — XLA silently simplifies the naive
``x - bf16(x).astype(f32)`` residual to zero under jit.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import threading

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matmul3 import split_hi_lo

__all__ = [
    "MagsplitPlan",
    "plan_magsplit",
    "magsplit_weights",
    "magsplit_projector",
    "magsplit_projector_pool",
    "simulate_magsplit_floor",
]


@dataclasses.dataclass(frozen=True)
class MagsplitPlan:
    """Static geometry of the banded magsplit projector for one pair."""

    n_in: int     # N
    n_out: int    # M
    g: int        # gcd(N, M) = column blocks
    lp: int       # period rows   N / g
    mp: int       # period cols   M / g
    bps: int      # column blocks fused per group
    b0: int       # correction band offset (periods, relative to block)
    w_p: int      # correction band width (periods)
    floor_db: float  # host-simulated noise floor of this plan

    @property
    def s(self) -> int:  # noqa: D102 - groups
        return self.g // self.bps

    @property
    def cols(self) -> int:
        return self.bps * self.mp

    @property
    def rows(self) -> int:  # pass-1 band rows per group (g+1 period span)
        return (self.bps + self.g) * self.lp

    @property
    def wc(self) -> int:  # correction band rows per group
        return (self.w_p + self.bps - 1) * self.lp

    @property
    def macs_per_sample(self) -> int:
        """MXU MACs per output sample (HIGH-dense spends 3 * 2N)."""
        return self.rows + 2 * self.wc


def _t2_f64(n_in: int, n_out: int) -> np.ndarray:
    from ..engine.fft import spectral_projection_matrix

    T = spectral_projection_matrix(n_in, n_out).astype(np.float64)
    return np.vstack([T[:, n_out:], T[:, :n_out]])  # [2N, M]


def _bf16_np(a: np.ndarray) -> np.ndarray:
    import ml_dtypes

    return a.astype(np.float32).astype(ml_dtypes.bfloat16).astype(np.float32)


def simulate_magsplit_floor(
    n_in: int, n_out: int, bps: int, b0: int, w_p: int, T2: np.ndarray
) -> float:
    """Bit-exact host simulation of the kernel's dataflow on white noise:
    returns -20*log10(rms error vs f64 / rms signal) in dB.  The device
    kernel differs only in f32 accumulation order."""
    g = math.gcd(n_in, n_out)
    lp, mp = n_in // g, n_out // g
    t2h = _bf16_np(T2)
    t2l = _bf16_np(T2 - t2h.astype(np.float64))
    rng = np.random.default_rng(7)
    x2 = rng.standard_normal((64, 2 * n_in)).astype(np.float32)
    hi = _bf16_np(x2)
    lo = _bf16_np(x2 - hi)
    cols = bps * mp
    rows = (bps + g) * lp
    wc = (w_p + bps - 1) * lp
    outs = []
    for q in range(g // bps):
        r0 = q * bps * lp
        rb = r0 + b0 * lp
        csl = slice(q * cols, (q + 1) * cols)
        y = hi[:, r0 : r0 + rows] @ t2h[r0 : r0 + rows, csl]
        y = y + hi[:, rb : rb + wc] @ t2l[rb : rb + wc, csl]
        y = y + lo[:, rb : rb + wc] @ t2h[rb : rb + wc, csl]
        outs.append(y)
    y = np.concatenate(outs, axis=1)
    ref = x2.astype(np.float64) @ T2
    err = y.astype(np.float64) - ref
    return float(-20 * np.log10(np.sqrt((err**2).mean() / (ref**2).mean())))


_PLAN_CACHE: dict[tuple, "MagsplitPlan | None"] = {}
_PLAN_LOCK = threading.Lock()


def plan_magsplit(
    n_in: int,
    n_out: int,
    *,
    target_floor_db: float = 103.0,
    bps: int = 2,
) -> MagsplitPlan | None:
    """Pick the narrowest correction band whose host-simulated noise floor
    clears ``target_floor_db``; ``None`` if the pair is ineligible.

    Eligibility mirrors ``conv_backend_viable`` (the band must have MXU
    meat: ``lp, mp >= 64``) plus ``g % bps == 0`` and ``g >= 2*bps`` (at
    least two column groups, otherwise the banding saves nothing),
    ``n_in <= 4096`` (larger pairs: host sim + weight build cost balloons
    and the dense/rfft paths are the right tools), and the resident
    weight stacks must fit VMEM (<= 40 MB — they are held on-chip across
    all row tiles).
    """
    key = (n_in, n_out, target_floor_db, bps)
    with _PLAN_LOCK:
        if key in _PLAN_CACHE:
            return _PLAN_CACHE[key]
    g = math.gcd(n_in, n_out)
    lp, mp = n_in // g, n_out // g
    plan: MagsplitPlan | None = None
    if (
        g % bps == 0 and g >= 2 * bps and lp >= 64 and mp >= 64
        and n_in <= 4096
    ):
        T2 = _t2_f64(n_in, n_out)
        # magnitude center: the period of block 0 with the largest entry
        blk = np.abs(T2[:, :mp])
        per_max = blk.reshape(2 * g, lp, mp).max(axis=(1, 2))
        center = int(np.argmax(per_max))
        for w_p in range(2, g + 2):
            b0 = min(max(center - (w_p - 1) // 2, 0), g + 1 - w_p)
            if b0 < 0:
                break
            floor = simulate_magsplit_floor(n_in, n_out, bps, b0, w_p, T2)
            if floor >= target_floor_db:
                plan = MagsplitPlan(
                    n_in=n_in, n_out=n_out, g=g, lp=lp, mp=mp, bps=bps,
                    b0=b0, w_p=w_p, floor_db=round(floor, 1),
                )
                # resident-weight VMEM budget
                wbytes = plan.s * (plan.rows + 2 * plan.wc) * plan.cols * 2
                if wbytes > 40 * 1024 * 1024:
                    plan = None
                break
    with _PLAN_LOCK:
        _PLAN_CACHE[key] = plan
    return plan


_WEIGHT_CACHE: dict[tuple, tuple] = {}
_WEIGHT_LOCK = threading.Lock()


def magsplit_weights(plan: MagsplitPlan):
    """Per-group weight stacks, cached process-wide (the analog of the
    reference's FFT_CACHE, reference: src/resampler_fft.rs:34-36):
    ``wh [S, rows, cols]`` bf16 (pass-1 band) and ``wcorr [S, 2*wc, cols]``
    bf16 (T2_lo band stacked over T2_hi band, matching the kernel's
    hi|lo-stacked correction operand)."""
    key = dataclasses.astuple(plan)
    with _WEIGHT_LOCK:
        cached = _WEIGHT_CACHE.get(key)
    if cached is not None:
        return cached
    T2 = _t2_f64(plan.n_in, plan.n_out)
    t2h = _bf16_np(T2)
    t2l = (T2 - t2h.astype(np.float64)).astype(np.float32)
    lp = plan.lp
    whs, wcs = [], []
    for q in range(plan.s):
        r0 = q * plan.bps * lp
        rb = r0 + plan.b0 * lp
        csl = slice(q * plan.cols, (q + 1) * plan.cols)
        whs.append(t2h[r0 : r0 + plan.rows, csl])
        wcs.append(
            np.concatenate(
                [t2l[rb : rb + plan.wc, csl], t2h[rb : rb + plan.wc, csl]],
                axis=0,
            )
        )
    out = (
        jnp.asarray(np.stack(whs), jnp.bfloat16),
        jnp.asarray(np.stack(wcs), jnp.bfloat16),
    )
    with _WEIGHT_LOCK:
        _WEIGHT_CACHE[key] = out
    return out


def _body(x2, wh_ref, wc_ref, o_ref, plan: MagsplitPlan):
    hi, lo = split_hi_lo(x2)
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


def _kernel(prev_ref, cur_ref, wh_ref, wc_ref, o_ref, *, plan: MagsplitPlan):
    x2 = jnp.concatenate([prev_ref[:], cur_ref[:]], axis=1)  # [tr, 2N] f32
    _body(x2, wh_ref, wc_ref, o_ref, plan)


def _kernel_pool(idx_ref, prev_ref, cur_ref, wh_ref, wc_ref, o_ref, *,
                 plan: MagsplitPlan):
    # prev/cur blocks are [1, tile_r, N] slices of the caller's pool,
    # selected by the scalar-prefetched slot indices (idx_ref is consumed
    # by the BlockSpec index maps, not here)
    x2 = jnp.concatenate([prev_ref[0], cur_ref[0]], axis=1)  # [tr, 2N]
    _body(x2, wh_ref, wc_ref, o_ref, plan)


def _tile_rows(r: int) -> int:
    for t in (512, 256, 128, 64, 32, 16, 8):
        if r % t == 0:
            return t
    raise ValueError(f"row count {r} not a multiple of 8")


@functools.partial(jax.jit, static_argnames=("plan", "interpret"))
def magsplit_projector(prev, cur, wh, wcorr, *, plan: MagsplitPlan,
                       interpret: bool = False):
    """``[prev | cur] @ T2`` at better-than-HIGH accuracy in ~0.42x the
    MXU work: ``prev, cur [R, N] f32 -> [R, M] f32``.  ``R`` is padded to
    a multiple of 8 internally."""
    R, n = prev.shape
    assert n == plan.n_in and cur.shape == (R, n)
    r_pad = -(-R // 8) * 8
    if r_pad != R:
        pad = ((0, r_pad - R), (0, 0))
        prev = jnp.pad(prev, pad)
        cur = jnp.pad(cur, pad)
    tile_r = _tile_rows(r_pad)
    kern = functools.partial(_kernel, plan=plan)
    out = pl.pallas_call(
        kern,
        grid=(r_pad // tile_r,),
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
        out_shape=jax.ShapeDtypeStruct((r_pad, plan.n_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_pad * (plan.rows + 2 * plan.wc) * plan.cols * plan.s,
            bytes_accessed=2 * r_pad * n * 4 + r_pad * plan.n_out * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(prev, cur, wh, wcorr)
    return out[:R] if r_pad != R else out


@functools.partial(jax.jit, static_argnames=("plan", "interpret"))
def magsplit_projector_pool(
    pool, idx_prev, idx_cur, wh, wcorr, *, plan: MagsplitPlan,
    interpret: bool = False,
):
    """Rotating-pool form of ``magsplit_projector``: reads
    ``prev = pool[idx_prev]`` and ``cur = pool[idx_cur]`` straight out of
    the caller's chunk pool via scalar-prefetched block index maps.

    A ``pallas_call`` cannot fuse a dynamic slice into its operand read,
    so the materialized form (``chunk_op(prev, pool[idx])``) pays an
    extra ``2 * R * N * 4`` bytes of HBM traffic per step just to stage
    its inputs — measured 27% of the FFT fleet step at the bench shape
    (engine-style varying feed, BENCH r4 40.2x vs the r3 scan-invariant
    56.6x).  Here the producer writes chunks into pool slots and the
    kernel reads them in place; the streaming state shrinks to one slot
    index.

    ``pool [P, R, N]`` f32 with ``R % 8 == 0``; ``idx_prev``/``idx_cur``
    traced int32 slot indices.  Returns ``[R, M]`` f32."""
    P, R, n = pool.shape
    assert n == plan.n_in, (n, plan.n_in)
    assert R % 8 == 0, R
    tile_r = _tile_rows(R)
    kern = functools.partial(_kernel_pool, plan=plan)
    idx = jnp.stack(
        [
            jnp.asarray(idx_prev, jnp.int32),
            jnp.asarray(idx_cur, jnp.int32),
        ]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // tile_r,),
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
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, plan.n_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * (plan.rows + 2 * plan.wc) * plan.cols * plan.s,
            bytes_accessed=2 * R * n * 4 + R * plan.n_out * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, pool, pool, wh, wcorr)
