"""Probe: FUSED-FEED banded contraction — read blocks from carry||chunk.

The tm step's append DUS writes the whole [4096, 2048] chunk into the
ring every step (~33.5 MB of HBM writes) although only ~300 leftover
rows are ever needed again; the ring exists solely so the contraction
has one contiguous buffer to read.  This probe validates the
alternative: the DMA contraction reads each block STRAIGHT from the
incoming chunk (still in HBM where the host put it), with a small
carry buffer covering history.

Virtual buffer: V[i] = carry_ext[i] (i < h) else chunk[i - h], where
carry_ext[0:h] is retained history and carry_ext[h:h+DUP] REPLICATES
chunk[:DUP] (one small copy) so blocks near the boundary never straddle
refs.  Routing is STATIC per block k: blocks k < K0 read carry_ext,
blocks k >= K0 read the chunk at traced offset base + k*L - h (h is the
traced leftover length, bounded by H_MAX; DUP is sized so both routes
are valid over the whole (base, h) range).  Start alignment uses the
production aligned-floor + 8-shifted-atlas trick on BOTH refs.

What the redesign buys (if fir_step_ablation_probe shows feed >> feed_b):
the 33.5 MB append disappears; state shrinks from the 70k-row ring
(~573 MB at R=2048) to ~1.2k rows (~10 MB) — a 50x serving-memory cut.

Usage:
  python experiments/fir_fused_feed_probe.py --interpret   # CPU logic
  python experiments/fir_fused_feed_probe.py               # TPU timing
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

from resampler_tpu.engine import fir as fe  # noqa: E402
from resampler_tpu.ops.fir_dma_kernel import (  # noqa: E402
    build_shifted_atlas,
)
from resampler_tpu.types import Attenuation, Latency, reduce_ratio  # noqa: E402

L, M = reduce_ratio(44100, 48000)  # 147, 160
TAPS = Latency.Sample64.taps
SPAN = L + TAPS + 1
N_BLK = 1 + -(-(SPAN - L) // L)
S_LEN = N_BLK * L
S_DMA = -(-S_LEN // 8) * 8 + 8

#: leftover-length bound: steady-state h = avail - consumed stays under
#: one period + slack; generous static bound
H_MAX = -(-(S_LEN + 2 * M) // 8) * 8
#: chunk-head replication rows: carry route must cover
#: (K0-1)*L + S_LEN + (M-1) - h_min worst case
K0 = -(-H_MAX // L)  # first chunk-routed block
DUP = -(-((K0 - 1) * L + S_LEN + M) // 8) * 8  # carry_ext rows past h
CE = H_MAX + DUP  # carry_ext height


def _kernel(sc_ref, a8_ref, carry_ref, chunk_ref, o_ref, seg_ref, sem_ref,
            *, K, n_in):
    k = pl.program_id(0)
    base = sc_ref[0]
    h = sc_ref[1]

    def chunk_start(kk):
        # clamp like the production step clamps base to avail: blocks
        # whose reads would pass the chunk end belong to schedule-
        # discarded outputs (emission needs offset + taps <= avail), so
        # a clamped garbage read is harmless and keeps the DMA in range
        return jnp.maximum(
            jnp.minimum(base + kk * L - h, n_in - S_DMA), 0
        )

    def dma_carry(slot, kk):
        start = base + kk * L
        aligned = (start // 8) * 8
        return pltpu.make_async_copy(
            carry_ref.at[pl.ds(aligned, S_DMA), :],
            seg_ref.at[slot],
            sem_ref.at[slot],
        )

    def dma_chunk(slot, kk):
        aligned = (chunk_start(kk) // 8) * 8
        return pltpu.make_async_copy(
            chunk_ref.at[pl.ds(aligned, S_DMA), :],
            seg_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(k == 0)
    def _warm():
        (dma_carry if 0 < K0 else dma_chunk)(0, 0).start()

    # next-block prefetch: the route flips once at the static K0, so
    # predicate the two starts on the grid index
    @pl.when((k + 1 < K) & (k + 1 < K0))
    def _next_carry():
        dma_carry((k + 1) % 2, k + 1).start()

    @pl.when((k + 1 < K) & (k + 1 >= K0))
    def _next_chunk():
        dma_chunk((k + 1) % 2, k + 1).start()

    @pl.when(k < K0)
    def _wait_carry():
        dma_carry(k % 2, k).wait()

    @pl.when(k >= K0)
    def _wait_chunk():
        dma_chunk(k % 2, k).wait()

    rem_c = (base + k * L) % 8
    rem_x = chunk_start(k) % 8
    rem = jnp.where(k < K0, rem_c, rem_x)
    a_r = a8_ref[rem]
    o_ref[0] = jax.lax.dot(
        a_r, seg_ref[k % 2],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def fused_contract(carry_ext, chunk, base, h, a8, *, K, interpret=False):
    n_in, R = chunk.shape
    kern = functools.partial(_kernel, K=K, n_in=n_in)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((8, M, S_DMA), lambda k, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, M, R), lambda k, b: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, S_DMA, R), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    scalars = jnp.stack(
        [jnp.asarray(base, jnp.int32), jnp.asarray(h, jnp.int32)]
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, M, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * M * S_DMA * R * 6,
            bytes_accessed=K * S_DMA * R * 4 + K * M * R * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scalars, a8, carry_ext, chunk)


def main():
    import builtins

    pr = functools.partial(builtins.print, flush=True)
    interp = "--interpret" in sys.argv
    if interp:
        jax.config.update("jax_platforms", "cpu")
    B, C = (64, 2) if interp else (1024, 2)
    R = B * C
    n_in = 4096
    cfg = fe.FirConfig(channels=C, taps=TAPS, ratio_num=L, ratio_den=M)
    cutoff = fe.fir_cutoff(TAPS, Attenuation.Db90, 44100 / 48000)
    coeffs = fe.fir_coefficients(TAPS, Attenuation.Db90, cutoff)
    a2 = np.asarray(fe._sync_atlas(cfg, coeffs))
    K = -(-cfg.out_capacity // M)
    a = jnp.asarray(a2[:M, :SPAN])
    a8 = build_shifted_atlas(a, SPAN, S_DMA)
    pr(f"K={K} K0={K0} H_MAX={H_MAX} DUP={DUP} CE={CE} R={R}")
    # sanity: every block's worst-case read fits its routed ref
    assert (K0 - 1) * L + (M - 1) + S_DMA <= CE, "carry route overflow"
    assert K0 * L >= H_MAX, "chunk route underflow"

    rng = np.random.default_rng(0)
    chunk = jnp.asarray(rng.standard_normal((n_in, R)), jnp.float32)
    hist = rng.standard_normal((H_MAX, R)).astype(np.float32)

    def make_carry_ext(h):
        ce = np.zeros((CE, R), np.float32)
        ce[:h] = hist[H_MAX - h :] if h else ce[:0]
        ce[h : h + DUP] = np.asarray(chunk)[:DUP]
        return jnp.asarray(ce)

    def ref_out(h, base):
        v = np.concatenate(
            [hist[H_MAX - h :], np.asarray(chunk),
             np.zeros((K * L + SPAN, R), np.float32)],
            axis=0,
        )
        out = np.zeros((K, M, R), np.float32)
        an = np.asarray(a)
        for k in range(K):
            seg = v[base + k * L : base + k * L + SPAN]
            out[k] = (
                an.astype(np.float64) @ seg.astype(np.float64)
            ).astype(np.float32)
        return out

    for h in (0, 8, 133, H_MAX - 1):
        for base in (0, 7, M - 1):
            # chunk-routed blocks need base + k*L - h >= 0 at k = K0 --
            # guaranteed by K0*L >= H_MAX >= h
            ce = make_carry_ext(h)
            got = np.asarray(
                fused_contract(ce, chunk, base, h, a8, K=K, interpret=interp)
            )
            ref = ref_out(h, base)
            # only blocks whose full S_DMA read fits the virtual buffer
            # are schedule-valid; later blocks are clamped garbage for
            # discarded outputs (same contract as the production clamp)
            k_cmp = (h + n_in - S_DMA - base) // L + 1
            k_cmp = max(0, min(K, k_cmp))
            d = np.abs(got[:k_cmp] - ref[:k_cmp]).max()
            pr(f"h={h} base={base}: k_cmp={k_cmp} "
               f"max|fused - ref| = {d:.2e}")
            assert k_cmp >= K - 3 and d < 2e-4, (h, base, k_cmp, d)
    pr("fused-feed correctness OK")
    if interp:
        return

    # TPU timing: J-scan amortized, varying (base, h)
    J = 32

    @jax.jit
    def scan_many(ce, chunk):
        def body(carry, j):
            base = (j * 31) % M
            h = (j * 53) % (H_MAX - 8)
            out = fused_contract(ce, chunk, base, h, a8, K=K)
            return carry + jnp.max(jnp.abs(out)), None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(J, dtype=jnp.int32)
        )
        return acc

    ce = make_carry_ext(100)
    for _ in range(2):
        r = scan_many(ce, chunk)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        r = scan_many(ce, chunk)
    jax.block_until_ready(r)
    t = (time.perf_counter() - t0) / reps
    out_samples = K * M * R
    pr(
        f"fused: {t*1e3/J:.3f} ms/contraction = "
        f"{J*out_samples/t/1e9:.2f} Gsps (contraction-only)"
    )


if __name__ == "__main__":
    main()
