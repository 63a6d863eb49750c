"""Probe: manual-DMA region access for the tm sync-fleet contraction.

ROUND2_NOTES' last named FIR lever (~+13%): the tm step materializes
``region`` ([~4.6k, R] dynamic_slice, ~38 MB) and ``segs`` ([K, s_len, R]
shifted-concat, ~66 MB) in HBM before the fat einsum reads them back
(~72 MB/step of avoidable traffic at the bench config).  A Pallas kernel
with the ring buffer in ANY memory space can DMA each block's
``buffer[base + k*L : +s_len, :]`` slice directly into VMEM scratch
(double-buffered, overlapped with the dot) — zero intermediates.

Risk, known from the round-2 fused sync kernel: many small dots in one
Mosaic invocation carry ~0.65 ms of fixed overhead (27 dots/tile).  Here
each block is one GRID step (its own output block), which Mosaic
pipelines differently — this probe measures whether that escapes the
small-dot overhead.

Isolates the CONTRACTION only (append/consume/mask stay XLA in both
arms): XLA region+segs+einsum vs the DMA kernel, J=32 dispatch-amortized
iterations with varying base.  Bit-equivalence checked first.

Usage: python experiments/fir_tm_dma_probe.py
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
from resampler_tpu.types import Attenuation, Latency, reduce_ratio  # noqa: E402

L, M = reduce_ratio(44100, 48000)  # 147, 160
TAPS = Latency.Sample64.taps  # 128
SPAN = L + TAPS + 1  # 276
N_BLK = 1 + -(-(SPAN - L) // L)  # 2
S_LEN = N_BLK * L  # 294
#: DMA slice shapes must be 8-row aligned (Mosaic tiling); the dot
#: uses the first S_LEN rows of the padded scratch slot.
S_DMA = -(-S_LEN // 8) * 8 + 8  # 304: aligned superset + 8 slack rows
#: Mosaic must PROVE the DMA start is 8-aligned; base + k*L is not,
#: so the DMA reads from the aligned floor and the kernel slices the
#: traced sub-tile remainder inside VMEM.


def build(B=1024, C=2, chunk=4096):
    cfg = fe.FirConfig(channels=C, taps=TAPS, ratio_num=L, ratio_den=M)
    cutoff = fe.fir_cutoff(TAPS, Attenuation.Db90, 44100 / 48000)
    coeffs = fe.fir_coefficients(TAPS, Attenuation.Db90, cutoff)
    a2 = jnp.asarray(fe._sync_atlas(cfg, coeffs))
    K = -(-cfg.out_capacity // M)
    R = B * C
    ring = -(-(cfg.input_capacity + cfg.read_slack + 16 * chunk) // 256) * 256
    return cfg, a2, K, R, ring


def xla_contract(buffer, base, a_pad, *, K, R):
    region_rows = (K + N_BLK) * L
    region = jax.lax.dynamic_slice(buffer, (base, 0), (region_rows, R))
    blocks = region.reshape(K + N_BLK, L, R)
    segs = jnp.concatenate(
        [blocks[bb : bb + K] for bb in range(N_BLK)], axis=1
    )  # [K, s_len, R]
    out = jnp.einsum(
        "js,ksr->kjr", a_pad, segs,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out  # [K, M, R]


def _dma_kernel(base_ref, a8_ref, buf_ref, o_ref, seg_ref, sem_ref, *, K, R):
    k = pl.program_id(0)
    base = base_ref[0]

    def get_dma(slot, kk):
        start = base + kk * L
        aligned = (start // 8) * 8
        return pltpu.make_async_copy(
            buf_ref.at[pl.ds(aligned, S_DMA), :],
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
    # The traced sub-tile remainder is absorbed into the WEIGHTS: a8[r]
    # is the atlas with its columns pre-shifted by r, so the big segment
    # operand keeps a static slice and only the tiny [M, S_DMA] weight
    # tensor is dynamically indexed (8-way select on 45k elements; a
    # traced dynamic_slice of the 2.5 MB segment instead hung the Mosaic
    # compiler for >10 min).
    rem = (base + k * L) % 8
    a_r = a8_ref[rem]  # dynamic major-axis ref index (supported)
    o_ref[0] = jax.lax.dot(
        a_r, seg_ref[k % 2],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("K", "R"))
def dma_contract(buffer, base, a_pad, *, K, R):
    kern = functools.partial(_dma_kernel, K=K, R=R)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((8, M, S_DMA), lambda k, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, M, R), lambda k, b: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, S_DMA, R), jnp.float32),
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
            flops=2 * K * M * S_LEN * R,
            bytes_accessed=K * S_LEN * R * 4 + K * M * R * 4,
            transcendentals=0,
        ),
    )(jnp.asarray([base], jnp.int32), a_pad, buffer)


def build_a8(a):
    """[8, M, S_DMA]: a8[r, :, r:r+SPAN] = a — column shifts matching
    the 8 possible DMA sub-tile remainders."""
    a8 = np.zeros((8, M, S_DMA), np.float32)
    an = np.asarray(a)
    for r in range(8):
        a8[r, :, r : r + SPAN] = an[:, :SPAN]
    return jnp.asarray(a8)


def main():
    import builtins

    pr = functools.partial(builtins.print, flush=True)
    B, C = 1024, 2
    cfg, a2, K, R, ring = build(B, C)
    pr(f"K={K} R={R} ring={ring} s_len={S_LEN}")
    rng = np.random.default_rng(0)
    buffer = jnp.asarray(rng.standard_normal((ring, R)), jnp.float32)
    a = jnp.asarray(np.asarray(a2)[:M, :SPAN])
    a_pad = jnp.pad(a, ((0, 0), (0, S_LEN - SPAN)))
    a8 = build_a8(a)

    # correctness
    base0 = 1234
    ref = np.asarray(
        jax.jit(functools.partial(xla_contract, K=K, R=R))(
            buffer, jnp.int32(base0), a_pad
        )
    )
    got = np.asarray(dma_contract(buffer, jnp.int32(base0), a8, K=K, R=R))
    d = np.abs(got - ref).max()
    pr(f"max |dma - xla| = {d:.2e}")
    assert d < 1e-5, d

    # dispatch-amortized timing: J iterations, varying base
    J = 32

    @functools.partial(jax.jit, static_argnames=("mode",))
    def scan_many(buffer, a_pad, *, mode):
        def body(carry, j):
            base = (j * 97) % 3000
            if mode == "xla":
                out = xla_contract(buffer, base, a_pad, K=K, R=R)
            else:
                out = dma_contract(buffer, base, a8, K=K, R=R)
            return carry + jnp.max(jnp.abs(out)), None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(J, dtype=jnp.int32)
        )
        return acc

    def time_fn(fn, *args, reps=4, warmup=2):
        for _ in range(warmup):
            r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps

    out_samples = K * M * R
    for mode in ("xla", "dma"):
        t = time_fn(
            lambda b, ap, _m=mode: scan_many(b, ap, mode=_m), buffer, a_pad
        )
        pr(
            f"{mode}: {t*1e3/J:.3f} ms/contraction = "
            f"{J*out_samples/t/1e9:.2f} Gsps (contraction-only)"
        )


if __name__ == "__main__":
    main()
