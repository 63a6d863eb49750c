"""Probe: GROUPED manual-DMA variants of the tm periodic contraction.

The production banded DMA kernel (ops/fir_dma_kernel.py) runs K=28 grid
steps of one [160, 304] x [304, 2048] dot each and measures 0.518 ms at
the headline config — ~18.5 us per block, ~4x above both its compute
floor (~3 us f32-HIGHEST) and its DMA floor (~3.3 us at HBM peak).  The
hypothesis: per-grid-step / per-dot overhead dominates at these small
shapes.  Variants (all bit-checked vs the XLA einsum form; G blocks per
grid step, out stays k-major [Kg, G*M, R] = [K, M, R]):

  B  grouped sub-DMAs: G independent per-block DMAs land in a [G, S, R]
     scratch; G dots per grid step (same dot count as production, 4x
     fewer grid steps).
  D  UNION DMA: consecutive blocks overlap (stride L=147 rows of a
     304-row read), so one [752, R] DMA covers G=4 blocks — 38% less
     read traffic; G dots on static 8-aligned sub-slices, with the
     sub-slice misalignment (j*147 % 8) folded into a 16-variant
     shifted-atlas (a16[rem], ref-level dynamic index).
  E  union DMA + ONE block-Toeplitz dot per group: LHS [G*160, 752]
     (zero-padded shifted copies of the atlas, 2.45x FLOPs) x
     [752, 2048] — one wide MXU dot replaces G skinny ones.

Result (v5e-1, J=32 scan-amortized, ms/contraction; see ROUND3_NOTES):
run this file.

Usage: python experiments/fir_banded_group_dma_probe.py
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
    dma_banded_contract,
)
from resampler_tpu.types import Attenuation, Latency, reduce_ratio  # noqa: E402

L, M = reduce_ratio(44100, 48000)  # 147, 160
TAPS = Latency.Sample64.taps  # 128
SPAN = L + TAPS + 1  # 276
N_BLK = 1 + -(-(SPAN - L) // L)  # 2
S_LEN = N_BLK * L  # 294
S_DMA = -(-S_LEN // 8) * 8 + 8  # 304
S_DMA16 = -(-S_LEN // 8) * 8 + 16  # 312: room for shifts in [0, 16)


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
    )
    return jnp.einsum(
        "js,ksr->kjr", a_pad, segs,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [K, M, R]


# ---------------------------------------------------------------- variant B
def _kernel_b(base_ref, a8_ref, buf_ref, o_ref, seg_ref, sem_ref, *, Kg, G):
    g = pl.program_id(0)
    base = base_ref[0]

    def get_dma(slot, gg, j):
        start = base + (gg * G + j) * L
        aligned = (start // 8) * 8
        return pltpu.make_async_copy(
            buf_ref.at[pl.ds(aligned, S_DMA), :],
            seg_ref.at[slot, j],
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
    for j in range(G):
        rem = (base + (g * G + j) * L) % 8
        o_ref[0, j * M : (j + 1) * M] = jax.lax.dot(
            a8_ref[rem], seg_ref[g % 2, j],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


@functools.partial(jax.jit, static_argnames=("K", "R", "G", "interpret"))
def contract_b(buffer, base, a8, *, K, R, G, interpret=False):
    Kg = K // G
    kern = functools.partial(_kernel_b, Kg=Kg, G=G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Kg,),
        in_specs=[
            pl.BlockSpec((8, M, S_DMA), lambda g, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, G * M, R), lambda g, b: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, G, S_DMA, R), jnp.float32),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Kg, G * M, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * M * S_DMA * R * 6,
            bytes_accessed=K * S_DMA * R * 4 + K * M * R * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([base], jnp.int32), a8, buffer)


# ---------------------------------------------------------------- variant D
def _u_rows(G):
    return ((G - 1) * L) // 8 * 8 + S_DMA16


def _kernel_d(base_ref, a16_ref, buf_ref, o_ref, seg_ref, sem_ref, *,
              Kg, G, U):
    g = pl.program_id(0)
    base = base_ref[0]

    def get_dma(slot, gg):
        start = base + gg * G * L
        aligned = (start // 8) * 8
        return pltpu.make_async_copy(
            buf_ref.at[pl.ds(aligned, U), :],
            seg_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(g == 0)
    def _warm():
        get_dma(0, 0).start()

    @pl.when(g + 1 < Kg)
    def _next():
        get_dma((g + 1) % 2, g + 1).start()

    get_dma(g % 2, g).wait()
    rem0 = (base + g * G * L) % 8
    for j in range(G):
        s_j = (j * L) // 8 * 8              # static 8-aligned sub-slice
        e_j = rem0 + (j * L - s_j)           # in [0, 15)
        o_ref[0, j * M : (j + 1) * M] = jax.lax.dot(
            a16_ref[e_j], seg_ref[g % 2, s_j : s_j + S_DMA16],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


@functools.partial(jax.jit, static_argnames=("K", "R", "G", "interpret"))
def contract_d(buffer, base, a16, *, K, R, G, interpret=False):
    Kg = K // G
    U = _u_rows(G)
    kern = functools.partial(_kernel_d, Kg=Kg, G=G, U=U)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Kg,),
        in_specs=[
            pl.BlockSpec((16, M, S_DMA16), lambda g, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, G * M, R), lambda g, b: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, U, R), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Kg, G * M, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * M * S_DMA16 * R * 6,
            bytes_accessed=(K // G) * U * R * 4 + K * M * R * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([base], jnp.int32), a16, buffer)


# ---------------------------------------------------------------- variant E
def _kernel_e(base_ref, atoe_ref, buf_ref, o_ref, seg_ref, sem_ref, *,
              Kg, G, U):
    g = pl.program_id(0)
    base = base_ref[0]

    def get_dma(slot, gg):
        start = base + gg * G * L
        aligned = (start // 8) * 8
        return pltpu.make_async_copy(
            buf_ref.at[pl.ds(aligned, U), :],
            seg_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(g == 0)
    def _warm():
        get_dma(0, 0).start()

    @pl.when(g + 1 < Kg)
    def _next():
        get_dma((g + 1) % 2, g + 1).start()

    get_dma(g % 2, g).wait()
    rem0 = (base + g * G * L) % 8
    o_ref[0] = jax.lax.dot(
        atoe_ref[rem0], seg_ref[g % 2],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("K", "R", "G", "interpret"))
def contract_e(buffer, base, atoe, *, K, R, G, interpret=False):
    Kg = K // G
    U = _u_rows(G)
    kern = functools.partial(_kernel_e, Kg=Kg, G=G, U=U)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Kg,),
        in_specs=[
            pl.BlockSpec((8, G * M, U), lambda g, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, G * M, R), lambda g, b: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, U, R), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Kg, G * M, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (K // G) * G * M * U * R * 6,
            bytes_accessed=(K // G) * U * R * 4 + K * M * R * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([base], jnp.int32), atoe, buffer)


def build_a16(a):
    a16 = np.zeros((16, M, S_DMA16), np.float32)
    an = np.asarray(a)
    for r in range(16):
        a16[r, :, r : r + SPAN] = an[:, :SPAN]
    return jnp.asarray(a16)


def build_atoe(a, G):
    U = _u_rows(G)
    atoe = np.zeros((8, G * M, U), np.float32)
    an = np.asarray(a)
    for r in range(8):
        for j in range(G):
            c0 = r + j * L
            atoe[r, j * M : (j + 1) * M, c0 : c0 + SPAN] = an[:, :SPAN]
    return jnp.asarray(atoe)


def main():
    import builtins

    pr = functools.partial(builtins.print, flush=True)
    interp = "--interpret" in sys.argv
    if interp:
        jax.config.update("jax_platforms", "cpu")
    B, C, G = (64, 2, 4) if interp else (1024, 2, 4)
    cfg, a2, K, R, ring = build(B, C)
    assert K % G == 0, (K, G)
    pr(f"K={K} R={R} ring={ring} G={G} U={_u_rows(G)}")
    rng = np.random.default_rng(0)
    buffer = jnp.asarray(rng.standard_normal((ring, R)), jnp.float32)
    a = jnp.asarray(np.asarray(a2)[:M, :SPAN])
    a_pad = jnp.pad(a, ((0, 0), (0, S_LEN - SPAN)))
    a8 = build_shifted_atlas(a, SPAN, S_DMA)
    a16 = build_a16(a)
    atoe = build_atoe(a, G)

    base0 = 1234
    ref = np.asarray(
        jax.jit(functools.partial(xla_contract, K=K, R=R))(
            buffer, jnp.int32(base0), a_pad
        )
    )
    variants = {
        "prod": lambda b, bs: dma_banded_contract(
            b, bs, a, L=L, M=M, span=SPAN, K=K, interpret=interp
        ),
        "B-grouped": lambda b, bs: contract_b(
            b, bs, a8, K=K, R=R, G=G, interpret=interp),
        "D-union": lambda b, bs: contract_d(
            b, bs, a16, K=K, R=R, G=G, interpret=interp),
        "E-toeplitz": lambda b, bs: contract_e(
            b, bs, atoe, K=K, R=R, G=G, interpret=interp),
    }
    # --only NAME runs a single variant (one Mosaic compile per process:
    # a compiler hang then costs one run, not the sweep)
    only = None
    for i, arg in enumerate(sys.argv):
        if arg == "--only":
            only = sys.argv[i + 1]
    if only is not None:
        variants = {only: variants[only]}
    for name, fn in variants.items():
        got = np.asarray(fn(buffer, jnp.int32(base0))).reshape(K, M, R)
        d = np.abs(got - ref).max()
        pr(f"{name}: max |v - xla| = {d:.2e}")
        assert d < 1e-5, (name, d)
    if interp:
        pr("interpret-mode correctness OK")
        return

    J = 32

    @functools.partial(jax.jit, static_argnames=("mode",))
    def scan_many(buffer, *, mode):
        def body(carry, j):
            base = (j * 97) % 3000
            out = variants[mode](buffer, base)
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
    for mode in variants:
        t = time_fn(lambda b, _m=mode: scan_many(b, mode=_m), buffer)
        pr(
            f"{mode}: {t*1e3/J:.3f} ms/contraction = "
            f"{J*out_samples/t/1e9:.2f} Gsps (contraction-only)"
        )


if __name__ == "__main__":
    main()
