"""Bisect the Pallas FIR kernel's copy-in divergence: minimal kernels
reproducing the ext = concat([buf, chunk, zeros]) -> roll(-to_copy) ->
slice[:alloc] pattern at the real sizes, device vs interpret."""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).parent.parent))

C, VALID_END, N_IN = 2, 4096, 512
SLACK = 2816  # read_slack for the 147/160 taps=64 config
ALLOC = VALID_END + SLACK
EXT = -(-(ALLOC + N_IN) // 128) * 128


def make(interpret, variant):
    def kernel(tc_ref, buf_ref, chunk_ref, out_ref):
        to_copy = tc_ref[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, N_IN), 1)
        chunk_masked = jnp.where(col < to_copy, chunk_ref[0].T, 0.0)
        if variant == "full":
            ext = jnp.concatenate(
                [buf_ref[0, :, :VALID_END], chunk_masked,
                 jnp.zeros((C, EXT - VALID_END - N_IN), jnp.float32)], axis=1)
            out_ref[0] = pltpu.roll(ext, -to_copy, axis=1)[:, :ALLOC]
        elif variant == "nomask":
            ext = jnp.concatenate(
                [buf_ref[0, :, :VALID_END], chunk_ref[0].T,
                 jnp.zeros((C, EXT - VALID_END - N_IN), jnp.float32)], axis=1)
            out_ref[0] = pltpu.roll(ext, -to_copy, axis=1)[:, :ALLOC]
        elif variant == "noconcat":
            # roll the buffer alone (pad buf to EXT width via static zeros)
            ext = jnp.concatenate(
                [buf_ref[0], jnp.zeros((C, EXT - ALLOC), jnp.float32)], axis=1)
            out_ref[0] = pltpu.roll(ext, -to_copy, axis=1)[:, :ALLOC]

    def step(bufs, chunks, to_copy):
        B = bufs.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, C, ALLOC), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N_IN, C), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, C, ALLOC), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, C, ALLOC), jnp.float32),
            interpret=interpret,
        )(to_copy, bufs, chunks)

    return jax.jit(step)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    B = 3
    bufs = jnp.asarray(rng.standard_normal((B, C, ALLOC)), jnp.float32)
    chunks = jnp.asarray(rng.standard_normal((B, N_IN, C)), jnp.float32)
    for variant in ("full", "nomask", "noconcat"):
        dev = make(False, variant)
        itp = make(True, variant)
        for tc in (0, 1, 137, 512):
            tcv = jnp.full((B,), tc, jnp.int32)
            a = np.asarray(dev(bufs, chunks, tcv))
            b = np.asarray(itp(bufs, chunks, tcv))
            d = np.abs(a - b).max()
            if d > 0:
                # locate first mismatch
                idx = np.argwhere(a != b)
                print(f"{variant:9s} tc={tc:4d}: MAXDIFF {d:.3e} first@{idx[0]} n={len(idx)}", flush=True)
            else:
                print(f"{variant:9s} tc={tc:4d}: OK", flush=True)


if __name__ == "__main__":
    main()
