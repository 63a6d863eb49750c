"""Isolate the FIR kernel's region path on device: roll -> scratch store
-> ref-reshape [C, (K+n)L] -> [C, K+n, L] -> per-shift matmul sum."""
import sys
from pathlib import Path
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).parent.parent))

C, L, K, n_blk, taps = 2, 147, 28, 2, 64
span = L + taps + 1
region_cols = (K + n_blk) * L   # 4410
EXT = 8192
M = 160


def make(variant, interpret):
    def kernel(s_ref, ext_ref, a_ref, out_ref, region_ref):
        shift = s_ref[0]
        ext = ext_ref[:, :]
        region_ref[:, :] = pltpu.roll(ext, -shift, axis=1)[:, :region_cols]
        blocks3 = region_ref.reshape(C, K + n_blk, L)
        if variant == "reshape":
            # read back through the reshaped view and flatten again
            out_ref[:, :] = blocks3[:, 0:K, :].reshape(C * K, L)
        else:
            a_pad = a_ref[:, :]
            acc = jnp.zeros((C * K, M), jnp.float32)
            for bb in range(n_blk):
                seg = blocks3[:, bb : bb + K, :].reshape(C * K, L)
                acc = acc + jax.lax.dot_general(
                    seg, a_pad[:, bb * L : (bb + 1) * L],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            out_ref[:, :] = acc

    out_shape = (C * K, L) if variant == "reshape" else (C * K, M)

    def f(ext, a, s):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[
                    pl.BlockSpec((C, EXT), lambda b, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((M, n_blk * L), lambda b, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(out_shape, lambda b, *_: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((C, region_cols), jnp.float32)]),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            interpret=interpret,
        )(jnp.asarray([s], jnp.int32), ext, a)
    return jax.jit(f)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    ext = jnp.asarray(rng.standard_normal((C, EXT)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((M, n_blk * L)), jnp.float32)
    for variant in ("reshape", "matmul"):
        dev = make(variant, False)
        itp = make(variant, True)
        for s in (0, 1, 137, 2000):
            x = np.asarray(dev(ext, a, s))
            y = np.asarray(itp(ext, a, s))
            ok = np.array_equal(x, y)
            print(f"{variant:8s} s={s:5d}: {'OK' if ok else f'BAD maxdiff {np.abs(x-y).max():.3e} nwrong {(x!=y).sum()}'}",
                  flush=True)


if __name__ == "__main__":
    main()
