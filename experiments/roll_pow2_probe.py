"""Confirm the pltpu.roll width requirement: power-of-two widths?"""
import sys
from pathlib import Path
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).parent.parent))


def make(width):
    def kernel(s_ref, x_ref, o_ref):
        o_ref[:, :] = pltpu.roll(x_ref[:, :], -s_ref[0], axis=1)

    blk = pl.BlockSpec((8, width), lambda b, *_: (0, 0),
                       memory_space=pltpu.VMEM)

    def f(x, s):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[blk], out_specs=blk),
            out_shape=jax.ShapeDtypeStruct((8, width), jnp.float32),
        )(jnp.asarray([s], jnp.int32), x)
    return jax.jit(f)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    for width in (2048, 3072, 4224, 8192, 512 + 128):
        x = jnp.asarray(rng.standard_normal((8, width)), jnp.float32)
        dev = make(width)
        a = np.asarray(dev(x, 137))
        ref = np.roll(np.asarray(x), -137, axis=-1)
        ok = np.array_equal(a, ref)
        print(f"w={width:5d} ({width//128:3d} tiles, pow2={width & (width-1) == 0}): "
              f"{'OK' if ok else 'BAD'}", flush=True)


if __name__ == "__main__":
    main()
