"""Can a static lane-offset slice of a value feed a dot directly on
device (no concat)?  Decides the window-extraction strategy for the
fused sync-fleet kernel."""
import sys
from pathlib import Path
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).parent.parent))

TM, W, SPAN, MCOL, KWIN, L = 64, 8192, 276, 160, 4, 147


def make(interpret):
    def kernel(s_ref, x_ref, a_ref, o_ref):
        rolled = pltpu.roll(x_ref[:, :], -s_ref[0], axis=1)
        for k in range(KWIN):
            seg = rolled[:, k * L : k * L + SPAN]          # offset slice
            o_ref[:, k * MCOL : (k + 1) * MCOL] = jax.lax.dot_general(
                seg, a_ref[:, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    def f(x, a, s):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[
                    pl.BlockSpec((TM, W), lambda b, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((MCOL, SPAN), lambda b, *_: (0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((TM, KWIN * MCOL), lambda b, *_: (0, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((TM, KWIN * MCOL), jnp.float32),
            interpret=interpret,
        )(jnp.asarray([s], jnp.int32), x, a)
    return jax.jit(f)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((TM, W)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((MCOL, SPAN)), jnp.float32)
    dev, itp = make(False), make(True)
    for s in (0, 137, 2000):
        u = np.asarray(dev(x, a, s))
        v = np.asarray(itp(x, a, s))
        ok = np.allclose(u, v, atol=1e-4)
        exact = np.array_equal(u, v)
        print(f"s={s:5d}: {'EXACT' if exact else ('CLOSE' if ok else f'BAD maxdiff {np.abs(u-v).max():.3e}')}",
              flush=True)


if __name__ == "__main__":
    main()
