"""Standalone pltpu.roll (tpu.dynamic_rotate) direction/wrap probe.

Round-1 finding: the fused Pallas FIR kernel is bit-exact in interpret
mode but shifted on real TPU; every dynamic window in it uses
``pltpu.roll(x, -traced_shift, axis=1)``.  Hypothesis: Mosaic's lowering
normalizes NEGATIVE dynamic shifts differently from the interpreter
(e.g. unsigned modulo).  This probe rolls an iota by traced shifts
(positive, negative, > width) on device and in interpret mode and prints
the first lane of each result.
"""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).parent.parent))

W = 256  # two 128-lane tiles


def make(interpret):
    def kernel(s_ref, x_ref, o_ref):
        o_ref[:, :] = pltpu.roll(x_ref[:, :], s_ref[0], axis=1)

    def f(x, s):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec((8, W), lambda *_: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, W), lambda *_: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32),
            interpret=interpret,
        )(jnp.asarray([s], jnp.int32), x)

    return jax.jit(f, static_argnums=())


def main():
    x = jnp.asarray(
        np.broadcast_to(np.arange(W, dtype=np.float32), (8, W)).copy()
    )
    dev = make(False)
    itp = make(True)
    print("backend:", jax.default_backend(), flush=True)
    for s in (0, 1, 5, -1, -5, -131, 131, W + 3, -W - 3):
        a = np.asarray(dev(x, s))[0, :6]
        b = np.asarray(itp(x, s))[0, :6]
        ref = np.roll(np.arange(W, dtype=np.float32), s)[:6]
        match_dev = "OK " if np.array_equal(a, ref) else "BAD"
        match_itp = "OK " if np.array_equal(b, ref) else "BAD"
        print(f"shift {s:5d}: dev {a} [{match_dev}]  itp {b} [{match_itp}]  "
              f"ref {ref}", flush=True)


if __name__ == "__main__":
    main()
