"""Find where pltpu.roll with a traced shift silently degrades:
sweep width (lane tiles) x sublane count x block rank."""
import sys
from pathlib import Path
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).parent.parent))


def make(rows, width, rank3, interpret):
    def kernel(s_ref, x_ref, o_ref):
        if rank3:
            o_ref[0] = pltpu.roll(x_ref[0], -s_ref[0], axis=1)
        else:
            o_ref[:, :] = pltpu.roll(x_ref[:, :], -s_ref[0], axis=1)

    shape = (1, rows, width) if rank3 else (rows, width)
    blk = pl.BlockSpec(shape, (lambda b, *_: (0, 0, 0)) if rank3 else (lambda b, *_: (0, 0)),
                       memory_space=pltpu.VMEM)

    def f(x, s):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[blk], out_specs=blk),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            interpret=interpret,
        )(jnp.asarray([s], jnp.int32), x)
    return jax.jit(f)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    for rows, width, rank3 in [
        (8, 256, False),
        (8, 7424, False),
        (2, 256, False),
        (2, 7424, False),
        (2, 7424, True),
        (8, 1024, False),
        (8, 4096, False),
    ]:
        shape = (1, rows, width) if rank3 else (rows, width)
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        dev = make(rows, width, rank3, False)
        ok_all = True
        for s in (1, 137):
            a = np.asarray(dev(x, s))
            ref = np.roll(np.asarray(x), -s, axis=-1)
            ok = np.array_equal(a, ref)
            ok_all &= ok
            if not ok:
                nz = int((a != ref).sum())
                print(f"rows={rows} w={width} rank3={rank3} s={s}: BAD ({nz} wrong)", flush=True)
        if ok_all:
            print(f"rows={rows} w={width} rank3={rank3}: OK", flush=True)


if __name__ == "__main__":
    main()
