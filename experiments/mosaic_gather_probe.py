"""Feasibility probe: Mosaic's dynamic_gather (take_along_axis) on TPU.

The async tm fleet's take/combine/select fusion (ROUND4_NOTES ablation:
0.324 ms of the 0.698 ms step is post-contraction traffic) wants, inside
a Pallas kernel, a per-(lane, stream) row pick from a VMEM-resident
``y[rows, lanes]``:

    out[i, r] = y[idx[i, r], r]

jax 0.9 Mosaic lowers ``lax.gather`` ONLY as ``tpu.dynamic_gather`` with
``x.shape == indices.shape == out.shape`` (2D, axis 0 or 1) — i.e. the
``jnp.take_along_axis(x, idx, axis=0)`` form with idx the full shape of
``x``.  This probe checks (a) correctness of that form on the chip,
(b) whether it holds for sublane extents spanning many 8-row tiles, and
(c) its cost inside a realistic combine loop (8 gathers + Chebyshev
accumulate per tile).  Run: python experiments/mosaic_gather_probe.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def report(name, fn, *args, expect=None):
    try:
        out = jax.jit(fn)(*args)
        out = np.asarray(jax.block_until_ready(out))
        ok = True if expect is None else bool(np.allclose(out, expect))
        print(f"  {name}: SUPPORTED (correct={ok})")
        return ok
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"  {name}: UNSUPPORTED — {type(e).__name__}: {msg}")
        return False


def taa_case(rows, cols, seed=0):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.standard_normal((rows, cols)), jnp.float32)
    idx_np = rng.integers(0, rows, size=(rows, cols)).astype(np.int32)
    idx = jnp.asarray(idx_np)
    expect = np.take_along_axis(np.asarray(y), idx_np, axis=0)

    def k(y_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(y_ref[...], i_ref[...], axis=0)

    fn = lambda y, i: pl.pallas_call(  # noqa: E731
        k, out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32)
    )(y, i)
    return fn, y, idx, expect


def main():
    print("devices:", jax.devices())

    for rows, cols in [(256, 128), (320, 128), (2240, 128), (2240, 512)]:
        fn, y, idx, expect = taa_case(rows, cols)
        report(f"take_along_axis rows={rows} cols={cols}", fn, y, idx,
               expect=expect)

    # (c) realistic combine-tile cost: 8 gathers + Chebyshev accumulate,
    # grid over 9 lane tiles x 4 col tiles (the bench async shape),
    # versus the same kernel with plain rows (no gather).
    T, P, COLS, D1, GI, GR = 256, 320, 128, 8, 9, 4
    rng = np.random.default_rng(1)
    yb = jnp.asarray(rng.standard_normal((GI, P, D1, GR * COLS)), jnp.float32)
    ib = jnp.asarray(
        rng.integers(0, P, size=(GI, P, GR * COLS)).astype(np.int32)
    )
    ub = jnp.asarray(rng.standard_normal((GI, T, GR * COLS)), jnp.float32)

    def combine_kernel(y_ref, i_ref, u_ref, o_ref, *, gather):
        u = u_ref[0]
        idx = i_ref[0]
        t0 = jnp.ones_like(u)
        t1 = u
        acc = jnp.zeros_like(u)
        for d in range(D1):
            yd = y_ref[0, :, d, :]
            g = (
                jnp.take_along_axis(yd, idx, axis=0)[:T]
                if gather
                else yd[:T]
            )
            acc = acc + t0 * g
            t0, t1 = t1, 2.0 * u * t1 - t0
        o_ref[0] = acc

    def run(gather):
        import functools

        return pl.pallas_call(
            functools.partial(combine_kernel, gather=gather),
            grid=(GI, GR),
            in_specs=[
                pl.BlockSpec((1, P, D1, COLS), lambda i, r: (i, 0, 0, r)),
                pl.BlockSpec((1, P, COLS), lambda i, r: (i, 0, r)),
                pl.BlockSpec((1, T, COLS), lambda i, r: (i, 0, r)),
            ],
            out_specs=pl.BlockSpec((1, T, COLS), lambda i, r: (i, 0, r)),
            out_shape=jax.ShapeDtypeStruct((GI, T, GR * COLS), jnp.float32),
        )(yb, ib, ub)

    for gather in (False, True):
        name = "combine+gather" if gather else "combine plain  "
        try:
            f = jax.jit(lambda: run(gather))
            r = jax.block_until_ready(f())
            t0 = time.perf_counter()
            n = 50
            for _ in range(n):
                r = f()
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / n * 1e3
            print(f"  {name}: {dt:.4f} ms per call")
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}")


if __name__ == "__main__":
    main()
