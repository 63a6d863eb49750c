"""Isolate the FIR kernel's atlas-window path on device:
a_big = a2[ds(i0_al, M+8)] -> switch(rem) -> roll(-c0) -> slice[:span]."""
import sys
from pathlib import Path
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).parent.parent))

from resampler_tpu.engine import fir as fe
from resampler_tpu.ops.fir_kernel import _build_atlas, _next_pow2
from resampler_tpu.types import Attenuation, reduce_ratio

L, M = reduce_ratio(44100, 48000)
taps = 64
cfg = fe.FirConfig(channels=2, taps=taps, ratio_num=L, ratio_den=M)
cutoff = fe.fir_cutoff(taps, Attenuation.Db90, 44100/48000)
coeffs = fe.fir_coefficients(taps, Attenuation.Db90, cutoff)
a2_np = _build_atlas(cfg, coeffs)
span = L + taps + 1
rows, width = a2_np.shape
print("atlas", a2_np.shape, "span", span, flush=True)


def make(variant, interpret):
    def kernel(s_ref, a2_ref, o_ref):
        i0 = s_ref[0]
        c0 = s_ref[1]
        i0_al = pl.multiple_of((i0 // 8) * 8, 8)
        rem_i = i0 - i0_al
        a_big = a2_ref[pl.ds(i0_al, M + 8), :]
        if variant == "noswitch":
            a_rows = a_big[:M, :]
        else:
            a_rows = jax.lax.switch(
                rem_i, [lambda k=k: a_big[k : k + M, :] for k in range(8)]
            )
        if variant == "noroll":
            o_ref[:, :] = a_rows[:, :span]
        else:
            o_ref[:, :] = pltpu.roll(a_rows, -c0, axis=1)[:, :span]

    def f(a2, i0, c0):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec((rows, width), lambda b, *_: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((M, span), lambda b, *_: (0, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((M, span), jnp.float32),
            interpret=interpret,
        )(jnp.asarray([i0, c0], jnp.int32), a2)
    return jax.jit(f)


def main():
    print("backend:", jax.default_backend(), flush=True)
    a2 = jnp.asarray(a2_np)
    for variant in ("full", "noswitch", "noroll"):
        dev = make(variant, False)
        itp = make(variant, True)
        bad = 0
        for i0, c0 in ((0, 0), (1, 0), (7, 6), (13, 11), (100, 91), (159, 146)):
            a = np.asarray(dev(a2, i0, c0))
            b = np.asarray(itp(a2, i0, c0))
            if not np.array_equal(a, b):
                bad += 1
                print(f"{variant:9s} i0={i0} c0={c0}: BAD maxdiff "
                      f"{np.abs(a-b).max():.3e} nwrong={(a!=b).sum()}", flush=True)
        if not bad:
            print(f"{variant:9s}: all OK", flush=True)


if __name__ == "__main__":
    main()
