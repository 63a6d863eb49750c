"""Interpret-mode differentials for the fused async Pallas kernel.

``ops/fir_async_kernel.py`` is the production TPU path for the async
fleet; these cases run it in Pallas interpret mode against the XLA step
so the kernel's LOGIC (atlas geometry, shift/dual wrap handling, skew
select, in-kernel residues, n_out mask, the wide plane interface) is
covered by the default CPU suite — the Mosaic LOWERING is covered by
tests_tpu/test_async_device.py on hardware.  (reference per-kernel
differential rule: src/fft/butterflies/mod.rs:129-290.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resampler_tpu.engine import fir as fe
from resampler_tpu.types import Attenuation, reduce_ratio


def _run(kernel, in_hz, out_hz, taps, phases, feeds, chunk, skew=1,
         max_out=None):
    L, M = reduce_ratio(in_hz, out_hz)
    B, C = len(phases), 2
    cfg = fe.FirConfig(channels=C, taps=taps, ratio_num=L, ratio_den=M)
    cutoff = fe.fir_cutoff(taps, Attenuation.Db90, in_hz / out_hz)
    coeffs = fe.fir_coefficients(taps, Attenuation.Db90, cutoff)
    step = jax.jit(
        fe.make_fir_fleet_step_async_tm(
            cfg, coeffs, B, max_chunk=chunk, horizon=2,
            skew_periods=skew, kernel=kernel, max_out=max_out,
        )
    )
    st = fe.fir_fleet_init_async_tm(
        cfg, B, max_chunk=chunk, horizon=2,
        pos_num=np.asarray(phases, object), skew_periods=skew,
    )
    outs = []
    for nv, data in feeds:
        st, out, c, p = step(st, jnp.asarray(data), jnp.int32(nv))
        outs.append((np.asarray(out), int(p), int(c)))
    return outs


@pytest.mark.parametrize(
    "in_hz,out_hz,taps,phases,skew,max_out",
    [
        # narrow SHIFT form (j increments 0/1, kmax=2), ragged feed,
        # compaction at horizon=2, independent phases
        (44100, 44101, 64, [0, 14700, 44100], 1, None),
        # narrow DUAL form (downsampling), wrap bits on most lanes
        (48000, 44101, 32, [0, 999, 44000], 1, None),
        # shift form with skew_periods=2 and heavier upsampling (kmax~5)
        (22050, 96000, 16, [0, 100, 300], 2, None),
        # WIDE (u32 two-word) pair through the PLANE interface, with the
        # serving max_out bound
        (4_000_000_000, 4_000_000_001, 64, [0, 7, 1_000_000], 1, 512 + 64),
    ],
    ids=["shift", "dual", "shift_skew2", "wide_planes"],
)
def test_async_kernel_interpret_matches_xla(
    in_hz, out_hz, taps, phases, skew, max_out
):
    rng = np.random.default_rng(5)
    B, C, chunk = len(phases), 2, 512
    feeds = []
    for nv in [512, 0, 300, 512, 17, 512, 512, 400]:
        d = rng.standard_normal((chunk, B * C)).astype(np.float32)
        d[nv:] = 0.0
        feeds.append((nv, d))
    a = _run("xla", in_hz, out_hz, taps, phases, feeds, chunk, skew,
             max_out)
    b = _run("pallas_interpret", in_hz, out_hz, taps, phases, feeds,
             chunk, skew, max_out)
    total = 0
    for (oa, pa, ca), (ob, pb, cb) in zip(a, b):
        assert pa == pb and ca == cb
        if pa:
            # bf16x4 degree-banded contraction floor (~-105 dB)
            np.testing.assert_allclose(
                oa[:, :pa], ob[:, :pb], atol=8e-5
            )
            total += pa
    assert total > 1000


def test_async_kernel_rejects_wide_without_planes_gate():
    """Explicit kernel='pallas' on a wide pair builds the PLANE
    interface (no error) and matches; the old ValueError is gone."""
    L, M = reduce_ratio(600_011, 600_013)
    cfg = fe.FirConfig(channels=2, taps=32, ratio_num=L, ratio_den=M)
    assert cfg.wide
    cutoff = fe.fir_cutoff(32, Attenuation.Db90, 600_011 / 600_013)
    coeffs = fe.fir_coefficients(32, Attenuation.Db90, cutoff)
    step = fe.make_fir_fleet_step_async_tm(
        cfg, coeffs, 2, max_chunk=256, kernel="pallas_interpret"
    )
    st = fe.fir_fleet_init_async_tm(cfg, 2, max_chunk=256)
    rng = np.random.default_rng(1)
    data = rng.standard_normal((256, 4)).astype(np.float32)
    st, out, c, p = jax.jit(step)(st, jnp.asarray(data), jnp.int32(256))
    assert np.isfinite(np.asarray(out)).all()
