"""On-device differential for the fused Pallas FIR kernel (NON-interpret)
— the honest hardware gate VERDICT r1 #4 asked for.

Round-2 root causes this guards against regressing (both were SILENT
wrong-answer bugs, not compile errors):
- tpu.dynamic_rotate with a traced shift requires a POWER-OF-TWO lane
  width (experiments/roll_pow2_probe.py);
- ref-level lane-split reshape ([C, N*L] -> [C, N, L] with L % 128 != 0)
  reads garbage (experiments/region_probe.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from resampler_tpu.engine import fir as fe
from resampler_tpu.ops.fir_kernel import make_fir_fleet_step_pallas
from resampler_tpu.types import Attenuation, reduce_ratio


@pytest.mark.parametrize("in_hz,out_hz,taps", [(44100, 48000, 64)])
def test_pallas_kernel_matches_xla_on_device(in_hz, out_hz, taps):
    B, C, n_in = 3, 2, 512
    L, M = reduce_ratio(in_hz, out_hz)
    cfg = fe.FirConfig(channels=C, taps=taps, ratio_num=L, ratio_den=M)
    cutoff = fe.fir_cutoff(taps, Attenuation.Db90, in_hz / out_hz)
    coeffs = fe.fir_coefficients(taps, Attenuation.Db90, cutoff)

    xla_step = fe.make_fir_step(cfg, coeffs)
    pal_step = make_fir_fleet_step_pallas(cfg, coeffs, n_in, interpret=False)

    rng = np.random.default_rng(0)
    state = jax.vmap(lambda _: fe.fir_init(cfg))(jnp.arange(B))
    bufs = state["buffer"]
    avail = state["available_frames"]
    pos = state["pos_num"]
    for _ in range(4):
        chunks = jnp.asarray(rng.standard_normal((B, n_in, C)), jnp.float32)
        nv = jnp.asarray(rng.integers(0, n_in + 1, B), jnp.int32)
        bud = jnp.full((B,), cfg.out_capacity, jnp.int32)

        state, out_x, cons_x, prod_x = jax.vmap(xla_step)(
            state, chunks, nv, bud
        )
        bufs, out_p, avail, pos, cons_p, prod_p = pal_step(
            bufs, chunks, avail, pos, nv, bud
        )

        np.testing.assert_array_equal(np.asarray(cons_x), np.asarray(cons_p))
        np.testing.assert_array_equal(np.asarray(prod_x), np.asarray(prod_p))
        # stream buffer must be BIT-exact (pure data movement)
        np.testing.assert_array_equal(
            np.asarray(state["buffer"]), np.asarray(bufs)
        )
        # outputs: different MXU accumulation order, ~1 ulp
        np.testing.assert_allclose(
            np.asarray(out_x), np.asarray(out_p), atol=2e-6
        )


def test_pallas_sync_fleet_kernel_on_device():
    """Fused sync-fleet kernel vs XLA sync step on real hardware:
    bit-exact buffer, f32-noise outputs, exact counts."""
    from resampler_tpu.ops.fir_sync_kernel import (
        make_fir_fleet_step_sync_pallas,
    )

    B, C, n_in, taps = 64, 2, 512, 64
    L, M = reduce_ratio(44100, 48000)
    cfg = fe.FirConfig(channels=C, taps=taps, ratio_num=L, ratio_den=M)
    cutoff = fe.fir_cutoff(taps, Attenuation.Db90, 44100 / 48000)
    coeffs = fe.fir_coefficients(taps, Attenuation.Db90, cutoff)
    xla = jax.jit(fe.make_fir_fleet_step_sync(cfg, coeffs, B, channel_major=True))
    pal = jax.jit(make_fir_fleet_step_sync_pallas(cfg, coeffs, B, n_in))

    rng = np.random.default_rng(0)
    sa = fe.fir_fleet_init_sync(cfg, B)
    sb = fe.fir_fleet_init_sync(cfg, B)
    for _ in range(3):
        chunks = jnp.asarray(rng.standard_normal((B, C, n_in)), jnp.float32)
        nv = jnp.int32(int(rng.integers(1, n_in + 1)))
        sa, oa, ca, pa = xla(sa, chunks, nv)
        sb, ob, cb, pb = pal(sb, chunks, nv)
        assert int(ca) == int(cb) and int(pa) == int(pb)
        np.testing.assert_array_equal(
            np.asarray(sa["buffer"]), np.asarray(sb["buffer"])
        )
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=2e-6)


def test_magsplit_pool_matches_materialized_on_device():
    """NON-interpret device differential for the zero-copy pool form:
    scalar-prefetched slot index maps must read exactly the slot the
    materialized step reads, across slot wraparound."""
    from resampler_tpu.engine import fft as ffe

    cfg = ffe.FftConfig(channels=2, fft_size_input=588, fft_size_output=1280)
    B, C, N = 8, 2, 588  # B*C = 16 rows (>= one 8-row tile)
    step_m = jax.jit(ffe.make_fft_fleet_step(cfg, B, backend="magsplit"))
    step_p = jax.jit(ffe.make_fft_fleet_step_pool(cfg, B, backend="magsplit"))
    st_m = ffe.fft_fleet_init(cfg, B, "magsplit")
    P = 3
    pool = np.zeros((P, B * C, N), np.float32)
    st_p = ffe.fft_fleet_pool_init(prev_idx=2)
    rng = np.random.default_rng(11)
    for k in range(5):
        chunk = rng.standard_normal((B, C, N)).astype(np.float32)
        slot = k % 2
        pool[slot] = chunk.reshape(B * C, N)
        st_m, out_m = step_m(st_m, jnp.asarray(chunk))
        st_p, out_p = step_p(st_p, jnp.asarray(pool), jnp.int32(slot))
        np.testing.assert_array_equal(np.asarray(out_m), np.asarray(out_p))


def test_grouped_atlas_dma_matches_xla_on_device():
    """Small-M grouped periodic atlas through the manual-DMA contraction
    (gM = 128 rows, gL 8-aligned) vs the XLA einsum form on device."""
    B, C, n_in = 64, 2, 1024  # B*C = 128 (DMA lane gate)
    L, M = reduce_ratio(48000, 96000)
    cfg = fe.FirConfig(channels=C, taps=64, ratio_num=L, ratio_den=M)
    assert fe._periodic_group_factor(L, M) > 1
    cutoff = fe.fir_cutoff(64, Attenuation.Db90, 0.5)
    coeffs = fe.fir_coefficients(64, Attenuation.Db90, cutoff)
    rng = np.random.default_rng(7)
    feeds = [
        jnp.asarray(rng.standard_normal((1024, B * C)), jnp.float32)
        for _ in range(2)
    ]

    def run(contraction):
        step = jax.jit(fe.make_fir_fleet_step_sync_tm(
            cfg, coeffs, B, max_chunk=1024, horizon=2,
            contraction=contraction,
        ))
        st = fe.fir_fleet_init_sync_tm(cfg, B, max_chunk=1024, horizon=2)
        outs = []
        for f in feeds:
            st, out, _, p = step(st, f, jnp.int32(1024))
            outs.append(np.asarray(out)[:, : int(p)])
        return outs

    a = run("xla")
    b = run("dma")
    worst = max(float(np.abs(x - y).max()) for x, y in zip(a, b))
    assert worst < 5e-6, worst
