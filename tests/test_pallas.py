"""Fused Pallas FIR kernel: differential test vs the XLA step
(interpret mode — the real-TPU compile is blocked on a Mosaic reshape
lowering gap, see ops/fir_kernel.py module docstring)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from resampler_tpu.engine import fir as fe
from resampler_tpu.ops.fir_kernel import make_fir_fleet_step_pallas
from resampler_tpu.types import Attenuation, reduce_ratio


@pytest.mark.parametrize("in_hz,out_hz,taps", [(44100, 48000, 64), (48000, 44100, 32)])
def test_pallas_kernel_matches_xla_step(in_hz, out_hz, taps):
    B, C, n_in = 3, 2, 512
    L, M = reduce_ratio(in_hz, out_hz)
    cfg = fe.FirConfig(channels=C, taps=taps, ratio_num=L, ratio_den=M)
    cutoff = fe.fir_cutoff(taps, Attenuation.Db90, in_hz / out_hz)
    coeffs = fe.fir_coefficients(taps, Attenuation.Db90, cutoff)

    xla_step = fe.make_fir_step(cfg, coeffs)
    pal_step = make_fir_fleet_step_pallas(cfg, coeffs, n_in, interpret=True)

    rng = np.random.default_rng(0)
    state = jax.vmap(lambda _: fe.fir_init(cfg))(jnp.arange(B))
    bufs = state["buffer"]
    avail = state["available_frames"]
    pos = state["pos_num"]
    for _ in range(4):
        chunks = jnp.asarray(rng.standard_normal((B, n_in, C)), jnp.float32)
        nv = jnp.asarray(rng.integers(0, n_in + 1, B), jnp.int32)
        bud = jnp.full((B,), cfg.out_capacity, jnp.int32)

        state, out_x, cons_x, prod_x = jax.vmap(xla_step)(state, chunks, nv, bud)
        bufs, out_p, avail, pos, cons_p, prod_p = pal_step(
            bufs, chunks, avail, pos, nv, bud
        )

        np.testing.assert_array_equal(np.asarray(cons_x), np.asarray(cons_p))
        np.testing.assert_array_equal(np.asarray(prod_x), np.asarray(prod_p))
        np.testing.assert_allclose(
            np.asarray(out_x), np.asarray(out_p), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(state["buffer"]), np.asarray(bufs), atol=1e-6
        )


def test_pallas_sync_fleet_kernel_matches_xla_sync():
    """Fused synchronized-fleet kernel (ops/fir_sync_kernel.py) is
    bit-compatible with the XLA sync step (interpret mode; the on-device
    differential lives in tests_tpu/test_pallas_device.py)."""
    from resampler_tpu.ops.fir_sync_kernel import (
        make_fir_fleet_step_sync_pallas,
    )

    B, C, n_in, taps = 4, 2, 512, 64
    L, M = reduce_ratio(44100, 48000)
    cfg = fe.FirConfig(channels=C, taps=taps, ratio_num=L, ratio_den=M)
    cutoff = fe.fir_cutoff(taps, Attenuation.Db90, 44100 / 48000)
    coeffs = fe.fir_coefficients(taps, Attenuation.Db90, cutoff)
    xla = fe.make_fir_fleet_step_sync(cfg, coeffs, B, channel_major=True)
    pal = make_fir_fleet_step_sync_pallas(cfg, coeffs, B, n_in, interpret=True)

    rng = np.random.default_rng(0)
    sa = fe.fir_fleet_init_sync(cfg, B)
    sb = fe.fir_fleet_init_sync(cfg, B)
    for _ in range(5):
        chunks = jnp.asarray(rng.standard_normal((B, C, n_in)), jnp.float32)
        nv = jnp.int32(int(rng.integers(0, n_in + 1)))
        sa, oa, ca, pa = xla(sa, chunks, nv)
        sb, ob, cb, pb = pal(sb, chunks, nv)
        assert int(ca) == int(cb) and int(pa) == int(pb)
        np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(sa["buffer"]), np.asarray(sb["buffer"]), atol=1e-6
        )


def test_tm_dma_contraction_matches_xla():
    """The manual-DMA banded contraction (ops/fir_dma_kernel.py, the TPU
    production form of the tm periodic step) equals the XLA einsum form
    across streaming steps — interpret mode on CPU; the real-device
    check lives in tests_tpu/."""
    from resampler_tpu.engine import fir as fe
    from resampler_tpu.types import Attenuation, reduce_ratio

    L, M = reduce_ratio(44100, 48000)
    B, C = 2, 2
    cfg = fe.FirConfig(channels=C, taps=64, ratio_num=L, ratio_den=M)
    cutoff = fe.fir_cutoff(64, Attenuation.Db90, 44100 / 48000)
    coeffs = fe.fir_coefficients(64, Attenuation.Db90, cutoff)
    s_x = jax.jit(fe.make_fir_fleet_step_sync_tm(
        cfg, coeffs, B, max_chunk=512, horizon=3, contraction="xla"))
    s_d = jax.jit(fe.make_fir_fleet_step_sync_tm(
        cfg, coeffs, B, max_chunk=512, horizon=3,
        contraction="dma_interpret"))
    st_x = fe.fir_fleet_init_sync_tm(cfg, B, max_chunk=512, horizon=3)
    st_d = fe.fir_fleet_init_sync_tm(cfg, B, max_chunk=512, horizon=3)
    rng = np.random.default_rng(0)
    produced = 0
    for _ in range(6):
        ch = jnp.asarray(rng.standard_normal((512, B * C)), jnp.float32)
        st_x, ox, cx, px = s_x(st_x, ch, jnp.int32(512))
        st_d, od, cd, pd = s_d(st_d, ch, jnp.int32(512))
        assert int(cx) == int(cd) and int(px) == int(pd)
        p = int(px)
        if p:
            produced += 1
            np.testing.assert_allclose(
                np.asarray(ox)[:, :p], np.asarray(od)[:, :p], atol=1e-5
            )
    assert produced >= 4


def test_tm_farrow_dma_contraction_matches_xla():
    """The Farrow manual-DMA contraction (the TPU production form of the
    arbitrary-ratio sync fleet; the alignment remainder is folded into
    the positioning one-hot) equals the XLA form across streaming steps
    — interpret mode on CPU."""
    from resampler_tpu.engine import fir as fe
    from resampler_tpu.types import Attenuation, reduce_ratio

    L, M = reduce_ratio(44100, 44101)
    B, C = 2, 2
    cfg = fe.FirConfig(channels=C, taps=64, ratio_num=L, ratio_den=M)
    assert fe.resolve_convolve_path(cfg) == "farrow"
    cutoff = fe.fir_cutoff(64, Attenuation.Db90, 44100 / 44101)
    coeffs = fe.fir_coefficients(64, Attenuation.Db90, cutoff)
    s_x = jax.jit(fe.make_fir_fleet_step_sync_tm(
        cfg, coeffs, B, max_chunk=512, horizon=3, contraction="xla"))
    s_d = jax.jit(fe.make_fir_fleet_step_sync_tm(
        cfg, coeffs, B, max_chunk=512, horizon=3,
        contraction="dma_interpret"))
    st_x = fe.fir_fleet_init_sync_tm(cfg, B, max_chunk=512, horizon=3)
    st_d = fe.fir_fleet_init_sync_tm(cfg, B, max_chunk=512, horizon=3)
    rng = np.random.default_rng(1)
    produced = 0
    for _ in range(6):
        ch = jnp.asarray(rng.standard_normal((512, B * C)), jnp.float32)
        st_x, ox, cx, px = s_x(st_x, ch, jnp.int32(512))
        st_d, od, cd, pd = s_d(st_d, ch, jnp.int32(512))
        assert int(cx) == int(cd) and int(px) == int(pd)
        p = int(px)
        if p:
            produced += 1
            np.testing.assert_allclose(
                np.asarray(ox)[:, :p], np.asarray(od)[:, :p], atol=1e-5
            )
    assert produced >= 4


@pytest.mark.parametrize(
    "in_hz,out_hz,q_expect,taps",
    [
        (367500, 1601, 1, 32),   # L/M ~ 230: q=1, G=8
        (48000, 1601, 2, 32),    # L/M ~ 30:  q=2, G=4
        (48000, 3001, 4, 32),    # L/M ~ 16:  q=4, G=2
    ],
)
def test_tm_farrow_packed_dma_contraction_matches_xla(
    in_hz, out_hz, q_expect, taps
):
    """The PACKED grouped farrow DMA contraction (heavy coprime
    downsampling, q < 8: G = 8//q blocks per grid step, per-block
    sub-DMAs, block-diagonal weights) equals the XLA form across
    streaming steps — interpret mode on CPU; measured +3–9% end-to-end
    over the XLA form across input capacities on v5e, monotone in
    capacity (ROUND3_NOTES.md packed-farrow ledger)."""
    from resampler_tpu.engine import fir as fe
    from resampler_tpu.types import Attenuation, reduce_ratio

    L, M = reduce_ratio(in_hz, out_hz)
    assert fe.farrow_block_size(L, M) == q_expect
    B, C = 2, 2
    cfg = fe.FirConfig(channels=C, taps=taps, ratio_num=L, ratio_den=M)
    assert fe.resolve_convolve_path(cfg) == "farrow"
    cutoff = fe.fir_cutoff(taps, Attenuation.Db90, in_hz / out_hz)
    coeffs = fe.fir_coefficients(taps, Attenuation.Db90, cutoff)
    s_x = jax.jit(fe.make_fir_fleet_step_sync_tm(
        cfg, coeffs, B, max_chunk=2048, horizon=3, contraction="xla"))
    s_d = jax.jit(fe.make_fir_fleet_step_sync_tm(
        cfg, coeffs, B, max_chunk=2048, horizon=3,
        contraction="dma_interpret"))
    st_x = fe.fir_fleet_init_sync_tm(cfg, B, max_chunk=2048, horizon=3)
    st_d = fe.fir_fleet_init_sync_tm(cfg, B, max_chunk=2048, horizon=3)
    rng = np.random.default_rng(7)
    produced = 0
    for _ in range(6):
        ch = jnp.asarray(rng.standard_normal((2048, B * C)), jnp.float32)
        st_x, ox, cx, px = s_x(st_x, ch, jnp.int32(2048))
        st_d, od, cd, pd = s_d(st_d, ch, jnp.int32(2048))
        assert int(cx) == int(cd) and int(px) == int(pd)
        p = int(px)
        if p:
            produced += 1
            np.testing.assert_allclose(
                np.asarray(ox)[:, :p], np.asarray(od)[:, :p], atol=1e-5
            )
    assert produced >= 4


def test_tm_dma_contraction_mesh_sharded():
    """Mesh-sharded tm fleets keep the manual-DMA contraction: GSPMD has
    no partitioning rule for pallas_call, so the step wraps the lane-
    parallel contraction in shard_map (lane-sharded ring, replicated
    schedule scalars).  8-device CPU mesh, interpret-mode kernel,
    against the unsharded XLA form."""
    from resampler_tpu.engine import fir as fe
    from resampler_tpu.parallel.sharding import shard_lanes, stream_mesh
    from resampler_tpu.types import Attenuation, reduce_ratio

    L, M = reduce_ratio(44100, 48000)
    B, C = 8, 2
    mesh = stream_mesh()
    assert mesh.size == 8
    cfg = fe.FirConfig(channels=C, taps=32, ratio_num=L, ratio_den=M)
    cutoff = fe.fir_cutoff(32, Attenuation.Db90, 44100 / 48000)
    coeffs = fe.fir_coefficients(32, Attenuation.Db90, cutoff)
    s_x = jax.jit(fe.make_fir_fleet_step_sync_tm(
        cfg, coeffs, B, max_chunk=512, horizon=3, contraction="xla"))
    s_d = jax.jit(fe.make_fir_fleet_step_sync_tm(
        cfg, coeffs, B, max_chunk=512, horizon=3,
        contraction="dma_interpret", mesh=mesh))
    st_x = fe.fir_fleet_init_sync_tm(cfg, B, max_chunk=512, horizon=3)
    st_d = shard_lanes(
        fe.fir_fleet_init_sync_tm(cfg, B, max_chunk=512, horizon=3), mesh
    )
    rng = np.random.default_rng(2)
    produced = 0
    for _ in range(5):
        ch = jnp.asarray(rng.standard_normal((512, B * C)), jnp.float32)
        st_x, ox, cx, px = s_x(st_x, ch, jnp.int32(512))
        st_d, od, cd, pd = s_d(st_d, ch, jnp.int32(512))
        assert int(cx) == int(cd) and int(px) == int(pd)
        p = int(px)
        if p:
            produced += 1
            np.testing.assert_allclose(
                np.asarray(ox)[:, :p], np.asarray(od)[:, :p], atol=1e-5
            )
    assert produced >= 3


def test_split_hi_lo_survives_jit():
    """Regression: XLA's excess-precision simplification turns the naive
    ``a - bf16(a).astype(f32)`` into literal zero under jit; split_hi_lo
    must use bit-level rounding so both terms survive compilation."""
    from resampler_tpu.ops.matmul3 import split_hi_lo

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    hi, lo = jax.jit(split_hi_lo)(a)
    assert float(jnp.abs(lo.astype(jnp.float32)).max()) > 0.0
    recon = hi.astype(np.float32) + np.asarray(lo, np.float32)
    np.testing.assert_allclose(recon, np.asarray(a), atol=2e-5, rtol=0)
    # hi is the round-to-nearest bf16 value
    np.testing.assert_array_equal(
        np.asarray(hi), np.asarray(a).astype(jnp.bfloat16)
    )


def test_split_hi_lo_nonfinite_passthrough():
    """The bit-level rounding add must not carry non-finite values into
    different non-finite values (a NaN with a low-mantissa payload would
    collapse to Inf): hi passes non-finites through like bf16 conversion,
    and near-max finites still round to Inf exactly as bf16 RNE does."""
    from resampler_tpu.ops.matmul3 import split_hi_lo

    a = jnp.asarray(
        [np.inf, -np.inf, np.nan, 3.402e38, -3.402e38, 1.5, 0.0], jnp.float32
    )
    # splice in a NaN whose payload lives only in the low mantissa bits —
    # the case the rounding add turned into Inf
    payload_nan = jax.lax.bitcast_convert_type(
        jnp.uint32(0x7F800001), jnp.float32
    )
    a = jnp.concatenate([a, payload_nan[None]])
    hi, lo = jax.jit(split_hi_lo)(a)
    hi = np.asarray(hi, np.float32)
    assert np.isinf(hi[0]) and hi[0] > 0
    assert np.isinf(hi[1]) and hi[1] < 0
    assert np.isnan(hi[2])
    assert np.isnan(hi[7]), "low-payload NaN must stay NaN, not become Inf"
    # near-max finites round to Inf under bf16 RNE (matches f32->bf16)
    assert hi[3] == np.float32(np.asarray(a[3]).astype(jnp.bfloat16))
    assert hi[5] == np.float32(1.5) and hi[6] == 0.0


def test_matmul3_matches_precision_high(pallas_interpret_only=True):
    """matmul3 (interpret mode) reaches f32-class accuracy vs an f64
    reference — i.e. its three bf16 passes are all really happening."""
    from resampler_tpu.ops.matmul3 import matmul3, split_hi_lo

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((512, 384)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((384, 512)), jnp.float32)
    t_hi, t_lo = split_hi_lo(t)
    out = matmul3(x, t_hi, t_lo, tile_m=256, tile_n=256, interpret=True)
    ref = np.asarray(x, np.float64) @ np.asarray(t, np.float64)
    err = np.asarray(out, np.float64) - ref
    floor_db = -20 * np.log10(
        np.sqrt((err**2).mean() / (ref**2).mean())
    )
    assert floor_db > 90.0, floor_db  # single bf16 pass would be ~53 dB
