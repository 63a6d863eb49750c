"""Asynchronous time-major fleet: independent per-stream positions on a
shared ring buffer (``make_fir_fleet_step_async_tm``).

The fleet's outputs must equal the per-stream farrow engine's output
SEQUENCE for every stream (same basis polynomial, same exact rational
schedule), across initial phase spreads, ring compactions, and
starvation.  The fleet produces the fleet-min count per step, so its
per-stream sequence is a (growing) prefix of the per-stream engine's —
compare concatenated sequences.
(reference per-stream generality: src/resampler_fir.rs:542-590)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resampler_tpu.engine import fir as fe
from resampler_tpu.types import Attenuation, reduce_ratio


def _run_pair(in_hz, out_hz, taps, phases, n_steps=10, chunk=512,
              horizon=3, feed_valid=None, out_layout="bm"):
    """Run fleet + per-stream engines on the same feed; return
    (per-stream fleet sequences, per-stream engine sequences)."""
    L, M = reduce_ratio(in_hz, out_hz)
    B, C = len(phases), 2
    cfg = fe.FirConfig(channels=C, taps=taps, ratio_num=L, ratio_den=M)
    cutoff = fe.fir_cutoff(taps, Attenuation.Db90, in_hz / out_hz)
    coeffs = fe.fir_coefficients(taps, Attenuation.Db90, cutoff)
    a_step = jax.jit(
        fe.make_fir_fleet_step_async_tm(
            cfg, coeffs, B, max_chunk=chunk, horizon=horizon,
            out_layout=out_layout,
        )
    )
    ps_step = jax.jit(fe.make_fir_step(cfg, coeffs, path="farrow"))
    a_state = fe.fir_fleet_init_async_tm(
        cfg, B, max_chunk=chunk, horizon=horizon,
        pos_num=np.asarray(phases, np.int64),
    )
    ps_states = []
    for ph in phases:
        st = fe.fir_init(cfg)
        st["pos_num"] = jnp.int32(ph)
        ps_states.append(st)
    rng = np.random.default_rng(7)
    fleet_seq = [[] for _ in range(B)]
    ps_seq = [[] for _ in range(B)]
    for k in range(n_steps):
        nv = chunk if feed_valid is None else feed_valid[k]
        data = rng.standard_normal((chunk, B * C)).astype(np.float32)
        data[nv:] = 0.0
        a_state, out, c, p = a_step(a_state, jnp.asarray(data), jnp.int32(nv))
        p = int(p)
        out = np.asarray(out)
        if out_layout == "tm":
            out = np.transpose(
                out.reshape(-1, B, C), (1, 0, 2)
            )
        for b in range(B):
            if p:
                fleet_seq[b].append(out[b, :p])
            ps_chunk = data.reshape(chunk, B, C)[:, b, :]
            ps_states[b], out_ps, c_ps, p_ps = ps_step(
                ps_states[b], jnp.asarray(ps_chunk), jnp.int32(nv),
                jnp.int32(cfg.out_capacity),
            )
            if int(p_ps):
                ps_seq[b].append(np.asarray(out_ps)[: int(p_ps)])
    fleet_cat = [
        np.concatenate(s) if s else np.zeros((0, C), np.float32)
        for s in fleet_seq
    ]
    ps_cat = [
        np.concatenate(s) if s else np.zeros((0, C), np.float32)
        for s in ps_seq
    ]
    return fleet_cat, ps_cat


@pytest.mark.parametrize(
    "in_hz,out_hz,taps",
    [(44100, 44101, 64), (48000, 44101, 32), (44100, 48000, 16)],
)
def test_async_fleet_matches_per_stream_zero_phase(in_hz, out_hz, taps):
    fleet, ps = _run_pair(in_hz, out_hz, taps, phases=[0, 0, 0])
    for f, r in zip(fleet, ps):
        assert len(f) > 1000
        np.testing.assert_allclose(f, r[: len(f)], atol=2e-5)


def test_async_fleet_independent_phases():
    """Streams at different initial phases produce each its OWN exact
    schedule's outputs — the property the sync fleet cannot express."""
    L, M = reduce_ratio(44100, 44101)
    phases = [0, M // 3, M - 1]
    fleet, ps = _run_pair(44100, 44101, 64, phases=phases)
    # distinct phases => distinct sequences
    assert not np.allclose(fleet[0][:200], fleet[1][:200], atol=1e-4)
    for f, r in zip(fleet, ps):
        assert len(f) > 1000
        np.testing.assert_allclose(f, r[: len(f)], atol=2e-5)


def test_async_fleet_compaction_and_ragged_feed():
    """Small horizon forces ring compactions; ragged n_valid exercises
    catch-up including zero-feed (starved) steps."""
    feed = [512, 0, 300, 512, 17, 512, 0, 512, 512, 512, 400, 512]
    phases = [5, 999, 44100 // 2]
    fleet, ps = _run_pair(
        44100, 44101, 64, phases=phases, n_steps=len(feed),
        feed_valid=feed, horizon=2,
    )
    for f, r in zip(fleet, ps):
        assert len(f) > 1500
        np.testing.assert_allclose(f, r[: len(f)], atol=2e-5)


def test_async_fleet_tm_out_layout():
    fleet_tm, ps = _run_pair(
        44100, 44101, 32, phases=[0, 12345], out_layout="tm"
    )
    for f, r in zip(fleet_tm, ps):
        assert len(f) > 1000
        np.testing.assert_allclose(f, r[: len(f)], atol=2e-5)


def test_async_fleet_heavy_downsample():
    """Heavy coprime downsample keeps exact bookkeeping (outputs scarce,
    consumption capped at avail on some steps)."""
    # positions are subframes (1/M input frame); spread < M spans every
    # distinct output-grid phase — larger offsets are whole-frame time
    # shifts, not new phases
    fleet, ps = _run_pair(367500, 1601, 32, phases=[0, 533, 1600])
    for f, r in zip(fleet, ps):
        assert len(f) >= 8
        np.testing.assert_allclose(f, r[: len(f)], atol=2e-5)


def test_async_fleet_init_validation():
    cfg = fe.FirConfig(channels=1, taps=16, ratio_num=147, ratio_den=160)
    with pytest.raises(ValueError, match="skew invariant"):
        fe.fir_fleet_init_async_tm(
            cfg, 2, max_chunk=256, pos_num=np.asarray([0, 161])
        )
    with pytest.raises(ValueError, match="shape"):
        fe.fir_fleet_init_async_tm(
            cfg, 2, max_chunk=256, pos_num=np.asarray([0, 1, 2])
        )
    with pytest.raises(ValueError, match="non-negative"):
        fe.fir_fleet_init_async_tm(
            cfg, 2, max_chunk=256, pos_num=np.asarray([-1, 0])
        )
    wide_cfg = fe.FirConfig(
        channels=1, taps=16, ratio_num=600011, ratio_den=600013
    )
    coeffs = fe.fir_coefficients(16, Attenuation.Db90, 0.9)
    with pytest.raises(ValueError, match="wide"):
        fe.make_fir_fleet_step_async_tm(
            wide_cfg, coeffs, 2, max_chunk=256
        )


def test_async_fleet_masked_lanes_zero():
    """Lanes beyond the produced count are exactly zero in both layouts."""
    L, M = reduce_ratio(44100, 44101)
    cfg = fe.FirConfig(channels=2, taps=32, ratio_num=L, ratio_den=M)
    cutoff = fe.fir_cutoff(32, Attenuation.Db90, 44100 / 44101)
    coeffs = fe.fir_coefficients(32, Attenuation.Db90, cutoff)
    step = jax.jit(
        fe.make_fir_fleet_step_async_tm(cfg, coeffs, 2, max_chunk=256)
    )
    state = fe.fir_fleet_init_async_tm(cfg, 2, max_chunk=256)
    rng = np.random.default_rng(0)
    state, out, c, p = step(
        state, jnp.asarray(rng.standard_normal((256, 4)), jnp.float32),
        jnp.int32(256),
    )
    p = int(p)
    assert 0 < p < cfg.out_capacity
    assert np.all(np.asarray(out)[:, p:, :] == 0.0)
