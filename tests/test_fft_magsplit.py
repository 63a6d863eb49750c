"""Banded magnitude-split FFT projector backend (ops/fft_magsplit_kernel).

The kernel runs interpreted on the CPU backend; the real-TPU differential
lives in tests_tpu/test_device_numerics.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from resampler_tpu.engine import fft as fft_engine
from resampler_tpu.ops.fft_magsplit_kernel import (
    magsplit_projector,
    magsplit_weights,
    plan_magsplit,
    simulate_magsplit_floor,
    _t2_f64,
)


def test_plan_eligibility():
    # big common-family pairs are eligible with a high simulated floor
    for pair in [(1176, 1280), (588, 1280), (1280, 1176), (2352, 2560)]:
        plan = plan_magsplit(*pair)
        assert plan is not None, pair
        assert plan.floor_db >= 103.0
        assert plan.b0 + plan.w_p <= plan.g + 1
        # it must actually cut MXU work vs HIGH's 3 dense passes
        assert plan.macs_per_sample < 0.6 * 3 * 2 * pair[0]
    # degenerate band geometry -> no plan (engine falls back to matmul)
    for pair in [(64, 192), (640, 882), (512, 1024)]:
        assert plan_magsplit(*pair) is None, pair


def test_simulated_floor_matches_plan():
    plan = plan_magsplit(1176, 1280)
    T2 = _t2_f64(1176, 1280)
    floor = simulate_magsplit_floor(
        1176, 1280, plan.bps, plan.b0, plan.w_p, T2
    )
    assert abs(floor - plan.floor_db) < 0.5


@pytest.mark.parametrize("n_in,n_out", [(1176, 1280), (588, 1280)])
def test_projector_matches_f64_reference(n_in, n_out):
    plan = plan_magsplit(n_in, n_out)
    wh, wcorr = magsplit_weights(plan)
    rng = np.random.default_rng(11)
    R = 8
    prev = jnp.asarray(rng.standard_normal((R, n_in)), jnp.float32)
    cur = jnp.asarray(rng.standard_normal((R, n_in)), jnp.float32)
    out = magsplit_projector(prev, cur, wh, wcorr, plan=plan, interpret=True)
    T2 = _t2_f64(n_in, n_out)
    x2 = np.concatenate([np.asarray(prev), np.asarray(cur)], axis=1)
    ref = x2.astype(np.float64) @ T2
    err = np.asarray(out, np.float64) - ref
    floor = -20 * np.log10(np.sqrt((err**2).mean() / (ref**2).mean()))
    assert floor >= plan.floor_db - 2.0, floor  # accumulation-order slack


def test_row_padding():
    """R not a multiple of 8 is padded internally and sliced back."""
    plan = plan_magsplit(588, 1280)
    wh, wcorr = magsplit_weights(plan)
    rng = np.random.default_rng(3)
    prev = jnp.asarray(rng.standard_normal((5, 588)), jnp.float32)
    cur = jnp.asarray(rng.standard_normal((5, 588)), jnp.float32)
    out = magsplit_projector(prev, cur, wh, wcorr, plan=plan, interpret=True)
    assert out.shape == (5, 1280)
    out8 = magsplit_projector(
        jnp.pad(prev, ((0, 3), (0, 0))), jnp.pad(cur, ((0, 3), (0, 0))),
        wh, wcorr, plan=plan, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out8)[:5])


def test_fleet_step_matches_matmul_backend():
    """Streamed chunks through the magsplit fleet step equal the dense
    HIGH projector fleet step to the arithmetic floor (both carry the
    same overlap information: prev chunk vs overlap tail)."""
    cfg = fft_engine.FftConfig(
        channels=2, fft_size_input=588, fft_size_output=1280
    )
    B = 4
    step_m = fft_engine.make_fft_fleet_step(cfg, B, backend="magsplit")
    step_d = fft_engine.make_fft_fleet_step(cfg, B, backend="matmul")
    sm = fft_engine.fft_fleet_init(cfg, B, "magsplit")
    sd = fft_engine.fft_fleet_init(cfg, B, "matmul")
    assert "prev" in sm and "overlap" in sd
    rng = np.random.default_rng(0)
    for _ in range(3):
        chunks = jnp.asarray(rng.standard_normal((B, 2, 588)), jnp.float32)
        sm, om = step_m(sm, chunks)
        sd, od = step_d(sd, chunks)
        np.testing.assert_allclose(
            np.asarray(om), np.asarray(od), atol=5e-4
        )


def test_wrapper_backend_magsplit():
    """ResamplerFft(backend='magsplit') equals the matmul backend through
    the public chunked API (C=2 rows exercise the row padding)."""
    from resampler_tpu.types import SampleRate

    ra = fft_engine.ResamplerFft(
        2, SampleRate.Hz22050, SampleRate.Hz48000, backend="magsplit"
    )
    rb = fft_engine.ResamplerFft(
        2, SampleRate.Hz22050, SampleRate.Hz48000, backend="matmul"
    )
    rng = np.random.default_rng(1)
    x = rng.standard_normal(4 * ra.chunk_size_input()).astype(np.float32)
    ya = ra.process(x)
    yb = rb.process(x)
    np.testing.assert_allclose(ya, yb, atol=5e-4)


def test_auto_resolves_matmul_off_tpu():
    cfg = fft_engine.FftConfig(
        channels=2, fft_size_input=1176, fft_size_output=1280
    )
    assert jax.default_backend() != "tpu"
    assert fft_engine._resolve_backend(cfg, "auto") == "matmul"


def test_magsplit_sharded_over_mesh():
    """The magsplit fleet step runs per-shard under shard_map on an
    8-device mesh and equals the unsharded step."""
    from resampler_tpu.parallel.sharding import shard_batch, stream_mesh

    cfg = fft_engine.FftConfig(
        channels=2, fft_size_input=588, fft_size_output=1280
    )
    B = 8
    mesh = stream_mesh()
    assert mesh.size == 8
    step_s = jax.jit(
        fft_engine.make_fft_fleet_step(cfg, B, backend="magsplit", mesh=mesh)
    )
    step_u = jax.jit(fft_engine.make_fft_fleet_step(cfg, B, backend="magsplit"))
    ss = shard_batch(fft_engine.fft_fleet_init(cfg, B, "magsplit"), mesh)
    su = fft_engine.fft_fleet_init(cfg, B, "magsplit")
    rng = np.random.default_rng(4)
    for _ in range(2):
        chunks = jnp.asarray(rng.standard_normal((B, 2, 588)), jnp.float32)
        ss, os_ = step_s(ss, shard_batch(chunks, mesh))
        su, ou = step_u(su, chunks)
        assert len(os_.sharding.device_set) == 8
        np.testing.assert_allclose(
            np.asarray(os_), np.asarray(ou), atol=1e-6
        )


def test_magsplit_matrix_all_eligible_sizes():
    """Every distinct planner size pair that gets a magsplit plan matches
    the dense projector (one chunk, interpret kernel)."""
    import itertools

    from resampler_tpu.dsp.planner import plan_conversion
    from resampler_tpu.types import SampleRate

    sizes = set()
    for a, b in itertools.permutations(list(SampleRate), 2):
        cfg = plan_conversion(a, b).scale_for_throughput()
        sizes.add((cfg.fft_size_input, cfg.fft_size_output))
    eligible = sorted(s for s in sizes if plan_magsplit(*s) is not None)
    assert len(eligible) >= 4, eligible
    rng = np.random.default_rng(2)
    for n_in, n_out in eligible:
        cfg = fft_engine.FftConfig(
            channels=1, fft_size_input=n_in, fft_size_output=n_out
        )
        sm = fft_engine.make_fft_fleet_step(cfg, 2, backend="magsplit")
        sd = fft_engine.make_fft_fleet_step(cfg, 2, backend="matmul")
        stm = fft_engine.fft_fleet_init(cfg, 2, "magsplit")
        std = fft_engine.fft_fleet_init(cfg, 2, "matmul")
        for _ in range(2):
            x = jnp.asarray(rng.standard_normal((2, 1, n_in)), jnp.float32)
            stm, a = sm(stm, x)
            std, b = sd(std, x)
            scale = float(jnp.abs(b).max()) + 1e-9
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-4,
                err_msg=f"pair {n_in}->{n_out}",
            )


def test_state_schema_conversion_across_backends():
    """A carry checkpointed under the magsplit/{'prev'} schema restores
    into a matmul/{'overlap'} resampler exactly (prev -> overlap is the
    B-part projection); the non-invertible direction raises clearly."""
    from resampler_tpu.engine.fft import convert_fft_state
    from resampler_tpu.types import SampleRate

    ra = fft_engine.ResamplerFft(
        2, SampleRate.Hz22050, SampleRate.Hz48000, backend="magsplit"
    )
    rng = np.random.default_rng(6)
    x1 = rng.standard_normal(ra.chunk_size_input()).astype(np.float32)
    x2 = rng.standard_normal(ra.chunk_size_input()).astype(np.float32)
    out = np.zeros(ra.chunk_size_output(), np.float32)
    ra.resample(x1, out)
    saved = {k: np.asarray(v).copy() for k, v in ra.state.items()}
    assert "prev" in saved
    ra.resample(x2, out)
    ref = out.copy()

    rb = fft_engine.ResamplerFft(
        2, SampleRate.Hz22050, SampleRate.Hz48000, backend="matmul"
    )
    rb.state = saved  # schema conversion in the setter
    assert "overlap" in rb.state
    out2 = np.zeros(rb.chunk_size_output(), np.float32)
    rb.resample(x2, out2)
    np.testing.assert_allclose(ref, out2, atol=5e-4)

    # reverse direction is not invertible -> informative error
    with pytest.raises(ValueError, match="not\ninvertible|not invertible"):
        convert_fft_state(
            {"overlap": np.zeros((2, 1280), np.float32)},
            ra._config,
            "magsplit",
        )


def test_pool_step_matches_materialized_fleet_step():
    """The zero-copy rotating-pool step (scalar-prefetched slot reads)
    computes exactly the materialized fleet step's outputs across slot
    wraparound, including the zero-filled stream start."""
    import jax.numpy as jnp

    from resampler_tpu.engine import fft as fe

    cfg = fe.FftConfig(channels=2, fft_size_input=588, fft_size_output=1280)
    B, C, N = 4, 2, 588  # B*C = 8 rows
    step_m = fe.make_fft_fleet_step(cfg, B, backend="magsplit")
    step_p = fe.make_fft_fleet_step_pool(cfg, B, backend="magsplit")
    st_m = fe.fft_fleet_init(cfg, B, "magsplit")
    P = 3
    pool = np.zeros((P, B * C, N), np.float32)
    st_p = fe.fft_fleet_pool_init(prev_idx=2)  # slot 2 stays zero-filled
    rng = np.random.default_rng(4)
    for k in range(6):
        chunk = rng.standard_normal((B, C, N)).astype(np.float32)
        slot = k % 2
        pool[slot] = chunk.reshape(B * C, N)
        st_m, out_m = step_m(st_m, jnp.asarray(chunk))
        st_p, out_p = step_p(st_p, jnp.asarray(pool), jnp.int32(slot))
        assert int(st_p["prev_idx"]) == slot
        np.testing.assert_array_equal(np.asarray(out_m), np.asarray(out_p))


def test_pool_step_rejects_non_magsplit_backend():
    from resampler_tpu.engine import fft as fe

    cfg = fe.FftConfig(channels=2, fft_size_input=588, fft_size_output=1280)
    with pytest.raises(ValueError, match="pool step"):
        fe.make_fft_fleet_step_pool(cfg, 4, backend="matmul")
