"""Farrow-structure arbitrary-rate FIR: the gather path's replacement?

The gather path materializes [N, taps] windows (copy-bandwidth bound:
measured 37 Msps real / 64 Msps upper bound with free coefficients; a
static-slice decomposition of the takes measured the SAME as jnp.take,
so the wall is bytes, not gather latency).

Farrow restructuring: fit degree-9 Chebyshev polynomials per tap to the
phase-coefficient function (c_t(phi) ~= sum_k A[k,t] T_k(2phi-1) — the
1024-phase table is itself just a sampling of this smooth function),
then per chunk:

  Y = conv(x, A)            # [P, d+1] basis responses, ONE dense conv
  V = chebvander(u_i)       # [N, d+1] per-output poly rows (VPU)
  out_i = V_i . Y[off_i]    # tiny per-output contraction

and run the contraction as K = N/Q blocked one-hot matmuls
(G = V_blk @ Y_blk^T, mask by the local offset, reduce) so no gathers
and no [N, taps] windows ever exist.  XLA fuses the mask+reduce into the
dot consumer.

Run: python experiments/fir_farrow_probe.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from resampler_tpu.engine import fir as fe
from resampler_tpu.types import Attenuation, Latency, reduce_ratio

DEGREE = 9
Q = 128  # outputs per block


def farrow_matrix(coeffs, degree=DEGREE):
    """[d+1, taps] Chebyshev-basis coefficients fit to the phase table."""
    table = np.asarray(coeffs, np.float64)  # [P, taps]
    P = table.shape[0]
    u = 2 * (np.arange(P) / P) - 1
    V = np.polynomial.chebyshev.chebvander(u, degree)
    A, *_ = np.linalg.lstsq(V, table, rcond=None)
    resid = float(np.abs(V @ A - table).max())
    return A.astype(np.float32), resid


def fit_accuracy():
    """Fit residual on the 1024 grid AND at midpoints vs an 8x finer
    table (catches both underfitting and phase-axis mapping errors)."""
    from resampler_tpu.dsp.window import WindowType, make_sincs_for_kaiser

    taps, beta = 64, 10.0
    cutoff = fe.fir_cutoff(taps, Attenuation.Db90, 44100 / 44101)
    coarse = fe.fir_coefficients(taps, Attenuation.Db90, cutoff)
    A, resid = farrow_matrix(coarse)
    fine = make_sincs_for_kaiser(
        taps, 8192, float(np.float32(cutoff)), beta, WindowType.SYMMETRIC
    )  # [8192, taps]
    u_f = 2 * (np.arange(8192) / 8192) - 1
    Vf = np.polynomial.chebyshev.chebvander(u_f, DEGREE)
    err_fine = float(np.abs(Vf @ A.astype(np.float64) - fine).max())
    print(f"fit residual grid: {resid:.2e}  vs 8x-fine table: {err_fine:.2e}")
    return resid, err_fine


def build_farrow_convolve(config, coeffs, degree=DEGREE, q=Q):
    """Drop-in replacement for fe._convolve_gather's signature."""
    L_, M_ = config.ratio_num, config.ratio_den
    taps, C = config.taps, config.channels
    N = config.out_capacity
    valid_end = config.input_capacity
    d1 = degree + 1

    i = np.arange(N, dtype=np.int64)
    j_np = ((i * L_) // M_).astype(np.int32)
    s_np = ((i * L_) % M_).astype(np.int32)
    j_max = int(j_np[-1])
    region_len = j_max + 2 + taps
    p_len = j_max + 2  # Y positions

    K = -(-N // q)
    n_pad = K * q
    j_pad = np.concatenate([j_np, np.full(n_pad - N, j_np[-1], np.int32)])
    s_pad = np.concatenate([s_np, np.zeros(n_pad - N, np.int32)])
    block_base = j_pad.reshape(K, q)[:, 0]                 # [K] static
    j_loc = (j_pad.reshape(K, q) - block_base[:, None])    # [K, q] static
    w_max = int(j_loc.max()) + 2                            # +wrap
    y_pad_len = int(block_base.max()) + w_max

    A, _ = farrow_matrix(coeffs, degree)
    filt = jnp.asarray(A[:, None, :])  # [d1, 1, taps] OIH

    j_loc_c = jnp.asarray(j_loc)
    s_c = jnp.asarray(s_pad.reshape(K, q))
    M = jnp.int32(M_)

    def convolve(buffer, read_pos, pos_num, n_out):
        base = pos_num // M
        r = pos_num - base * M
        avail = valid_end - read_pos
        base = jnp.minimum(base, avail)

        region = jax.lax.dynamic_slice(
            buffer, (0, read_pos + base), (C, region_len)
        )
        y = jax.lax.conv_general_dilated(
            region[:, None, :], filt, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [C, d1, p_len]
        y = jnp.pad(y, ((0, 0), (0, 0), (0, y_pad_len - p_len)))
        # static block slices -> [C, d1, K, w_max] -> [K, C, d1, w_max]
        y_blk = jnp.stack(
            [
                jax.lax.slice_in_dim(y, int(b), int(b) + w_max, axis=2)
                for b in block_base
            ],
            axis=0,
        )  # [K, C, d1, w_max]

        wrap = (r + s_c >= M).astype(jnp.int32)        # [K, q]
        frac = (r + s_c - M * wrap).astype(jnp.float32) / jnp.float32(M_)
        u = 2.0 * frac - 1.0
        # Chebyshev rows via recurrence: [K, q, d1]
        ts = [jnp.ones_like(u), u]
        for _ in range(d1 - 2):
            ts.append(2.0 * u * ts[-1] - ts[-2])
        v = jnp.stack(ts, axis=-1)

        g = jnp.einsum(
            "kqd,kcdw->kcqw", v, y_blk,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [K, C, q, w_max]
        jl = j_loc_c + wrap  # [K, q] traced
        mask = (
            jl[:, None, :, None]
            == jnp.arange(w_max, dtype=jnp.int32)[None, None, None, :]
        )
        out = jnp.sum(jnp.where(mask, g, 0.0), axis=3)  # [K, C, q]
        out = jnp.transpose(out, (0, 2, 1)).reshape(K * q, C)[:N]
        return out

    return convolve


def check_vs_gather():
    L, M = reduce_ratio(44100, 44101)
    cfg = fe.FirConfig(channels=2, taps=64, ratio_num=L, ratio_den=M)
    cutoff = fe.fir_cutoff(64, Attenuation.Db90, 44100 / 44101)
    coeffs = fe.fir_coefficients(64, Attenuation.Db90, cutoff)
    conv_g = fe._convolve_gather(cfg, coeffs)
    conv_f = build_farrow_convolve(cfg, coeffs)
    rng = np.random.default_rng(0)
    buf = np.zeros((2, cfg.buffer_alloc), np.float32)
    buf[:, cfg.input_capacity - 3000 : cfg.input_capacity] = (
        rng.standard_normal((2, 3000)).astype(np.float32)
    )
    read_pos = jnp.int32(cfg.input_capacity - 3000)
    for pos in (0, 12345, 44100):
        og = jax.jit(conv_g)(jnp.asarray(buf), read_pos, jnp.int32(pos),
                             jnp.int32(cfg.out_capacity))
        of = jax.jit(conv_f)(jnp.asarray(buf), read_pos, jnp.int32(pos),
                             jnp.int32(cfg.out_capacity))
        # only frames the schedule can produce from 3000 avail are valid
        n_valid = int((3000 - 64 + 1) * M // L)
        d = np.abs(np.asarray(og)[:n_valid] - np.asarray(of)[:n_valid]).max()
        print(f"pos={pos}: farrow-vs-gather max diff {d:.2e} "
              f"(lerp-vs-poly floor ~1e-5)")


def bench_path(path_builder, dispatches=3, warmup=1, n_streams=64,
               chunk_frames=2048):
    import bench as B  # reuse machinery shape
    C = 2
    L, M = reduce_ratio(44100, 44101)
    cfg = fe.FirConfig(channels=C, taps=Latency.Sample64.taps,
                       ratio_num=L, ratio_den=M)
    cutoff = fe.fir_cutoff(Latency.Sample64.taps, Attenuation.Db90,
                           44100 / 44101)
    coeffs = fe.fir_coefficients(Latency.Sample64.taps, Attenuation.Db90,
                                 cutoff)
    orig = fe._convolve_gather
    if path_builder is not None:
        fe._convolve_gather = path_builder
    try:
        step = fe.make_fir_step(cfg, coeffs, path="gather")
    finally:
        fe._convolve_gather = orig
    n_valid = jnp.full((n_streams,), chunk_frames, jnp.int32)
    budget = jnp.full((n_streams,), cfg.out_capacity, jnp.int32)
    state = jax.vmap(lambda _: fe.fir_init(cfg))(jnp.arange(n_streams))

    def fleet(state, chunks):
        def body(st, _):
            st, out, consumed, produced = jax.vmap(step)(
                st, chunks, n_valid, budget)
            return st, (jnp.sum(produced), jnp.max(jnp.abs(out)))
        state, (produced, peaks) = jax.lax.scan(
            body, state, None, length=B.SCAN_LEN)
        return state, jnp.sum(produced), jnp.max(peaks)

    fleet = jax.jit(fleet, donate_argnums=0)
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(
        rng.standard_normal((n_streams, chunk_frames, C)), jnp.float32)
    for _ in range(warmup):
        state, produced, peak = fleet(state, chunks)
    jax.block_until_ready(peak)
    parts = []
    t0 = time.perf_counter()
    for _ in range(dispatches):
        state, produced, peak = fleet(state, chunks)
        parts.append(produced)
    jax.block_until_ready(peak)
    dt = time.perf_counter() - t0
    return sum(int(p) for p in parts) * C / dt / 1e6


def main():
    print("backend:", jax.default_backend(), flush=True)
    fit_accuracy()
    check_vs_gather()
    if jax.default_backend() != "tpu":
        return
    print("gather:", round(bench_path(None), 1), "Msps", flush=True)
    print("farrow:", round(bench_path(build_farrow_convolve), 1), "Msps",
          flush=True)


if __name__ == "__main__":
    main()
