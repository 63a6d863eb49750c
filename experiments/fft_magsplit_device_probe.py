"""Device probe: magnitude-split precision FFT projector (round 2).

Scheme (host analysis: fft_precision_split_probe.py): in the input-domain
T2 form (``out_t = [x_{t-1}; x_t] @ T2``, [2N, M]) the operator is banded
Toeplitz with 99.7% of its energy in one 147-row period.  So run:

  pass1 = bf16(x2) @ bf16(T2)            # ONE dense bf16 MXU pass
  corr  = sum_s  xp[:, b0+s : b0+s+g] @ Ws   # w_p banded shift-dots
  out   = pass1 + corr

where xp packs per-period (hi, lo) bf16 halves [R, 2g, 2*lp] and each
Ws = [bf16(T2 - bf16(T2)) period row ; bf16(T2) period row] [2*lp, mp] is
one shared (shift-invariant) correction block.  FLOPs: 1 + 2*w_p/(2g)
dense-pass equivalents vs 3 for Precision.HIGH.

Variants measured at the bench shape ([16384, 2352] @ T2 [2352, 1280]):
  high     : jnp.dot precision=HIGH in the P-form (production baseline)
  splitN   : the scheme with w_p=N shift-dots
  split1d  : single stacked dot (windows materialized, K = w_p*2*lp)
  convN    : corr as conv_general_dilated over the period axis

Run on the TPU host: python experiments/fft_magsplit_device_probe.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from resampler_tpu.engine import fft as fft_engine

SCAN_LEN = 40
C = 2
N, M = 1176, 1280
G = 8          # gcd
LP, MP = N // G, M // G
B0 = {4: 3, 5: 2, 6: 2}  # best offsets from the host sweep


def split_bf16(x):
    """(hi, lo) bf16 split of f32 ``x`` that survives XLA.

    The naive ``lo = x - bf16(x).astype(f32)`` is silently simplified to
    ZERO under jit (XLA's excess-precision rule elides the
    f32->bf16->f32 convert round-trip; verified on CPU and TPU backends).
    Do the round-to-nearest-even bf16 rounding with integer bit ops,
    which XLA cannot elide.
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    u_r = (u + 0x7FFF + ((u >> 16) & 1)) & jnp.uint32(0xFFFF0000)
    hi_f = jax.lax.bitcast_convert_type(u_r, jnp.float32)
    return hi_f.astype(jnp.bfloat16), (x - hi_f).astype(jnp.bfloat16)


def t2_f64():
    T = fft_engine.spectral_projection_matrix(N, M).astype(np.float64)
    return np.vstack([T[:, M:], T[:, :M]])  # [2N, M]


def build_weights(w_p):
    T2 = t2_f64()
    t2h = T2.astype(np.float32).astype(jnp.bfloat16)
    t2l = (T2 - np.asarray(t2h, np.float64)).astype(np.float32)
    b0 = B0[w_p]
    ws = []
    for s in range(w_p):
        r0 = (b0 + s) * LP
        block = np.concatenate(
            [t2l[r0 : r0 + LP, :MP], np.asarray(t2h, np.float32)[r0 : r0 + LP, :MP]],
            axis=0,
        )  # [2*LP, MP]
        ws.append(block)
    return jnp.asarray(t2h, jnp.bfloat16), jnp.asarray(
        np.stack(ws), jnp.bfloat16
    ), b0


def make_step(kind, B):
    R = B * C
    if kind == "high":
        proj = jnp.asarray(fft_engine.get_projection_matrix(N, M))

        def step(state, chunks):
            x = chunks.reshape(R, N)
            full = jnp.dot(x, proj, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGH)
            full = full.reshape(B, C, 2 * M)
            out = full[:, :, :M] + state["overlap"]
            return {"overlap": full[:, :, M:]}, out

        def init():
            return {"overlap": jnp.zeros((B, C, M), jnp.float32)}

        return step, init

    w_p = int(kind.replace("split", "").replace("conv", "").replace("1d", "") or 6)
    t2h, ws, b0 = build_weights(w_p)
    conv = kind.startswith("conv")
    onedot = "1d" in kind
    if onedot:
        # [w_p, 2LP, MP] -> stacked K [w_p*2LP, MP]
        ws_flat = ws.reshape(w_p * 2 * LP, MP)
    if conv:
        # conv weights [window, in_ch, out_ch] = [w_p, 2LP, MP]
        ws_conv = ws

    def step(state, chunks):
        cur = chunks.reshape(R, N)
        x2 = jnp.concatenate([state["prev"], cur], axis=1)  # [R, 2N]
        per = x2.reshape(R, 2 * G, LP)
        hi, lo = split_bf16(per)
        y1 = jnp.dot(hi.reshape(R, 2 * N), t2h,
                     preferred_element_type=jnp.float32)  # [R, M]
        xp = jnp.concatenate([hi, lo], axis=2)  # [R, 2G, 2LP]
        if conv:
            win = jax.lax.dynamic_slice_in_dim(xp, b0, G + w_p - 1, axis=1)
            corr = jax.lax.conv_general_dilated(
                win, ws_conv, window_strides=(1,), padding="VALID",
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.float32,
            )  # [R, G, MP]
        elif onedot:
            wins = jnp.concatenate(
                [xp[:, b0 + s : b0 + s + G] for s in range(w_p)], axis=2
            )  # [R, G, w_p*2LP]
            corr = jnp.dot(
                wins.reshape(R * G, w_p * 2 * LP), ws_flat,
                preferred_element_type=jnp.float32,
            ).reshape(R, G, MP)
        else:
            corr = jnp.zeros((R, G, MP), jnp.float32)
            for s in range(w_p):
                v = xp[:, b0 + s : b0 + s + G].reshape(R * G, 2 * LP)
                corr = corr + jnp.dot(
                    v, ws[s], preferred_element_type=jnp.float32
                ).reshape(R, G, MP)
        out = (y1 + corr.reshape(R, M)).reshape(B, C, M)
        return {"prev": cur}, out

    def init():
        return {"prev": jnp.zeros((R, N), jnp.float32)}

    return step, init


def quality(kind):
    """Device noise floor vs f64 host reference, one step, 64 rows."""
    Bq = 32
    step, init = make_step(kind, Bq)
    rng = np.random.default_rng(7)
    prev = rng.standard_normal((Bq * C, N)).astype(np.float32)
    cur = rng.standard_normal((Bq, C, N)).astype(np.float32)
    if kind == "high":
        state = init()
        # run prev then cur so overlap is populated
        state, _ = jax.jit(step)(state, prev.reshape(Bq, C, N))
        state, out = jax.jit(step)(state, cur)
    else:
        state = {"prev": jnp.asarray(prev)}
        state, out = jax.jit(step)(state, cur)
    T2 = t2_f64()
    x2 = np.concatenate([prev, cur.reshape(Bq * C, N)], axis=1)
    ref = (x2.astype(np.float64) @ T2).reshape(Bq, C, M)
    err = np.asarray(out, np.float64) - ref
    return float(-20 * np.log10(np.sqrt((err**2).mean() / (ref**2).mean())))


def bench(kind, B, dispatches=5, warmup=2):
    step, init = make_step(kind, B)
    state = init()

    def fleet(state, chunks):
        def body(st, _):
            st, out = step(st, chunks)
            return st, jnp.max(jnp.abs(out))
        state, peaks = jax.lax.scan(body, state, None, length=SCAN_LEN)
        return state, jnp.max(peaks)

    fleet = jax.jit(fleet, donate_argnums=0)
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.standard_normal((B, C, N)), jnp.float32)
    for _ in range(warmup):
        state, peak = fleet(state, chunks)
    jax.block_until_ready(peak)
    t0 = time.perf_counter()
    for _ in range(dispatches):
        state, peak = fleet(state, chunks)
    jax.block_until_ready(peak)
    dt = time.perf_counter() - t0
    return dispatches * SCAN_LEN * B * C * M / dt / 1e6


def main():
    print("backend:", jax.default_backend(), flush=True)
    kinds = ["high", "split4", "split5", "split6", "split1d6", "conv6"]
    for kind in kinds:
        db = quality(kind)
        print(f"{kind:9s} noise floor: {db:6.1f} dB", flush=True)
    for kind in kinds:
        msps = bench(kind, 8192)
        print(f"{kind:9s} B=8192: {msps:8.1f} Msps ({msps/258.0:5.2f}x ref)",
              flush=True)


if __name__ == "__main__":
    main()
