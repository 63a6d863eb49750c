"""Magnitude-split precision for the FFT projector (round 2, host probe).

Idea: Precision.HIGH (bf16x3) spends its two correction passes
(``xh@Pl``, ``xl@Ph``) over the WHOLE dense [N, 2M] projector, but the
correction only matters where |P| is large — and the projector is (in the
[2N, M] input-domain form T2) a banded Toeplitz operator whose magnitude
decays away from the filter's main lobe.  If the corrections can be
restricted to a band of w_p periods (w_p*147 rows per 160-col block) while
the first pass stays a single dense bf16 matmul, total FLOPs drop from
3 dense passes to 1 + 2*(w_p+1)/16 dense-equivalents.

This probe answers, ON HOST with bit-exact bf16 rounding (ml_dtypes):
  1. what the magnitude/energy profile of T2 looks like per period,
  2. the measured stopband (bench.py attestation method) of the split
     scheme vs band width w_p, for both the attestation pair
     (588->1280, 22.05k->48k) and the throughput pair (1176->1280).

Run: JAX_PLATFORMS=cpu python experiments/fft_precision_split_probe.py
"""

import math
import sys
from pathlib import Path

import numpy as np
import ml_dtypes

sys.path.insert(0, str(Path(__file__).parent.parent))

from resampler_tpu.engine import fft as fft_engine

BF16 = ml_dtypes.bfloat16


def bf16(a):
    return a.astype(BF16).astype(np.float32)


def t2_form(n_in, n_out):
    """[2N, M] input-domain operator: out_t = [x_{t-1}; x_t] @ T2."""
    T = fft_engine.spectral_projection_matrix(n_in, n_out).astype(np.float64)
    return np.vstack([T[:, n_out:], T[:, :n_out]])


def band_mask_t2(n_in, n_out, b0, w_p):
    """Period-banded mask on T2: column block jb covers row periods
    [jb + b0, jb + b0 + w_p) (periods of lp=147 rows, blocks of mp cols)."""
    g = math.gcd(n_in, n_out)
    lp, mp = n_in // g, n_out // g
    mask = np.zeros((2 * n_in, n_out), bool)
    n_blocks = n_out // mp
    for jb in range(n_blocks):
        r0 = (jb + b0) * lp
        r1 = min(r0 + w_p * lp, 2 * n_in)
        r0 = max(r0, 0)
        mask[r0:r1, jb * mp : (jb + 1) * mp] = True
    return mask


def mask_to_proj(mask_t2, n_in, n_out):
    """Map a T2 mask back to the [N, 2M] projector layout."""
    mask = np.zeros((n_in, 2 * n_out), bool)
    mask[:, n_out:] = mask_t2[:n_in]   # B part (applied to prev chunk)
    mask[:, :n_out] = mask_t2[n_in:]   # A part (applied to current chunk)
    return mask


def split_matmul(x, P, mask):
    """Simulated TPU split: dense bf16 pass + masked correction passes,
    all f32 accumulation."""
    Ph = bf16(P.astype(np.float32))
    Pl = (P - Ph).astype(np.float32)
    xh = bf16(x)
    xl = bf16((x - xh).astype(np.float32))
    y = xh @ Ph
    if mask is not None:
        y = y + xh @ np.where(mask, bf16(Pl), 0.0) + xl @ np.where(mask, Ph, 0.0)
    return y


def stopband_for(n_in, n_out, in_rate, out_rate, mask, n_chunks=10):
    """bench.py quality_attestation, single channel, numpy.  For
    near-unity ratios (no measurable stopband window) falls back to the
    arithmetic-noise-floor proxy: -20log10(rms error vs f64 / rms signal)
    on white noise — HIGH measures ~106 dB on this scale."""
    P = fft_engine.spectral_projection_matrix(n_in, n_out).astype(np.float64)
    nyq = min(in_rate, out_rate) / 2
    if nyq * 1.1 >= out_rate / 2 * 0.95:  # no stopband window: noise proxy
        rng = np.random.default_rng(7)
        x = rng.standard_normal((64, n_in)).astype(np.float32)
        y = split_matmul(x, P, mask)
        ref = x.astype(np.float64) @ P
        return float(
            -20 * np.log10(np.sqrt(((y - ref) ** 2).mean() / (ref**2).mean()))
        )
    x = np.zeros(n_chunks * n_in, np.float32)
    x[len(x) // 2] = 1.0
    overlap = np.zeros(n_out, np.float32)
    outs = []
    for k in range(n_chunks):
        full = split_matmul(x[None, k * n_in : (k + 1) * n_in], P, mask)[0]
        outs.append(full[:n_out] + overlap)
        overlap = full[n_out:]
    y = np.concatenate(outs)
    peak = int(np.argmax(np.abs(y)))
    w = int(out_rate * 0.1)
    s = max(peak - w // 2, 0)
    spec = np.fft.rfft(y[s : s + w], 1 << 17)
    mag = 20 * np.log10(np.maximum(np.abs(spec), 1e-12))

    def b(f):
        return round(f / out_rate * (1 << 17))

    pb = mag[b(20.0) : b(nyq * 0.9) + 1]
    sb = mag[b(nyq * 1.1) : b(out_rate / 2 * 0.95) + 1]
    return float(pb.max() - sb.max())


def profile(n_in, n_out):
    g = math.gcd(n_in, n_out)
    lp, mp = n_in // g, n_out // g
    T2 = t2_form(n_in, n_out)
    print(f"\n=== pair N={n_in} M={n_out}  g={g} lp={lp} mp={mp} "
          f"(T2 {T2.shape}) ===")
    # per-period max-abs and energy of the first column block
    blk = T2[:, :mp]
    n_per = 2 * n_in // lp
    tot_e = (T2 ** 2).sum()
    print("period | max|T2[:, :mp]| | colblock energy frac")
    for p in range(n_per):
        rows = blk[p * lp : (p + 1) * lp]
        print(f"  {p:2d}   | {np.abs(rows).max():12.3e} | "
              f"{(rows ** 2).sum() / (blk ** 2).sum():12.3e}")
    # full-band span for reference
    print(f"total T2 energy: {tot_e:.3e}")


def sweep(n_in, n_out, in_rate, out_rate):
    g = math.gcd(n_in, n_out)
    print(f"\n--- stopband sweep, pair {in_rate}->{out_rate} "
          f"(N={n_in}, M={n_out}) ---")
    full_hi = stopband_for(n_in, n_out, in_rate, out_rate,
                           np.ones((n_in, 2 * n_out), bool))
    none_db = stopband_for(n_in, n_out, in_rate, out_rate, None)
    print(f"full-correction (bf16x3 analog): {full_hi:7.1f} dB")
    print(f"no-correction   (single bf16):   {none_db:7.1f} dB")
    n_per = 2 * n_in // (n_in // g)
    for w_p in (1, 2, 3, 4, 6, 8):
        best = -1e9
        best_b0 = None
        for b0 in range(0, n_per - w_p + 1):
            m = mask_to_proj(band_mask_t2(n_in, n_out, b0, w_p), n_in, n_out)
            db = stopband_for(n_in, n_out, in_rate, out_rate, m)
            if db > best:
                best, best_b0 = db, b0
        frac = w_p * (n_in // g) / (2 * n_in)
        flops = 1 + 2 * frac
        print(f"w_p={w_p} (band {frac * 100:4.1f}% of rows, "
              f"{flops:.2f} dense-pass FLOPs): best {best:6.1f} dB "
              f"@ b0={best_b0}")


if __name__ == "__main__":
    profile(1176, 1280)
    sweep(588, 1280, 22050, 48000)
    sweep(1176, 1280, 44100, 48000)
