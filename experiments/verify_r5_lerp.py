"""Verify drive: lerp semantics tiers through the public API (TPU).

Stage 1: ResamplerFir.new_from_hz(path="lerp") tone pitch/amplitude.
Stage 2: BatchedResamplerFir sync tm fleet path="lerp" tone.
Stage 3: path validation on a variant that cannot honor it.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import resampler_tpu as rt
from resampler_tpu.engine.batched import BatchedResamplerFir

print("backend:", jax.default_backend(), flush=True)

t = np.arange(20480, dtype=np.float64) / 44100.0
tone = 0.8 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)


def tone_freq(sig, rate):
    zc = np.where((sig[:-1] < 0) & (sig[1:] >= 0))[0]
    return rate * (zc.size - 1) / (zc[-1] - zc[0])


# -- stage 1: per-stream wrapper, lerp path ------------------------------
t0 = time.perf_counter()
r = rt.ResamplerFir.new_from_hz(2, 44100, 44101, path="lerp")
x = np.empty(2 * tone.size, np.float32)
x[0::2] = tone
x[1::2] = tone
y = r.process(x)
L = y[0::2]
f = tone_freq(L, 44101)
print(
    f"stage1 wrapper lerp: out={y.size // 2} frames, freq={f:.2f} Hz, "
    f"peak={np.abs(L).max():.3f}  [{time.perf_counter() - t0:.0f}s]",
    flush=True,
)
assert abs(f - 440.0) < 0.5 and 0.75 < np.abs(L).max() <= 0.82

# -- stage 2: sync tm fleet, lerp basis ----------------------------------
t0 = time.perf_counter()
B, C, chunk = 8, 2, 1024
fleet = BatchedResamplerFir(
    B, C, 44100, 44101, synchronized=True, sync_variant="tm",
    max_chunk=chunk, path="lerp",
)
outs = []
for i in range(0, tone.size - chunk + 1, chunk):
    seg = tone[i:i + chunk]
    chunks = np.ascontiguousarray(
        np.broadcast_to(seg[None, :, None], (B, chunk, C))
    ).astype(np.float32)
    out, consumed, produced, peak = fleet.resample(chunks)
    p = int(np.asarray(produced)[0])
    if p:
        outs.append(np.asarray(out)[:, :p, :])
yf = np.concatenate(outs, axis=1)
Lf = yf[3, :, 0]
f = tone_freq(Lf, 44101)
print(
    f"stage2 lerp tm fleet: {yf.shape[1]} frames/stream, freq={f:.2f} Hz, "
    f"peak={np.abs(Lf).max():.3f}  [{time.perf_counter() - t0:.0f}s]",
    flush=True,
)
assert abs(f - 440.0) < 0.5 and 0.75 < np.abs(Lf).max() <= 0.82
assert np.allclose(yf, yf[0:1], atol=1e-6)

# -- stage 3: validation --------------------------------------------------
try:
    BatchedResamplerFir(
        4, 2, 44100, 44101, synchronized=True, sync_variant="async_tm",
        max_chunk=1024, path="lerp",
    )
    print("FAIL: no error")
    sys.exit(1)
except ValueError as e:
    print("stage3 validation ok:", str(e)[:70], flush=True)

print("VERIFY GREEN")
