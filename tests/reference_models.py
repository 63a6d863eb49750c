"""Scalar NumPy models of the reference resamplers' documented semantics.

These serve the same role the scalar Rust kernels serve in the reference's
test strategy (SURVEY.md §4): an independent, obviously-correct
implementation the fast device path is differentially tested against.  The
FIR model reproduces the reference hot loop (reference:
src/resampler_fir.rs:509-621) but — like the engine under test — carries
the position as the exact rational ``pos_num / M`` instead of the
reference's f64 accumulator.  (The f64 accumulator drifts by ~1 ulp per
step; at exact phase boundaries — every M-th output — that drift makes the
reference pick the clamped phase pair (1023, 1023) at offset k where the
exact value is phase 0 at offset k+1, a ~1e-3 relative wobble.  The exact
path has zero drift for any stream length, so it is the better spec; the
engine-level quality gates below cover equivalence with the reference.)
"""

from __future__ import annotations

import math

import numpy as np

from resampler_tpu.dsp.window import (
    WindowType,
    calculate_cutoff_kaiser,
    make_sincs_for_kaiser,
)

PHASES = 1024
INPUT_CAPACITY = 4096
BUFFER_SIZE = INPUT_CAPACITY * 2


class ScalarFir:
    """Streaming scalar polyphase FIR with f64 position accumulator."""

    def __init__(self, channels, in_hz, out_hz, taps, beta):
        base_cutoff = calculate_cutoff_kaiser(taps, beta)
        cutoff = base_cutoff if in_hz <= out_hz else base_cutoff * out_hz / in_hz
        self.coeffs = make_sincs_for_kaiser(
            taps, PHASES, float(np.float32(cutoff)), beta, WindowType.SYMMETRIC
        ).astype(np.float64)
        self.channels = channels
        self.taps = taps
        g = math.gcd(in_hz, out_hz)
        self.L = in_hz // g  # position advances by L/M per output sample
        self.M = out_hz // g
        self.buf = np.zeros((channels, BUFFER_SIZE), np.float64)
        self.read_position = 0
        self.available = 0
        self.pos_num = 0  # exact position numerator, position = pos_num / M

    def resample(self, input_interleaved, out_capacity_frames):
        C = self.channels
        frames = np.asarray(input_interleaved, np.float64).reshape(-1, C)
        n_in = len(frames)

        write_pos = self.read_position + self.available
        to_copy = min(n_in, BUFFER_SIZE - write_pos, INPUT_CAPACITY - self.available)
        self.buf[:, write_pos : write_pos + to_copy] = frames[:to_copy].T
        self.available += to_copy

        out = []
        while True:
            off, rem = divmod(self.pos_num, self.M)
            if off + self.taps > self.available or len(out) >= out_capacity_frames:
                break
            p1, pf_rem = divmod(rem * PHASES, self.M)
            p2 = min(p1 + 1, PHASES - 1)
            frac = pf_rem / self.M
            pos = self.read_position + off
            window = self.buf[:, pos : pos + self.taps]
            w = (1.0 - frac) * self.coeffs[p1] + frac * self.coeffs[p2]
            out.append(window @ w)
            self.pos_num += self.L

        consumed = min(self.pos_num // self.M, self.available)
        self.read_position += consumed
        self.available -= consumed
        self.pos_num -= consumed * self.M

        if self.read_position > INPUT_CAPACITY:
            self.buf[:, : self.available] = self.buf[
                :, self.read_position : self.read_position + self.available
            ]
            self.read_position = 0

        produced = np.array(out, np.float64).reshape(-1, C) if out else np.zeros((0, C))
        return to_copy * C, produced.reshape(-1)


class ScalarFirF64(ScalarFir):
    """Bit-faithful model of the reference's **f64 position accumulator**
    (reference: src/resampler_fir.rs:191-194, 542-615): ``position`` is an
    f64 advanced by ``ratio = in_hz/out_hz`` per output sample, with
    ``input_offset = floor(position)``, ``phase_f = fract(position)*1024``,
    ``phase2 = min(phase1+1, 1023)`` clamping, and f64 consume arithmetic.

    Exists to QUANTIFY where the exact-rational engine diverges from the
    reference semantics (see test_fir_engine.py
    ``test_f64_accumulator_divergence`` and PARITY.md §2.3): rounding in
    the repeated ``position += ratio`` can land ~1 ulp below an exact
    integer position, picking the clamped pair (1023, 1023) at offset k
    where the exact schedule picks phase 0 at offset k+1.
    """

    def __init__(self, channels, in_hz, out_hz, taps, beta):
        super().__init__(channels, in_hz, out_hz, taps, beta)
        self.ratio = float(in_hz) / float(out_hz)
        self.position = 0.0

    def resample(self, input_interleaved, out_capacity_frames):
        C = self.channels
        frames = np.asarray(input_interleaved, np.float64).reshape(-1, C)
        n_in = len(frames)

        write_pos = self.read_position + self.available
        to_copy = min(n_in, BUFFER_SIZE - write_pos, INPUT_CAPACITY - self.available)
        self.buf[:, write_pos : write_pos + to_copy] = frames[:to_copy].T
        self.available += to_copy

        out = []
        while True:
            off = int(math.floor(self.position))
            if off + self.taps > self.available or len(out) >= out_capacity_frames:
                break
            phase_f = (self.position - off) * PHASES
            p1 = int(phase_f)
            p2 = min(p1 + 1, PHASES - 1)
            frac = phase_f - p1
            pos = self.read_position + off
            window = self.buf[:, pos : pos + self.taps]
            w = (1.0 - frac) * self.coeffs[p1] + frac * self.coeffs[p2]
            out.append(window @ w)
            self.position += self.ratio

        consumed = min(int(math.floor(self.position)), self.available)
        self.read_position += consumed
        self.available -= consumed
        self.position -= consumed

        if self.read_position > INPUT_CAPACITY:
            self.buf[:, : self.available] = self.buf[
                :, self.read_position : self.read_position + self.available
            ]
            self.read_position = 0

        produced = np.array(out, np.float64).reshape(-1, C) if out else np.zeros((0, C))
        return to_copy * C, produced.reshape(-1)
