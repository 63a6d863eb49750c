"""Opt-in REFERENCE-SCHEDULE parity engine for the FIR resampler.

The production engine carries the stream position as an exact int32
rational (``pos_num / M``) — zero drift for any stream length, and the
property the fleet schedules are built on.  The reference instead
advances an **f64 accumulator** one ``+= ratio`` per output
(reference: src/resampler_fir.rs:191-196, 542-615).  The two agree to
f64 noise everywhere EXCEPT at exact phase boundaries (every M-th
output), where ~1-ulp accumulator rounding can land just below an
integer position and the reference picks the clamped phase pair
(1023, 1023) at offset ``k`` where the exact schedule picks phase 0 at
offset ``k+1`` — a bounded ~1e-3 relative wobble (PARITY.md §2.3,
quantified in tests/test_fir_engine.py::test_f64_accumulator_divergence).

``ResamplerFir(..., schedule="reference")`` routes through this module:
a host-side (numpy) engine that reproduces the reference's SCHEDULE
semantics faithfully —

- f64 ``position`` advanced by one IEEE add per output
  (``np.add.accumulate`` performs the identical left-to-right add
  sequence, so the position sequence is bit-equal to the reference's
  scalar loop),
- ``input_offset = floor(position)``,
- ``phase_f = min(fract(position) * 1024, 1023.0)`` with the
  ``phase2 = min(phase1 + 1, 1023)`` clamp,
- the blend fraction rounded through f32 exactly where the reference
  casts it (``let frac = ... as f32``, src/resampler_fir.rs:564),
- f64 consume arithmetic (``position -= floor(position).min(avail)``).

The CONVOLVE runs in f64 (better than any of the reference's per-ISA
f32 kernels, which already disagree with each other by reassociation) —
the parity question this mode answers is the schedule's, not the
SIMD rounding's.  It is a verification/bit-parity surface, not a
serving path: it runs on the host at reference-scalar-like speed.
"""

from __future__ import annotations

import math

import numpy as np

from ..types import InvalidInputBufferSize, InvalidOutputBufferSize

PHASES = 1024


class ReferenceScheduleFir:
    """Host-side streaming FIR with the reference's f64 position schedule.

    ``coeffs`` is the same ``[PHASES, taps]`` f32 polyphase table the
    device engine uses (``fir_coefficients``), so any output difference
    vs the production engine isolates the SCHEDULE, not the filter.
    """

    def __init__(
        self,
        channels: int,
        taps: int,
        coeffs: np.ndarray,
        input_hz: int,
        output_hz: int,
        input_capacity: int = 4096,
    ) -> None:
        assert coeffs.shape == (PHASES, taps), coeffs.shape
        self.channels = channels
        self.taps = taps
        self.coeffs = np.asarray(coeffs, np.float64)
        # ratio exactly as the reference computes it: one f64 divide
        # (src/resampler_fir.rs:330: input_rate as f64 / output_rate as f64)
        self.ratio = float(input_hz) / float(output_hz)
        self.input_capacity = input_capacity
        self.buffer_size = 2 * input_capacity
        self.out_capacity = int(input_capacity / self.ratio) + 2
        self.reset()

    def reset(self) -> None:
        self.buf = np.zeros((self.channels, self.buffer_size), np.float64)
        self.read_position = 0
        self.available = 0
        self.position = 0.0

    def slew(self, samples: float) -> float:
        """Phase adjustment on the f64 accumulator (the production
        engine's drift primitive, mapped onto this schedule): position
        moves by ``samples`` directly, clamped to buffered history."""
        applied = max(float(samples), -self.position)
        self.position += applied
        return applied

    def resample_frames(self, frames: np.ndarray, out_budget: int):
        """``frames [n, C] f32 -> (consumed_frames, out [p, C] f32)``."""
        C = self.channels
        taps = self.taps
        frames = np.asarray(frames, np.float64).reshape(-1, C)
        n_in = len(frames)

        write_pos = self.read_position + self.available
        to_copy = min(
            n_in, self.buffer_size - write_pos,
            self.input_capacity - self.available,
        )
        self.buf[:, write_pos : write_pos + to_copy] = frames[:to_copy].T
        self.available += to_copy

        # ---- the reference loop, vectorized schedule-faithfully ----
        # seq[i] = position after i sequential f64 adds of `ratio`
        # (np.add.accumulate rounds each partial sum exactly like the
        # scalar `self.position += self.ratio` loop).
        budget = max(int(out_budget), 0)
        seq = np.add.accumulate(
            np.concatenate((
                np.asarray([self.position], np.float64),
                np.full(budget, self.ratio, np.float64),
            ))
        )
        pos_before = seq[:-1]
        offs = np.floor(pos_before).astype(np.int64)
        can_emit = offs + taps <= self.available
        # outputs stop at the FIRST failing offset (monotone positions,
        # but guard the general case exactly like the sequential break)
        n_out = int(np.argmin(can_emit)) if not can_emit.all() else budget

        if n_out:
            pos_b = pos_before[:n_out]
            offs_b = offs[:n_out]
            phase_f = np.minimum(
                (pos_b - offs_b) * float(PHASES), float(PHASES - 1)
            )
            p1 = phase_f.astype(np.int64)
            p2 = np.minimum(p1 + 1, PHASES - 1)
            # the reference narrows the blend fraction to f32 here
            # (src/resampler_fir.rs:564)
            frac = (
                (phase_f - p1).astype(np.float32).astype(np.float64)[:, None]
            )
            w = (1.0 - frac) * self.coeffs[p1] + frac * self.coeffs[p2]
            sw = np.lib.stride_tricks.sliding_window_view(
                self.buf, taps, axis=1
            )  # [C, buffer_size - taps + 1, taps]
            windows = sw[:, self.read_position + offs_b]  # [C, n_out, taps]
            out = np.einsum("cnt,nt->nc", windows, w).astype(np.float32)
        else:
            out = np.zeros((0, C), np.float32)

        # position after exactly n_out sequential adds
        self.position = float(seq[n_out])
        consumed = min(int(math.floor(self.position)), self.available)
        self.read_position += consumed
        self.available -= consumed
        self.position -= float(consumed)

        if self.read_position > self.input_capacity:
            self.buf[:, : self.available] = self.buf[
                :, self.read_position : self.read_position + self.available
            ]
            self.buf[:, self.available : self.read_position + self.available] = 0.0
            self.read_position = 0

        return to_copy, out

    # -- interleaved surface (mirrors ResamplerFir.resample) -------------

    def resample(self, input, output) -> tuple[int, int]:
        C = self.channels
        input = np.asarray(input, dtype=np.float32)
        if input.ndim != 1 or input.size % C:
            raise InvalidInputBufferSize(
                f"input length {input.size} is not a multiple of channels {C}"
            )
        if (
            not isinstance(output, np.ndarray)
            or output.ndim != 1
            or output.size % C
        ):
            raise InvalidOutputBufferSize(
                "output must be a 1-D numpy array with length a multiple of "
                f"channels {C}"
            )
        consumed, out = self.resample_frames(
            input.reshape(-1, C), output.size // C
        )
        produced = len(out)
        if produced:
            output[: produced * C] = out.reshape(-1)
        return consumed * C, produced * C
