"""Fleet serving runtime: host staging pool + batched device resampling.

The production serving shape (BASELINE.md config 5: many concurrent
streams with arbitrary input sizes): producers push interleaved audio into
per-stream queues (native thread-safe pool, csrc/resampler_host.cpp, with
a pure-python fallback); ``step()`` drains one fixed-shape batch, runs the
vmapped device step, and returns each stream's newly produced samples.
Frames the device couldn't accept (full stream buffer) are held in a
per-stream host carry and fed first on the next step — nothing is lost,
order is preserved.

    fleet = StreamingFleet(n_streams=64, channels=8,
                           input_rate=44100, output_rate=48000)
    fleet.push(stream_id, interleaved_f32)
    outputs = fleet.step()     # list of n_streams interleaved arrays
"""

from __future__ import annotations

import numpy as np

from .engine.batched import BatchedResamplerFir
from .types import Attenuation, Latency
from .utils.native import HostStreamPool

__all__ = ["StreamingFleet"]


class StreamingFleet:
    """N independent streaming FIR resamplers fed through a staging pool."""

    def __init__(
        self,
        n_streams: int,
        channels: int,
        input_rate,
        output_rate,
        latency: Latency = Latency.Sample64,
        attenuation: Attenuation = Attenuation.Db120,
        *,
        chunk_frames: int = 2048,
        queue_capacity_frames: int = 1 << 16,
        mesh=None,
    ) -> None:
        self.n_streams = n_streams
        self.channels = channels
        self.chunk_frames = chunk_frames
        self.pool = HostStreamPool(
            n_streams, channels, capacity_frames=queue_capacity_frames
        )
        self.engine = BatchedResamplerFir(
            n_streams,
            channels,
            input_rate,
            output_rate,
            latency,
            attenuation,
            mesh=mesh,
        )
        # unconsumed frames awaiting the next device step, frames-major
        self._carry = [
            np.zeros((0, channels), np.float32) for _ in range(n_streams)
        ]

    def push(self, stream: int, interleaved: np.ndarray) -> int:
        """Queue interleaved f32 audio for one stream (thread-safe with the
        native pool).  Returns the number of values accepted."""
        if not 0 <= stream < self.n_streams:
            raise IndexError(
                f"stream {stream} out of range [0, {self.n_streams})"
            )
        return self.pool.push(stream, interleaved)

    def pending(self, stream: int) -> int:
        """Values queued (pool + carry) but not yet consumed on device."""
        return int(
            self.pool.pending(stream) + self._carry[stream].size
        )

    def step(self) -> list[np.ndarray]:
        """Drain one batch (carry first, then pool), resample all streams
        on device, return each stream's newly produced samples."""
        drained, pool_valid = self.pool.fill(self.chunk_frames)

        batch = np.zeros(
            (self.n_streams, self.chunk_frames, self.channels), np.float32
        )
        n_valid = np.zeros(self.n_streams, np.int32)
        for s in range(self.n_streams):
            combined = np.concatenate(
                [self._carry[s], drained[s, : pool_valid[s]]]
            )
            take = min(len(combined), self.chunk_frames)
            batch[s, :take] = combined[:take]
            n_valid[s] = take
            self._carry[s] = combined[take:]

        out, consumed, produced, _peak = self.engine.resample(batch, n_valid)
        out = np.asarray(out)
        consumed = np.asarray(consumed)
        produced = np.asarray(produced)

        results: list[np.ndarray] = []
        for s in range(self.n_streams):
            c, v = int(consumed[s]), int(n_valid[s])
            if c < v:  # device stream buffer full: keep the tail for later
                self._carry[s] = np.concatenate(
                    [batch[s, c:v], self._carry[s]]
                )
            results.append(out[s, : int(produced[s])].reshape(-1).copy())
        return results

    def drain(self) -> list[np.ndarray]:
        """Step until no stream makes progress; per-stream concatenated
        outputs."""
        parts: list[list[np.ndarray]] = [[] for _ in range(self.n_streams)]
        while True:
            outs = self.step()
            if not any(o.size for o in outs):
                break
            for s, o in enumerate(outs):
                if o.size:
                    parts[s].append(o)
        return [
            np.concatenate(p) if p else np.zeros(0, np.float32) for p in parts
        ]
