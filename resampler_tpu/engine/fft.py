"""FFT overlap-add resampler engine — TPU-native.

Re-design of the reference FFT resampler
(reference: src/resampler_fft.rs:38-425) around one TPU-first idea:

**The whole spectral pipeline is one linear operator.**  Per chunk the
reference runs: zero-pad N→2N → forward real FFT → multiply by a
precomputed Kaiser filter spectrum → truncate/zero-pad bins to the output
size → inverse real FFT at 2M → overlap-add.  Every step is linear in the
input, and chunk sizes are small and fixed (N ≤ 4096, from the planner
table), so the composition is precomputed once in float64 on the host
(the reference computes f32 FFTs at runtime; designing the operator in
f64 and casting once is strictly more accurate), cached process-wide like
the reference's FFT_CACHE, and applied on the MXU.  There is no FFT
butterfly code on the hot path at all (the reference spends ~8.4k LoC of
SIMD on that — SURVEY.md §2.5).

Two production forms of the operator:

- ``backend="magsplit"`` (auto-selected on TPU when the pair's band
  geometry allows): the fused Pallas banded magnitude-split kernel
  (ops/fft_magsplit_kernel.py) — 0.42x the MXU work of the dense matmul
  at a better measured noise floor.
- ``backend="matmul"``: the dense ``[N, 2M]`` projector at
  ``Precision.HIGH`` — production off-TPU and for band-ineligible pairs.

Cross-check / escape-hatch backends: ``"conv"`` (banded channelized
form), ``"rfft"`` (device runtime FFT for outsized custom pairs),
``"fft"`` (``jnp.fft`` op-for-op mirror of the reference dataflow).

The carry is explicit pytree state (``overlap [C, M]`` for the spectral
forms; the previous chunk for the input-domain forms), so the engine
jits, vmaps (multi-stream), and shards like the FIR engine.
"""

from __future__ import annotations

import dataclasses
import math
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.planner import plan_conversion
from ..dsp.window import WindowType, calculate_cutoff_kaiser, make_sincs_for_kaiser
from ..types import (
    InvalidInputBufferSize,
    InvalidOutputBufferSize,
    SampleRate,
)

__all__ = [
    "KAISER_BETA",
    "FftConfig",
    "FftState",
    "fft_init",
    "make_fft_step",
    "make_fft_fleet_step",
    "fft_fleet_init",
    "spectral_projection_matrix",
    "input_domain_conv_operator",
    "conv_backend_viable",
    "fft_filter_spectrum",
    "ResamplerFft",
]

#: Kaiser window beta for ~-100 dB stopband
#: (reference: src/resampler_fft.rs:16).
KAISER_BETA = 10.0


@dataclasses.dataclass(frozen=True)
class FftConfig:
    """Static FFT engine configuration for one rate pair."""

    channels: int
    fft_size_input: int   # N: input samples per chunk per channel
    fft_size_output: int  # M: output samples per chunk per channel

    @property
    def delay(self) -> int:
        """Algorithmic latency in input samples = N/2
        (reference: src/resampler_fft.rs:147-153)."""
        return self.fft_size_input // 2


#: Carry pytree: ``{"overlap": f32[C, M]}`` for the matmul/fft backends,
#: ``{"prev": f32[C, N]}`` (the previous chunk) for the conv backend —
#: mathematically the same information (`overlap = prev @ T[:, M:]`).
FftState = dict


def fft_init(config: FftConfig, backend: str = "auto") -> FftState:
    backend = _resolve_backend(config, backend)
    if backend in ("conv", "magsplit"):
        return {
            "prev": jnp.zeros(
                (config.channels, config.fft_size_input), jnp.float32
            )
        }
    return {
        "overlap": jnp.zeros(
            (config.channels, config.fft_size_output), jnp.float32
        )
    }


def convert_fft_state(state: FftState, config: FftConfig, backend: str) -> FftState:
    """Convert a carry pytree to the schema ``backend`` expects.

    ``backend="auto"`` resolves per platform, so a checkpoint written on
    TPU (magsplit: ``{"prev"}``) may be restored where matmul
    (``{"overlap"}``) is production.  ``prev -> overlap`` is exact
    (``overlap = prev @ T[:, M:]``, computed at HIGHEST); the reverse is
    not invertible — construct the resampler with an explicit
    ``backend`` matching the checkpoint instead."""
    backend = _resolve_backend(config, backend)
    want_prev = backend in ("conv", "magsplit")
    if ("prev" in state) == want_prev:
        return state
    if "prev" in state and not want_prev:
        proj = jnp.asarray(
            get_projection_matrix(
                config.fft_size_input, config.fft_size_output
            )[:, config.fft_size_output :]
        )
        overlap = jnp.dot(
            jnp.asarray(state["prev"], jnp.float32),
            proj,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return {"overlap": overlap}
    raise ValueError(
        "cannot convert an {'overlap'} carry to the input-domain "
        f"{backend!r} backend's {{'prev'}} state (the projection is not "
        "invertible); construct the resampler with backend='matmul' to "
        "restore this checkpoint"
    )


def _magsplit_plan(config: FftConfig):
    from ..ops.fft_magsplit_kernel import plan_magsplit

    return plan_magsplit(config.fft_size_input, config.fft_size_output)


def _resolve_backend(config: FftConfig, backend: str) -> str:
    if backend == "auto":
        # Measured on v5e-1 (experiments/fft_*_probe): the fused Pallas
        # banded-magsplit kernel beats the dense HIGH projector 1.53x at
        # better accuracy wherever the pair's band geometry allows; the
        # dense projector matmul beats the conv lowering everywhere else.
        # On non-TPU backends the XLA matmul is the production path
        # (magsplit stays available explicitly, running interpreted).
        if jax.default_backend() == "tpu" and _magsplit_plan(config):
            return "magsplit"
        return "matmul"
    return backend


# --------------------------------------------------------------------------
# Filter + projection-matrix design (host, float64, cached)
# --------------------------------------------------------------------------


def fft_filter_spectrum(n_in: int, n_out: int) -> np.ndarray:
    """Kaiser filter spectrum of the overlap-add filter, float64.

    Matches the reference design (reference: src/resampler_fft.rs:338-383):
    cutoff from Kaiser theory at size ``min(n_in, n_out)``, scaled by
    ``n_out/n_in`` when downsampling; periodic window; time-domain filter
    normalized by ``1/(2*n_in)`` (folding the unnormalized-FFT round-trip
    scale into the filter); spectrum = rFFT of the zero-padded filter.
    Returns ``[n_in + 1]`` complex128 bins.
    """
    if n_in > n_out:
        scale = n_out / n_in
        cutoff = calculate_cutoff_kaiser(n_out, KAISER_BETA) * scale
    else:
        cutoff = calculate_cutoff_kaiser(n_in, KAISER_BETA)

    sincs = make_sincs_for_kaiser(
        n_in, 1, float(np.float32(cutoff)), KAISER_BETA, WindowType.PERIODIC
    ).astype(np.float64)[0]
    filter_time = np.zeros(2 * n_in, np.float64)
    filter_time[:n_in] = sincs / (2 * n_in)
    return np.fft.rfft(filter_time)


def spectral_projection_matrix(n_in: int, n_out: int) -> np.ndarray:
    """The fused ``[n_in, 2*n_out]`` float32 chunk operator ``T``.

    ``chunk_out_full = chunk_in @ T`` equals the reference per-chunk
    pipeline (reference: src/resampler_fft.rs:385-415): zero-pad to 2N,
    unnormalized rFFT, multiply the first ``new_length`` bins by the filter
    spectrum, copy them into a ``n_out+1``-bin spectrum (rest zero),
    unnormalized inverse rFFT at 2M.  Built column-exactly by pushing the
    identity basis through the (linear) pipeline with f64 numpy FFTs.
    """
    filt = fft_filter_spectrum(n_in, n_out)
    new_length = n_in + 1 if n_in < n_out else n_out

    basis = np.zeros((n_in, 2 * n_in), np.float64)
    basis[:, :n_in] = np.eye(n_in)
    spectrum = np.fft.rfft(basis, axis=1)  # unnormalized forward
    spectrum = spectrum[:, :new_length] * filt[:new_length]

    out_spec = np.zeros((n_in, n_out + 1), np.complex128)
    out_spec[:, :new_length] = spectrum
    # numpy irfft normalizes by 1/(2M); the reference inverse FFT is
    # unnormalized, so scale back by 2M.
    time = np.fft.irfft(out_spec, n=2 * n_out, axis=1) * (2 * n_out)
    return np.ascontiguousarray(time, dtype=np.float32)


def input_domain_conv_operator(n_in: int, n_out: int) -> np.ndarray:
    """The projector refactored as a **channelized strided convolution** —
    the FLOP-reduced production form (round 2).

    Write the chunk pipeline in the input domain:
    ``out_t = x_t @ A + x_{t-1} @ B`` with ``A = T[:, :M]``, ``B = T[:, M:]``
    (the overlap-add carry is just the previous chunk), i.e.
    ``out_t = [x_{t-1}; x_t] @ T2`` with ``T2 = [B; A]`` of shape ``[2N, M]``.
    Because the underlying kernel is time-invariant and the planner
    guarantees ``N/M = L'/M'`` with ``N = g*L'``, T2 has the exact shift
    structure ``T2[i + L', j + M'] = T2[i, j]`` (verified to ~1e-11) and
    each column's support spans < ``(g+1)*L'`` rows (entries beyond are
    < 1.2e-7 of max — below the f32 design floor).  So the matmul is a
    banded Toeplitz operator, which maps onto the MXU as a stride-1 conv
    by *channelizing at the period*: view ``[x_{t-1}; x_t]`` as ``2g``
    blocks of ``L'`` channels, and convolve with the ``[g+1, L', M']``
    filter ``W = T2[:(g+1)*L', :M']`` (a pure reshape of T2):

        out[c, k, j] = sum_{b, l} blocks[c, k+b, l] * W[b, l, j]

    FLOPs drop to ``(g+1)/(2g)`` of the dense projector (0.5625x for
    44.1<->48 kHz) and HBM writes halve (no separate overlap tail).
    Outputs match the dense projector to 2.4e-6.

    **Measured reality check (v5e-1, experiments/fft_conv_probe.py):**
    XLA's conv lowering at this shape (spatial 16, window 9) reaches only
    6.2 Gsamples/s vs the dense matmul's 9.9 — the FLOP cut does not
    survive the lowering, so ``backend="auto"`` keeps the matmul and this
    form stays an explicitly selectable backend (it wins on smaller
    batches/CPU and documents the banded structure).
    (reference chunk pipeline: src/resampler_fft.rs:385-424)
    """
    T = spectral_projection_matrix(n_in, n_out).astype(np.float64)
    T2 = np.vstack([T[:, n_out:], T[:, :n_out]])  # [2N, M] = [B; A]
    g = math.gcd(n_in, n_out)
    lp, mp = n_in // g, n_out // g
    span = (g + 1) * lp
    return np.ascontiguousarray(
        T2[:span, :mp].reshape(g + 1, lp, mp), dtype=np.float32
    )


def conv_backend_viable(n_in: int, n_out: int) -> bool:
    """Whether the channelized conv form is well-shaped: the period must
    feed the MXU (L', M' >= 64 lanes of channels) and the band must cut
    FLOPs (g >= 2).  Well-shaped does not mean faster — see the measured
    note in ``input_domain_conv_operator``."""
    g = math.gcd(n_in, n_out)
    return g >= 2 and n_in // g >= 64 and n_out // g >= 64


_PROJ_CACHE: dict[tuple[int, int], np.ndarray] = {}
_PROJ_LOCK = threading.Lock()


def get_projection_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Process-wide cache of projection matrices, the analog of the
    reference's global FFT_CACHE (reference: src/resampler_fft.rs:34-36,
    305-335)."""
    key = (n_in, n_out)
    with _PROJ_LOCK:
        mat = _PROJ_CACHE.get(key)
        if mat is None:
            mat = spectral_projection_matrix(n_in, n_out)
            _PROJ_CACHE[key] = mat
    return mat


# --------------------------------------------------------------------------
# Functional step
# --------------------------------------------------------------------------


def _make_magsplit_step(config: FftConfig):
    """Shared magsplit chunk-op builder: ``f(prev [R, N], cur [R, N]) ->
    out [R, M]`` via the fused Pallas banded-magsplit kernel (the
    production TPU path — see ops/fft_magsplit_kernel.py).  Runs
    interpreted off-TPU so the backend stays selectable (and testable)
    everywhere."""
    from ..ops.fft_magsplit_kernel import magsplit_projector, magsplit_weights

    plan = _magsplit_plan(config)
    if plan is None:
        raise ValueError(
            "magsplit backend: pair "
            f"{config.fft_size_input}->{config.fft_size_output} has no "
            "viable band plan (use backend='matmul')"
        )
    wh, wcorr = magsplit_weights(plan)
    interpret = jax.default_backend() != "tpu"

    def chunk_op(prev, cur):
        return magsplit_projector(
            prev, cur, wh, wcorr, plan=plan, interpret=interpret
        )

    return chunk_op


def make_fft_fleet_step_pool(
    config: FftConfig, n_streams: int, *, backend: str = "auto"
):
    """ZERO-COPY fleet step over a rotating chunk pool (the serving
    ingest form): producers write chunks into ``pool`` slots, and the
    magsplit kernel reads ``prev`` and ``cur`` straight from their slots
    via scalar-prefetched block index maps — no per-step [B, C, N]
    staging copy (a ``pallas_call`` cannot fuse a dynamic slice into its
    operand read, so the materialized form pays 2*B*C*N*4 extra HBM
    bytes per step: measured 27% of the step at the bench shape).

    ``step(state, pool [P, B*C, N], idx) -> (state', out [B, C, M])``
    with ``state = {"prev_idx": int32}``.  The pool's slot layout is the
    kernel's native row-major fleet form — producers write each slot as
    ``chunk.reshape(B*C, N)`` (free for a [B, C, N] chunk).  Passing a
    4-D ``[P, B, C, N]`` pool and reshaping INSIDE a jitted loop is the
    one trap: XLA materializes the reshape as a full-pool copy on every
    loop iteration to satisfy the pallas operand (measured 6.3 vs 15.9
    Gsps at the bench shape — experiments/fft_pool_probe.py bisect).
    Caller contract: the slot ``state["prev_idx"]`` still holds the
    previous chunk when ``step`` runs (pool depth >= 2; start a stream
    by zero-filling the initial ``prev_idx`` slot from
    ``fft_fleet_pool_init``).

    Magsplit backend only (the pool read is the kernel's); other
    backends take the materialized ``make_fft_fleet_step`` — their XLA
    ops fuse the slice themselves."""
    n_in = config.fft_size_input
    n_out = config.fft_size_output
    C = config.channels
    B = n_streams
    backend = _resolve_backend(config, backend)
    if backend != "magsplit":
        raise ValueError(
            f"the pool step is the magsplit kernel's zero-copy form; "
            f"backend {backend!r} fuses its own input reads — use "
            "make_fft_fleet_step"
        )
    from ..ops.fft_magsplit_kernel import (
        magsplit_projector_pool,
        magsplit_weights,
    )

    plan = _magsplit_plan(config)
    if plan is None:
        raise ValueError(
            "magsplit backend: pair "
            f"{config.fft_size_input}->{config.fft_size_output} has no "
            "viable band plan (use backend='matmul')"
        )
    wh, wcorr = magsplit_weights(plan)
    interpret = jax.default_backend() != "tpu"
    if (B * C) % 8:
        raise ValueError(
            f"pool step needs B*C ({B * C}) to be a multiple of 8 "
            "(Mosaic row tiling)"
        )

    def step(state, pool, idx):
        P = pool.shape[0]
        assert pool.shape == (P, B * C, n_in), pool.shape
        out = magsplit_projector_pool(
            pool,
            state["prev_idx"],
            idx,
            wh,
            wcorr,
            plan=plan,
            interpret=interpret,
        )
        return (
            {"prev_idx": jnp.asarray(idx, jnp.int32)},
            out.reshape(B, C, n_out),
        )

    return step


def fft_fleet_pool_init(prev_idx: int = 0):
    """Initial state for ``make_fft_fleet_step_pool``: the caller
    zero-fills pool slot ``prev_idx`` before the first step (stream
    start = silent previous chunk, same as ``fft_fleet_init``)."""
    return {"prev_idx": jnp.int32(prev_idx)}


def make_fft_step(config: FftConfig, *, backend: str = "auto"):
    """Build the pure chunk-step:

    ``step(state, chunk [C, N] f32) -> (state', out [C, M] f32)``

    ``backend="magsplit"`` runs the fused Pallas banded magnitude-split
    kernel (the production TPU path: ~0.42x HIGH's MXU work at a
    *better* measured noise floor); ``backend="conv"`` applies the
    channelized banded convolution (see ``input_domain_conv_operator``);
    ``backend="matmul"`` applies the fused projection matrix on the MXU
    at ``Precision.HIGH``; ``backend="fft"`` mirrors the reference
    dataflow with ``jnp.fft`` (cross-check / very large custom sizes);
    ``backend="auto"`` picks magsplit on TPU when the pair's band
    geometry allows, else matmul.
    """
    n_in = config.fft_size_input
    n_out = config.fft_size_output
    backend = _resolve_backend(config, backend)

    if backend == "magsplit":
        C = config.channels
        chunk_op = _make_magsplit_step(config)

        def step(state: FftState, chunk):
            chunk = chunk.astype(jnp.float32)
            return {"prev": chunk}, chunk_op(state["prev"], chunk)

        return step

    if backend == "conv":
        g = math.gcd(n_in, n_out)
        lp, mp = n_in // g, n_out // g
        w = jnp.asarray(input_domain_conv_operator(n_in, n_out))
        C = config.channels

        def step(state: FftState, chunk):
            chunk = chunk.astype(jnp.float32)
            x2 = jnp.concatenate([state["prev"], chunk], axis=1)  # [C, 2N]
            blocks = x2.reshape(C, 2 * g, lp)
            out = jax.lax.conv_general_dilated(
                blocks,
                w,
                window_strides=(1,),
                padding="VALID",
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGH,  # see matmul note below
            )  # [C, g, mp]
            return {"prev": chunk}, out.reshape(C, n_out)

        return step

    if backend == "matmul":
        proj = jnp.asarray(get_projection_matrix(n_in, n_out))

        def chunk_op(x):  # [C, N] -> [C, 2M]
            # Precision.HIGH (bf16x3 MXU passes) puts the arithmetic noise
            # floor at ~-106 dB (measured on v5e), comfortably below the
            # Kaiser beta=10 filter's -100 dB design stopband, at ~1.45x
            # the speed of HIGHEST (bf16x6, ~-149 dB floor).  The TPU
            # DEFAULT (single bf16 pass) floors at ~-61 dB — never use it.
            return jnp.dot(
                x,
                proj,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGH,
            )

    elif backend == "rfft":
        # Device-runnable runtime-FFT backend for sizes where a dense
        # projector would be too large: the real-valued mixed-radix FFT
        # (dsp/rfft.py, no complex dtypes — runs on TPU runtimes that
        # reject complex64).  Mirrors the reference chunk dataflow
        # (reference: src/resampler_fft.rs:385-424) with unnormalized
        # FFTs and the normalization folded into the filter.
        from ..dsp.rfft import irfft_pair, rfft_pair

        filt_np = fft_filter_spectrum(n_in, n_out)
        new_length = n_in + 1 if n_in < n_out else n_out
        fr = jnp.asarray(filt_np[:new_length].real, jnp.float32)
        fi = jnp.asarray(filt_np[:new_length].imag, jnp.float32)
        pad = n_out + 1 - new_length

        def chunk_op(x):  # [C, N] -> [C, 2M]
            xp = jnp.pad(x, ((0, 0), (0, n_in)))
            re, im = rfft_pair(xp, 2 * n_in)
            re, im = re[:, :new_length], im[:, :new_length]
            sre = re * fr - im * fi
            sim = re * fi + im * fr
            sre = jnp.pad(sre, ((0, 0), (0, pad)))
            sim = jnp.pad(sim, ((0, 0), (0, pad)))
            return irfft_pair(sre, sim, 2 * n_out)

    elif backend == "fft":
        # Cross-checking backend mirroring the reference dataflow.  Note:
        # complex dtypes may be unsupported on some TPU runtimes — the
        # "matmul" backend is the production TPU path; keep the filter as a
        # host-side numpy constant so tracing never round-trips a complex
        # array through the device.
        filt_np = fft_filter_spectrum(n_in, n_out)
        new_length = n_in + 1 if n_in < n_out else n_out
        filt = np.asarray(filt_np[:new_length], np.complex64)

        def chunk_op(x):  # [C, N] -> [C, 2M]
            spec = jnp.fft.rfft(x, n=2 * n_in, axis=1)
            spec = spec[:, :new_length] * filt
            pad = n_out + 1 - new_length
            spec = jnp.pad(spec, ((0, 0), (0, pad)))
            return jnp.fft.irfft(spec, n=2 * n_out, axis=1) * (2 * n_out)

    else:
        raise ValueError(f"unknown FFT backend {backend!r}")

    def step(state: FftState, chunk):
        full = chunk_op(chunk.astype(jnp.float32))
        out = full[:, :n_out] + state["overlap"]
        return {"overlap": full[:, n_out:]}, out

    return step


def make_fft_fleet_step(
    config: FftConfig, n_streams: int, *, backend: str = "auto", mesh=None
):
    """Fleet-wide FFT step: ``streams x channels`` folded into the row
    dimension of ONE device op.

    A vmap of the per-stream step would batch ``n_streams`` tiny
    per-stream ops; folding the fleet into the rows keeps the MXU at full
    tile occupancy.  ``step(state, chunks [B, C, N]) ->
    (state, out [B, C, M])``; state is ``{"overlap": [B, C, M]}`` for the
    matmul backend, ``{"prev": [B, C, N]}`` for the conv backend (fewer
    FLOPs but a slower lowering on v5e — see
    ``input_domain_conv_operator``).
    """
    n_in = config.fft_size_input
    n_out = config.fft_size_output
    C = config.channels
    B = n_streams
    backend = _resolve_backend(config, backend)

    if backend == "magsplit":
        chunk_op = _make_magsplit_step(config)

        if mesh is not None:
            # Streams are embarrassingly parallel, so the Pallas kernel
            # runs per-shard under shard_map (GSPMD has no partitioning
            # rule for it; shard_map needs none).
            from jax.sharding import PartitionSpec as P

            shard_map = jax.shard_map

            from ..parallel.sharding import STREAM_AXIS

            spec = P(STREAM_AXIS)

            def shard_op(prev, cur):  # [b_loc, C, N] x2 -> [b_loc, C, M]
                b_loc = prev.shape[0]
                return chunk_op(
                    prev.reshape(b_loc * C, n_in),
                    cur.reshape(b_loc * C, n_in),
                ).reshape(b_loc, C, n_out)

            sharded_op = shard_map(
                shard_op, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
                check_vma=False,  # pallas_call out_shape carries no vma
            )

            def step(state: FftState, chunks):
                chunks = chunks.astype(jnp.float32)
                return {"prev": chunks}, sharded_op(state["prev"], chunks)

            return step

        def step(state: FftState, chunks):
            chunks = chunks.astype(jnp.float32)
            out = chunk_op(
                state["prev"].reshape(B * C, n_in),
                chunks.reshape(B * C, n_in),
            )
            return {"prev": chunks}, out.reshape(B, C, n_out)

        return step

    if backend == "conv":
        g = math.gcd(n_in, n_out)
        lp = n_in // g
        w = jnp.asarray(input_domain_conv_operator(n_in, n_out))

        def step(state: FftState, chunks):
            chunks = chunks.astype(jnp.float32)
            x2 = jnp.concatenate(
                [state["prev"], chunks], axis=2
            ).reshape(B * C, 2 * g, lp)
            out = jax.lax.conv_general_dilated(
                x2,
                w,
                window_strides=(1,),
                padding="VALID",
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGH,
            )  # [B*C, g, mp]
            return {"prev": chunks}, out.reshape(B, C, n_out)

        return step

    proj = jnp.asarray(get_projection_matrix(n_in, n_out))

    def step(state: FftState, chunks):
        x = chunks.astype(jnp.float32).reshape(B * C, n_in)
        full = jnp.dot(
            x,
            proj,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGH,  # see chunk_op note above
        ).reshape(B, C, 2 * n_out)
        out = full[:, :, :n_out] + state["overlap"]
        return {"overlap": full[:, :, n_out:]}, out

    return step


def fft_fleet_init(
    config: FftConfig, n_streams: int, backend: str = "auto"
) -> FftState:
    if _resolve_backend(config, backend) in ("conv", "magsplit"):
        return {
            "prev": jnp.zeros(
                (n_streams, config.channels, config.fft_size_input),
                jnp.float32,
            )
        }
    return {
        "overlap": jnp.zeros(
            (n_streams, config.channels, config.fft_size_output), jnp.float32
        )
    }


# --------------------------------------------------------------------------
# Stateful wrapper — reference-parity public API
# --------------------------------------------------------------------------


class ResamplerFft:
    """FFT overlap-add resampler with a fixed chunk-size API
    (reference: src/resampler_fft.rs:43-240).

    Interleaved f32 buffers; exactly one chunk per ``resample()`` call::

        r = ResamplerFft(2, SampleRate.Hz44100, SampleRate.Hz48000)
        input = np.zeros(r.chunk_size_input(), np.float32)
        output = np.zeros(r.chunk_size_output(), np.float32)
        r.resample(input, output)
    """

    def __init__(
        self,
        channels: int,
        sample_rate_input: SampleRate,
        sample_rate_output: SampleRate,
        *,
        backend: str = "auto",
    ) -> None:
        sample_rate_input = SampleRate(sample_rate_input)
        sample_rate_output = SampleRate(sample_rate_output)
        cfg = plan_conversion(
            sample_rate_input, sample_rate_output
        ).scale_for_throughput()
        self._config = FftConfig(
            channels=channels,
            fft_size_input=cfg.fft_size_input,
            fft_size_output=cfg.fft_size_output,
        )
        self._input_rate = sample_rate_input
        self._output_rate = sample_rate_output
        self._backend = backend
        self._step_fn = make_fft_step(self._config, backend=backend)
        self._step = jax.jit(self._step_fn, donate_argnums=0)
        self._state = fft_init(self._config, backend)
        self._many = None  # scanned fast path for process(), built lazily

    @property
    def channels(self) -> int:
        return self._config.channels

    @property
    def fft_size_input(self) -> int:
        return self._config.fft_size_input

    @property
    def fft_size_output(self) -> int:
        return self._config.fft_size_output

    def chunk_size_input(self) -> int:
        """Required input size in total f32 values, all channels
        (reference: src/resampler_fft.rs:131-137)."""
        return self._config.fft_size_input * self._config.channels

    def chunk_size_output(self) -> int:
        """Produced output size in total f32 values, all channels
        (reference: src/resampler_fft.rs:139-145)."""
        return self._config.fft_size_output * self._config.channels

    def delay(self) -> int:
        return self._config.delay

    def reset(self) -> None:
        self._state = fft_init(self._config, self._backend)

    @property
    def state(self) -> FftState:
        return self._state

    @state.setter
    def state(self, value: FftState) -> None:
        # Accept carries checkpointed under a different backend
        # resolution (e.g. saved on TPU with the magsplit {"prev"}
        # schema, restored where matmul's {"overlap"} is production).
        self._state = convert_fft_state(value, self._config, self._backend)

    def resample(self, input, output) -> None:
        """Resample exactly one interleaved chunk
        (reference: src/resampler_fft.rs:155-240)."""
        C = self._config.channels
        input = np.asarray(input, dtype=np.float32)
        if input.ndim != 1 or input.size < self.chunk_size_input():
            raise InvalidInputBufferSize(
                f"input must hold at least {self.chunk_size_input()} values"
            )
        if (
            not isinstance(output, np.ndarray)
            or output.ndim != 1
            or output.size < self.chunk_size_output()
        ):
            raise InvalidOutputBufferSize(
                f"output must hold at least {self.chunk_size_output()} values"
            )

        n_in = self._config.fft_size_input
        chunk = input[: n_in * C].reshape(n_in, C).T  # deinterleave
        self._state, out = self._step(self._state, chunk)
        output[: self.chunk_size_output()] = np.asarray(out.T).reshape(-1)

    #: Chunks per scanned dispatch in the ``process`` fast path.
    _MANY_T = 32

    def process(self, input) -> np.ndarray:
        """Batch helper: pad to whole chunks, resample, truncate to the
        expected length (mirrors the reference CLI batch loop,
        reference: resample/src/main.rs:256-313).

        File-length inputs run as SCANNED multi-chunk device programs —
        one dispatch per ``_MANY_T`` chunks for the bulk, the per-chunk
        loop for the tail — instead of one host dispatch per 512-4096
        frames (the CLI tier's wall-clock bound, VERDICT r4 weak #5).
        State advances identically to the loop (tested bit-exact)."""
        input = np.asarray(input, dtype=np.float32)
        ci, co = self.chunk_size_input(), self.chunk_size_output()
        n_chunks = -(-input.size // ci) if input.size else 0
        out = np.zeros(n_chunks * co, np.float32)
        C = self._config.channels
        n_in = self._config.fft_size_input
        T = self._MANY_T
        k = 0
        if n_chunks >= 2 * T:
            if self._many is None:
                step = self._step_fn

                def many(state, chunks):
                    def body(st, ch):
                        st, o = step(st, ch)
                        return st, o

                    return jax.lax.scan(body, state, chunks)

                self._many = jax.jit(many, donate_argnums=0)
            while n_chunks - k >= T:
                # T full chunks by construction; deinterleave to [T, C, n]
                block = np.transpose(
                    input[k * ci : (k + T) * ci].reshape(T, n_in, C),
                    (0, 2, 1),
                )
                self._state, outs = self._many(
                    self._state, jnp.asarray(block)
                )
                out[k * co : (k + T) * co] = (
                    np.transpose(np.asarray(outs), (0, 2, 1)).reshape(-1)
                )
                k += T
        buf_in = np.zeros(ci, np.float32)
        for kk in range(k, n_chunks):
            piece = input[kk * ci : (kk + 1) * ci]
            buf_in[: piece.size] = piece
            buf_in[piece.size :] = 0.0
            self.resample(buf_in, out[kk * co : (kk + 1) * co])
        expected = -(-input.size * co // ci)
        return out[:expected]

    def __repr__(self) -> str:
        return (
            f"ResamplerFft(channels={self.channels}, "
            f"{int(self._input_rate)}->{int(self._output_rate)} Hz, "
            f"N={self.fft_size_input}, M={self.fft_size_output})"
        )
