"""Stream-state checkpointing.

The reference has no checkpoint story — its stream state is implicit
struct fields (SURVEY.md §5).  Here state is an explicit pytree of arrays,
so checkpoint/resume is a first-class capability: save any engine/fleet
state to a single ``.npz`` and restore it bit-exactly, including batched
fleet states (leading stream axis) and FFT overlap carries.
"""

from __future__ import annotations

import numpy as np

__all__ = ["save_state", "load_state"]


def save_state(path, state: dict) -> None:
    """Serialize a state pytree (flat dict of arrays) to ``.npz``."""
    arrays = {}
    for key, value in state.items():
        arrays[key] = np.asarray(value)
    np.savez(path, **arrays)


def load_state(path, *, to_device: bool = True) -> dict:
    """Load a state pytree saved by :func:`save_state`.

    With ``to_device`` (default) arrays come back as JAX device arrays
    ready to assign to ``resampler.state``; otherwise plain numpy.
    """
    with np.load(path) as data:
        state = {key: data[key] for key in data.files}
    if to_device:
        import jax.numpy as jnp

        state = {key: jnp.asarray(value) for key, value in state.items()}
    return state
