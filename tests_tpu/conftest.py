"""Real-TPU smoke tier (VERDICT r1 #7 / reference CI ISA matrix analog,
reference: .github/workflows/rust.yml:14-171).

Unlike tests/ (which forces an 8-device virtual CPU mesh), this tier runs
on the actual accelerator so the device numerics — bf16-default MXU
matmuls guarded by explicit ``precision=``, Pallas lowering, remote
runtime quirks — are covered by tests rather than only by bench.py's
attestation probes.

Run:  python -m pytest tests_tpu -q
(on the axon host this uses the tunneled v5e chip; first compile of each
jitted shape takes ~40 s, so this tier keeps shapes few and small).

Skips (not fails) when no accelerator is present, so `pytest` from a
CPU-only box stays green.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

import jax  # noqa: E402


def pytest_collection_modifyitems(config, items):
    backend = jax.default_backend()
    if backend in ("cpu",):
        skip = pytest.mark.skip(
            reason=f"TPU smoke tier needs an accelerator (backend={backend})"
        )
        for item in items:
            item.add_marker(skip)
