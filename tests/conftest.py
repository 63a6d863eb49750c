"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run anywhere (CI, dev boxes) and must exercise the multi-chip
sharding path, so they run on the CPU backend with 8 virtual devices.
Benchmarks (bench.py) run on real TPU hardware instead.

Some environments (e.g. a remote-TPU tunnel) import JAX at interpreter
startup via sitecustomize with ``JAX_PLATFORMS`` pointing at a remote
backend, which would turn every test-time compile/dispatch into a slow
network round-trip.  Overriding via ``jax.config`` works even after that
import, as long as no backend has been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests require the CPU backend; a TPU backend was already initialized "
    "before conftest ran"
)
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"
