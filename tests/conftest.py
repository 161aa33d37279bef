"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The driver benches on real TPU; tests must pass without one.  Multi-chip
sharding logic is exercised against 8 virtual CPU devices (SURVEY.md §4).

The environment this repo runs in preloads a TPU PJRT plugin through
``sitecustomize`` (PYTHONPATH=/root/.axon_site), which imports jax into
every process and sets JAX_PLATFORMS=axon.  Backends are not initialized
at that point, so the fix is to force the platform to "cpu" via
``jax.config`` before any test touches a device (a plain
JAX_PLATFORMS=cpu env var is too late once the env var has been read at
import, and re-exec'ing pytest breaks its fd-level output capture).
"""

import os

# Must be set before the first backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
