"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The driver benches on real TPU; tests must pass without one.  Multi-chip
sharding logic is exercised against 8 virtual CPU devices (SURVEY.md §4).

The environment this repo runs in preloads a TPU PJRT plugin through
``sitecustomize`` (PYTHONPATH=/root/.axon_site) which deadlocks when
``JAX_PLATFORMS=cpu`` is requested after registration.  Since sitecustomize
has already executed by the time conftest is imported, the only reliable fix
is to re-exec pytest once with a scrubbed environment before anything
imports jax.
"""

import os
import sys

_SENTINEL = "COMPRESSION_TPU_TEST_REEXEC"


def _needs_scrub() -> bool:
    if os.environ.get(_SENTINEL):
        return False
    if "jax" in sys.modules:  # too late to scrub; hope for the best
        return False
    return (
        os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu")
        or "axon" in os.environ.get("PYTHONPATH", "")
    )


if _needs_scrub():
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ""
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
