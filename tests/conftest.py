"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The driver benches on real TPU; tests must pass without one. Multi-chip
sharding logic is exercised against 8 virtual CPU devices, per the
reference's single-process test strategy (SURVEY.md §4) extended with
pod-slice simulation.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
