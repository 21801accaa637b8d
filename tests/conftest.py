"""Test harness: force a virtual 8-device CPU platform.

Must run before the first ``import jax`` anywhere in the test session so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4
test plan, item 3).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
