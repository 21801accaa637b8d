"""Test harness: force a virtual 8-device CPU platform.

The container pre-imports jax with the TPU backend registered (axon
sitecustomize), so setting ``JAX_PLATFORMS`` via the environment is too
late; instead switch platforms through ``jax.config`` before any backend
is initialized.  Unit + sharding tests then run on 8 virtual CPU devices
(SURVEY.md §4 test plan, item 3); the real-TPU path is exercised by
``bench.py`` and the driver's compile checks.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache for the test suite: the shard_map pipeline
# programs dominate suite wall-clock (~60 s/compile set); with the cache
# warm a full run is minutes faster.  Threshold is aggressive (0.5 s)
# because these are many medium-sized compiles, not a few huge ones.
# The directory is keyed by a host-CPU fingerprint: XLA:CPU executables
# AOT-target the compiling host's exact feature set, and loading one on
# a different machine SEGFAULTS (utils/hostid.py) -- this container
# image migrates between hosts across rounds.
from platanus3_tpu.utils.hostid import cpu_cache_tag

jax.config.update("jax_compilation_cache_dir",
                  f"/root/.cache/jax_p3_tests_{cpu_cache_tag()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402

_TEST_COUNT = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_jax_cache_clear():
    """Clear jax's in-process executable caches every ~30 tests.

    A single pytest process accumulates hundreds of compiled XLA:CPU
    executables over the full suite; past ~150 tests XLA:CPU segfaults
    inside compile (observed twice, different tests, always late in the
    run; every file passes in isolation).  Dropping live executables
    periodically keeps the process well under the crash region; the
    persistent on-disk cache (host-keyed, above) makes the recompiles
    cheap loads.
    """
    yield
    _TEST_COUNT["n"] += 1
    if _TEST_COUNT["n"] % 30 == 0:
        jax.clear_caches()
