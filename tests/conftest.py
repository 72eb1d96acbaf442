"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the standard way to exercise
shard_map/psum code without a pod) unless ICP_TPU_TEST_ON_TPU=1 is set.

Note: in this environment a TPU platform plugin force-registers itself and
the JAX_PLATFORMS env var alone is not honored, so we additionally pin the
platform through jax.config before any backend is initialized.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ON_TPU = os.environ.get("ICP_TPU_TEST_ON_TPU", "0") == "1"

if not ON_TPU:
    # No persistent compile cache for CPU test runs: XLA:CPU AOT results
    # are machine-feature-specific, and loading an entry produced under a
    # different host feature set SEGFAULTS in cache deserialization (the
    # loader itself warns "could lead to execution errors such as
    # SIGILL"; observed killing the suite at test_trajectory_refinement).
    # The cache exists for the slow remote TPU compiles — CPU test
    # compiles are cheap. Must be set before icp_variants_tpu imports.
    os.environ.setdefault("ICP_TPU_JAX_CACHE", "off")
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables between test modules.

    The full suite accumulates hundreds of XLA:CPU JIT executables in one
    process; past a threshold the NEXT backend_compile_and_load segfaults
    deterministically (observed at test_workloads::test_trajectory_
    refinement — the identical program compiles fine in isolation, so the
    crash is process-state, not the program). Dropping the in-memory
    executable caches per module keeps the live-code footprint bounded;
    within-module compile reuse is preserved.
    """
    yield
    jax.clear_caches()
