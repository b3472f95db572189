"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is
validated on 8 virtual CPU devices, exactly like the driver's multichip
dry-run.

Note: this environment's sitecustomize registers the tunneled 'axon'
TPU backend at interpreter startup and forces jax_platforms="axon,cpu",
which overrides the JAX_PLATFORMS env var — so we must update
jax.config *after* import (clearing any initialized backends first).
"""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
from jax.extend.backend import clear_backends  # noqa: E402

clear_backends()
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"


# XLA's CPU compiler segfaulted (reproduced three times, always late in
# the full suite, always inside backend_compile_and_load, at whichever
# LARGE program compiled next) once ~500 executables had accumulated in
# the session; the same tests pass standalone and in tail chunks, and
# the box has >100 GB free. Bounding the number of LIVE executables by
# clearing jax's caches every N tests avoids the trigger; the handful
# of re-compilations this forces costs far less than a crashed suite.
_TESTS_BETWEEN_CACHE_CLEARS = 150
_test_counter = {"n": 0}


def pytest_runtest_setup(item):
    _test_counter["n"] += 1
    if _test_counter["n"] % _TESTS_BETWEEN_CACHE_CLEARS == 0:
        jax.clear_caches()
