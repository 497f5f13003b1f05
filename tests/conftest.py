"""Test harness: force a virtual 8-device CPU platform.

Tests must run without TPU hardware and must exercise multi-chip sharding;
an 8-way host-platform device count provides a real ``jax.sharding.Mesh``
for the sharded code paths.
"""

import os

# The session environment pins JAX to the TPU tunnel and its sitecustomize
# initializes the backend at interpreter start, so env vars alone are
# ignored; force the platform through the config API instead. XLA_FLAGS must
# still be in the environment before the CPU backend is first created.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# CLI tests call cli.main(), whose enable_compilation_cache() would point
# THIS process's persistent XLA cache at the shared user-level directory —
# which concurrent suite/bench processes also write. A torn or
# stale-jaxlib entry segfaults the deserializer (observed: SIGSEGV in
# compilation_cache.get_executable_and_time during an unrelated later
# test). Isolate the whole session in a throwaway cache.
import atexit  # noqa: E402
import shutil  # noqa: E402
import tempfile  # noqa: E402

if "BASICRTA_TPU_CACHE" not in os.environ:
    _cache_dir = tempfile.mkdtemp(prefix="basicrta_test_jax_cache_")
    os.environ["BASICRTA_TPU_CACHE"] = _cache_dir
    atexit.register(shutil.rmtree, _cache_dir, ignore_errors=True)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_code():
    """Free compiled executables between test modules.

    A full single-process suite run accumulates every module's jitted
    programs (the interpret-mode Pallas segment graphs are large) and
    reproducibly SEGFAULTS inside XLA:CPU's compiler near the end of the
    run — the same files pass in any half-suite combination. Dropping
    references lets the loaded code be reclaimed and keeps the process
    under whatever code-memory threshold the crash sits at, at the cost
    of cross-module recompiles."""
    yield
    import gc
    jax.clear_caches()
    gc.collect()


@pytest.fixture
def rng(request):
    """Per-test deterministic RNG, independent of suite ordering.

    A session-scoped generator makes each test's draws depend on which
    tests ran before it — statistical assertions then flake only in
    specific suite compositions. Seeding from the test id keeps every
    test's stream fixed forever.
    """
    import zlib
    return np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))


@pytest.fixture(scope="session")
def synthetic_times():
    """Discretized hyperexponential dataset with known parameters."""
    from basicrta_tpu.ops.surv import simulate_hyperexp, discretize_times
    weights = np.array([0.85, 0.13, 0.02])
    rates = np.array([4.0, 0.2, 0.01])
    x = simulate_hyperexp(20000, weights, rates,
                          np.random.default_rng(12345))
    return discretize_times(x, 0.1), weights, rates
