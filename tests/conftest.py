"""Test environment: force CPU with 8 virtual devices so sharding tests run
without a pod, and enable x64 so parity tests can match the double-precision
reference engine."""

import os

# Force CPU: the ambient environment presets JAX_PLATFORMS=axon (the real
# TPU tunnel), whose remote compiles take minutes; unit tests must run on
# the virtual-device CPU backend. jax may already be imported by a pytest
# plugin, so the env var alone is not enough — also update jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the physics step graph is large and this box is
# small; caching makes repeat test runs fast. The cache dir is keyed on a
# host CPU fingerprint: XLA:CPU AOT executables are NOT machine-portable
# (jax's cache key ignores host features), and loading one compiled on a
# different machine type SEGFAULTS mid-suite ("+prefer-no-scatter is not
# supported on the host machine ... SIGILL" — hit in r4 when the sandbox
# moved hosts between rounds).
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _flags = next((ln for ln in _f if ln.startswith("flags")), "")
    _host = hashlib.md5(_flags.encode()).hexdigest()[:8]
except OSError:
    _host = "generic"
jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{_host}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop live compiled executables after each test module: a full-suite
    process otherwise accumulates hundreds of XLA:CPU executables, and
    around the ~110-test mark interpret-mode pallas under shard_map starts
    failing and eventually SEGFAULTS inside the XLA CPU runtime (seen twice
    in r4, different tests each time, never reproducible in isolation).
    The persistent disk cache keeps re-compiles cheap."""
    yield
    import jax as _jax

    _jax.clear_caches()
    try:
        from evosoro_tpu.evo import evaluation as _ev

        _ev._compiled_cache.clear()
    except Exception:
        pass
    try:
        from evosoro_tpu.control import shooting as _sh

        _sh._fused_cem_solver_cache.clear()
    except Exception:
        pass
