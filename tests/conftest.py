"""Test environment: force CPU JAX with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4 implication).

The container pins JAX_PLATFORMS=axon (TPU tunnel) via sitecustomize; tests
must run locally on CPU, so the platform is overridden through jax.config
(the env var alone is ignored once the axon plugin has registered).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import hashlib  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _host_cpu_tag() -> str:
    """Key the persistent compile cache by host CPU identity.

    XLA:CPU AOT executables embed ISA/tuning-specific code; loading one
    compiled on a different CPU triggers cpu_aot_loader warnings ("could
    lead to execution errors such as SIGILL") and was observed when this
    cache dir traveled across machines (VERDICT r2).  The model name +
    feature flags from /proc/cpuinfo uniquely identify the compile target.
    """
    try:
        with open("/proc/cpuinfo") as f:
            lines = f.read().splitlines()
        keep = [l for l in lines if l.startswith(("model name", "flags"))]
        raw = "|".join(keep[:2]) if keep else "|".join(lines[:20])
    except OSError:
        import platform

        raw = platform.processor() or platform.machine() or "unknown"
    return hashlib.sha1(raw.encode()).hexdigest()[:12]


# Persistent compile cache: the full suite is compile-bound on this 1-core
# host (CPU resnet grads take minutes each); warm runs cut ~10x.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_TEST_CACHE_DIR", "/root/.cache/emotpu-test-jaxcache")
    + "-"
    + _host_cpu_tag(),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
    yield
