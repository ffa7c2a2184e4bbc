"""Test env: force JAX onto a virtual 8-device CPU mesh.

Device tests validate multi-chip sharding without TPU hardware (the
real-TPU path is exercised by bench.py and __graft_entry__ on the driver
side).  The image's sitecustomize (PYTHONPATH=/root/.axon_site) imports
jax and registers the axon TPU plugin before any test code runs, so
JAX_PLATFORMS set here would be too late — instead we flip the platform
through jax.config, which takes effect because no backend has been
initialized yet.  Must run before anything calls jax.devices().
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:  # jax-less environments still run the scalar/native tests
    pass

REFERENCE_FIXTURE = "/root/reference/src/test/java/SevenZip/firefox.exe"


def fixture_bytes(limit=None):
    with open(REFERENCE_FIXTURE, "rb") as f:
        data = f.read() if limit is None else f.read(limit)
    return data


def has_reference():
    return os.path.exists(REFERENCE_FIXTURE)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-executable references between test modules.

    The full suite accumulates ~350 XLA CPU executables in one process;
    past that, a later compile can SEGFAULT inside
    backend_compile_and_load (LLVM JIT code-memory exhaustion —
    reproduced twice at tests/test_pallas_serializer.py with the
    preceding modules loaded, never in any subset).  Per-module cache
    clearing keeps the live-executable population bounded; modules
    recompile what they reuse."""
    yield
    try:
        import jax

        jax.clear_caches()
    except Exception:
        pass
