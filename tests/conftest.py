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
