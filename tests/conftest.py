"""Test env: force JAX onto a virtual 8-device CPU mesh.

Device tests validate multi-chip sharding without TPU hardware, per the
driver contract (the real-TPU path is exercised by bench.py and
__graft_entry__.entry on the driver side).  Must run before jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

REFERENCE_FIXTURE = "/root/reference/src/test/java/SevenZip/firefox.exe"


def fixture_bytes(limit=None):
    with open(REFERENCE_FIXTURE, "rb") as f:
        data = f.read() if limit is None else f.read(limit)
    return data


def has_reference():
    return os.path.exists(REFERENCE_FIXTURE)
