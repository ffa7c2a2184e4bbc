"""Multi-host wrapper: single-process semantics (pod runs need real hosts)."""

import jax

from lzma_tpu.parallel import multihost


def test_single_process_identity():
    assert multihost.is_coordinator()
    mesh = multihost.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("blocks",)


def test_pod_encode_decode_single_process():
    from lzma_tpu.format.properties import LzmaParams

    data = (b"multihost wrapper single process path " * 100)[:3000]
    p = LzmaParams(dict_size=1 << 11, fast_bytes=16)
    blob = multihost.encode_blocks_pod(data, p, block_size=1 << 10)
    assert blob is not None  # single process == coordinator
    assert multihost.decode_blocks_pod(blob) == data
