"""Mesh-sharded block-parallel codec on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.parallel.mesh import decode_blocks_mesh, encode_blocks_mesh, make_mesh
from lzma_tpu.parallel import blocks as blk


def _data(n=24_000, seed=3):
    rng = np.random.default_rng(seed)
    words = [rng.integers(0, 256, int(rng.integers(4, 24)), dtype=np.uint8).tobytes() for _ in range(40)]
    out = bytearray()
    while len(out) < n:
        out.extend(words[int(rng.integers(0, 40))])
    return bytes(out[:n])


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(jax.devices()[:8])


def test_mesh_roundtrip(mesh):
    data = _data()
    p = LzmaParams(dict_size=1 << 12, fast_bytes=16)
    blob = encode_blocks_mesh(data, p, block_size=1 << 11, mesh=mesh)
    assert decode_blocks_mesh(blob, mesh=mesh) == data


def test_mesh_container_is_standard(mesh):
    """Mesh-encoded containers decode on the scalar block path and vice versa."""
    data = _data(10_000, seed=4)
    p = LzmaParams(dict_size=1 << 12, fast_bytes=16)
    blob = encode_blocks_mesh(data, p, block_size=1 << 11, mesh=mesh)
    assert blk.decode_blocks(blob) == data          # scalar decodes mesh output
    blob2 = blk.encode_blocks(data, p, block_size=1 << 11)
    assert decode_blocks_mesh(blob2, mesh=mesh) == data  # mesh decodes scalar output


def test_mesh_uneven_blocks(mesh):
    """Block count not divisible by device count (padding lanes)."""
    data = _data(13_077, seed=5)
    p = LzmaParams(dict_size=1 << 11, fast_bytes=16)
    blob = encode_blocks_mesh(data, p, block_size=1 << 11, mesh=mesh)  # 7 blocks on 8 devs
    assert decode_blocks_mesh(blob, mesh=mesh) == data


def test_mesh_subset_device_counts():
    for nd in (1, 2, 4):
        mesh = make_mesh(jax.devices()[:nd])
        data = _data(6_000, seed=nd)
        p = LzmaParams(dict_size=1 << 11, fast_bytes=16)
        blob = encode_blocks_mesh(data, p, block_size=1 << 11, mesh=mesh)
        assert decode_blocks_mesh(blob, mesh=mesh) == data


def test_mesh_decode_pallas_ring(mesh):
    """The ring-window Pallas kernel runs per shard under shard_map
    (interpret mode on the CPU mesh), same container, same bytes."""
    data = _data(9_000, seed=9)
    p = LzmaParams(dict_size=1 << 11, fast_bytes=16)
    blob = encode_blocks_mesh(data, p, block_size=1 << 11, mesh=mesh)
    assert decode_blocks_mesh(blob, mesh=mesh, use_pallas=True) == data


def test_mesh_decode_pallas_ring_dictionary(mesh):
    """LZTB v3 stored dictionary broadcast + per-shard Pallas decode."""
    data = _data(9_000, seed=10)
    p = LzmaParams(dict_size=1 << 11, fast_bytes=16)
    blob = encode_blocks_mesh(data, p, block_size=1 << 11, mesh=mesh,
                              dictionary=data[:512])
    assert decode_blocks_mesh(blob, mesh=mesh, use_pallas=True) == data


def test_mesh_encode_pallas_serializer(mesh):
    """Each shard's range coding runs the in-VMEM Pallas serializer
    (interpret mode on the CPU mesh); container identical contract."""
    data = _data(9_000, seed=11)
    p = LzmaParams(dict_size=1 << 12, fast_bytes=16)
    blob = encode_blocks_mesh(data, p, block_size=1 << 11, mesh=mesh,
                              use_pallas=True)
    assert blk.decode_blocks(blob) == data
    # bit-identical with the XLA serializer step (same tokens, same coder)
    blob_xla = encode_blocks_mesh(data, p, block_size=1 << 11, mesh=mesh)
    assert blob == blob_xla


def test_mesh_encode_pallas_dictionary(mesh):
    data = _data(9_000, seed=12)
    p = LzmaParams(dict_size=1 << 12, fast_bytes=16)
    blob = encode_blocks_mesh(data, p, block_size=1 << 11, mesh=mesh,
                              dictionary=data[:512], use_pallas=True)
    assert decode_blocks_mesh(blob, mesh=mesh) == data
