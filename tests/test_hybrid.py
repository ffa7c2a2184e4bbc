"""Hybrid pipeline (device search + native serialize) correctness."""

import lzma

import numpy as np
import pytest

from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.parallel.blocks import decode_blocks
from lzma_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def _data(n=100_000, seed=9):
    rng = np.random.default_rng(seed)
    words = [rng.integers(0, 256, int(rng.integers(3, 40)), dtype=np.uint8).tobytes() for _ in range(64)]
    out = bytearray()
    while len(out) < n:
        out.extend(words[int(rng.integers(0, 64))])
    return bytes(out[:n])


def test_hybrid_roundtrip_everywhere():
    from lzma_tpu.ops.hybrid import encode_blocks_hybrid

    data = _data()
    p = LzmaParams(dict_size=1 << 14, fast_bytes=32)
    blob = encode_blocks_hybrid(data, p, block_size=1 << 14, num_threads=2)
    assert native.decode_blocks(blob) == data
    assert decode_blocks(blob) == data


def test_hybrid_matches_all_device_encoder():
    """Same tokens -> the host serializer must be bit-identical to the
    all-device serializer."""
    from lzma_tpu.ops.hybrid import encode_blocks_hybrid
    from lzma_tpu.ops.api import encode_blocks as device_encode

    data = _data(60_000, seed=10)
    p = LzmaParams(dict_size=1 << 13, fast_bytes=32)
    assert encode_blocks_hybrid(data, p, block_size=1 << 13) == device_encode(
        data, p, block_size=1 << 13
    )


def test_hybrid_liblzma_decodes_streams():
    from lzma_tpu.ops.hybrid import encode_blocks_hybrid
    from lzma_tpu.parallel.blocks import parse_container

    data = _data(40_000, seed=11)
    p = LzmaParams(lc=3, lp=0, pb=2, dict_size=1 << 14, fast_bytes=32)
    blob = encode_blocks_hybrid(data, p, block_size=1 << 14)
    frame = parse_container(blob)
    off = frame.payload_offset
    pos = 0
    for i, csize in enumerate(frame.comp_sizes):
        stream = bytes(blob[off : off + csize])
        out_size = min(frame.block_size, frame.total_size - pos)
        alone = frame.params.encode_props() + out_size.to_bytes(8, "little") + stream
        assert lzma.decompress(alone, format=lzma.FORMAT_ALONE) == data[pos : pos + out_size]
        off += csize
        pos += out_size


def test_hybrid_empty_and_single():
    from lzma_tpu.ops.hybrid import encode_blocks_hybrid

    p = LzmaParams(dict_size=1 << 12, fast_bytes=16)
    assert native.decode_blocks(encode_blocks_hybrid(b"", p)) == b""
    blob = encode_blocks_hybrid(b"q", p, block_size=1 << 12)
    assert native.decode_blocks(blob) == b"q"
