"""Block-parallel LZTB container tests."""

import numpy as np
import pytest

from lzma_tpu.core.rangecoder import CorruptStreamError
from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.parallel.blocks import (
    decode_blocks,
    encode_blocks,
    parse_container,
    split_blocks,
)


def _data(n=100_000):
    rng = np.random.default_rng(11)
    out = bytearray()
    words = [rng.integers(0, 256, int(rng.integers(3, 30)), dtype=np.uint8).tobytes() for _ in range(50)]
    while len(out) < n:
        out.extend(words[int(rng.integers(0, 50))])
    return bytes(out[:n])


@pytest.mark.parametrize("block_size", [1 << 14, 1 << 16, 1 << 20])
def test_roundtrip_block_sizes(block_size):
    data = _data()
    p = LzmaParams(dict_size=1 << 16, fast_bytes=32)
    blob = encode_blocks(data, p, block_size=block_size)
    assert decode_blocks(blob) == data


def test_threaded_matches_serial():
    data = _data(200_000)
    p = LzmaParams(dict_size=1 << 14, fast_bytes=16)
    serial = encode_blocks(data, p, block_size=1 << 15, num_threads=1)
    threaded = encode_blocks(data, p, block_size=1 << 15, num_threads=4)
    assert serial == threaded  # determinism regardless of parallelism
    assert decode_blocks(threaded, num_threads=4) == data


def test_uneven_tail_block():
    data = _data(70_001)
    blob = encode_blocks(data, LzmaParams(dict_size=1 << 14, fast_bytes=16), block_size=1 << 16)
    frame = parse_container(blob)
    assert len(frame.comp_sizes) == 2
    assert decode_blocks(blob) == data


def test_single_and_empty():
    p = LzmaParams(dict_size=1 << 12, fast_bytes=8)
    assert decode_blocks(encode_blocks(b"", p)) == b""
    assert decode_blocks(encode_blocks(b"z", p)) == b"z"


def test_truncation_detected():
    data = _data(50_000)
    blob = encode_blocks(data, LzmaParams(dict_size=1 << 14, fast_bytes=16), block_size=1 << 14)
    with pytest.raises(CorruptStreamError):
        decode_blocks(blob[: len(blob) - 40])
    with pytest.raises(CorruptStreamError):
        decode_blocks(b"XXXX" + blob[4:])


def test_split_blocks():
    assert split_blocks(b"abcdef", 4) == [b"abcd", b"ef"]
    assert split_blocks(b"", 4) == []


def test_eos_rejected():
    with pytest.raises(ValueError):
        encode_blocks(b"abc", LzmaParams(write_eos=True))


def test_top_level_decompress_autodetects_lztb():
    import lzma_tpu
    from lzma_tpu.runtime import native

    data = (b"lztb autodetect " * 1000)[:12000]
    p = LzmaParams(dict_size=1 << 14, fast_bytes=16)
    blob = native.encode_blocks(data, p, block_size=1 << 12)
    assert lzma_tpu.decompress(blob) == data
    # scalar fallback route
    probe = lzma_tpu._NATIVE_PROBE[:]
    lzma_tpu._NATIVE_PROBE[:] = [None, True]
    try:
        assert lzma_tpu.decompress(blob) == data
    finally:
        lzma_tpu._NATIVE_PROBE[:] = probe


def test_highly_compressible_round_trip():
    """The anti-DoS expansion bound must clear LZMA's REAL worst case:
    all-zero input compresses ~4700x, and the old 4096x bound rejected
    the encoder's own output (review regression)."""
    data = b"\x00" * (4 << 20)
    p = LzmaParams(dict_size=1 << 20, fast_bytes=32)
    try:
        from lzma_tpu.runtime import native

        enc, dec = native.encode_blocks, native.decode_blocks
        assert native.available()
    except Exception:
        enc, dec = encode_blocks, decode_blocks
    c = enc(data, p, block_size=1 << 20)
    assert len(data) / len(c) > 4096  # the case that used to be rejected
    assert dec(c) == data
    assert parse_container(c).total_size == len(data)


def test_compress_device_backend():
    """Top-level backend="device": the all-device lane pipeline with the
    optimal-parse DP, LZTB container interchangeable with every decoder."""
    import lzma_tpu as lt
    from lzma_tpu.format.properties import LzmaParams

    data = (b"device backend parse optimal " * 300)[:6000]
    p = LzmaParams(dict_size=1 << 12, fast_bytes=16)
    blob = lt.compress(data, p, container="lztb", block_size=1 << 12,
                       backend="device")
    assert lt.decompress(blob) == data
    import pytest

    with pytest.raises(ValueError):
        lt.compress(data, p, backend="device")  # alone container
