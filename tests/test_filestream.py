"""Constant-memory file streaming over the LZTB container.

The streamed container must be byte-identical to the in-memory
block-parallel encode, and decode must round-trip through batches that
are smaller than the file (so the batching seams are actually exercised).
"""

import os
import struct

import pytest

import lzma_tpu
from lzma_tpu.core.rangecoder import CorruptStreamError
from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.parallel import blocks as blk
from lzma_tpu.parallel import filestream

from conftest import fixture_bytes


def _mixed_data(n=300_000, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    word = rng.integers(0, 256, 61, dtype=np.uint8).tobytes()
    rep = (word * (n // len(word) + 1))[: n // 2]
    rnd = rng.integers(0, 256, n - len(rep), dtype=np.uint8).tobytes()
    return rep + rnd


@pytest.fixture()
def workdir(tmp_path):
    return tmp_path


def test_streamed_encode_matches_in_memory(workdir):
    data = _mixed_data()
    src = workdir / "in.bin"
    dst = workdir / "out.lztb"
    src.write_bytes(data)
    p = LzmaParams(dict_size=1 << 16, fast_bytes=16)
    # batch smaller than the file -> multiple batches, tail block partial
    n = filestream.encode_file(src, dst, p, block_size=1 << 15,
                               num_threads=2, batch_bytes=1 << 16)
    blob = dst.read_bytes()
    assert n == len(blob)

    try:
        from lzma_tpu.runtime import native

        expect = native.encode_blocks(data, p, block_size=1 << 15)
    except Exception:
        expect = blk.encode_blocks(data, p, block_size=1 << 15)
    assert blob == expect


def test_streamed_decode_round_trip(workdir):
    data = _mixed_data(217_001, seed=9)  # odd size: partial tail block
    src = workdir / "in.bin"
    mid = workdir / "c.lztb"
    out = workdir / "out.bin"
    src.write_bytes(data)
    p = LzmaParams(dict_size=1 << 16, fast_bytes=16)
    filestream.encode_file(src, mid, p, block_size=1 << 15, batch_bytes=1 << 17)
    n = filestream.decode_file(mid, out, batch_bytes=1 << 16)
    assert n == len(data)
    assert out.read_bytes() == data


def test_empty_file(workdir):
    src = workdir / "empty.bin"
    mid = workdir / "empty.lztb"
    out = workdir / "empty.out"
    src.write_bytes(b"")
    filestream.encode_file(src, mid, LzmaParams(dict_size=1 << 16))
    assert filestream.decode_file(mid, out) == 0
    assert out.read_bytes() == b""


def test_progress_callback(workdir):
    data = _mixed_data(150_000)
    src = workdir / "in.bin"
    dst = workdir / "c.lztb"
    src.write_bytes(data)
    seen = []
    filestream.encode_file(src, dst, LzmaParams(dict_size=1 << 15),
                           block_size=1 << 14, batch_bytes=1 << 15,
                           progress=lambda i, o: seen.append((i, o)))
    assert seen and seen[-1][0] == len(data)
    assert all(a <= b for (a, _), (b, _) in zip(seen, seen[1:]))


def test_top_level_file_api(workdir):
    data = fixture_bytes(120_000)
    src = workdir / "in.bin"
    mid = workdir / "c.lztb"
    out = workdir / "out.bin"
    src.write_bytes(data)
    lzma_tpu.compress_file(src, mid, block_size=1 << 15, dict_size=1 << 15)
    assert lzma_tpu.decompress_file(mid, out) == len(data)
    assert out.read_bytes() == data


def test_top_level_file_api_alone_container(workdir):
    data = fixture_bytes(60_000)
    src = workdir / "c.lzma"
    out = workdir / "out.bin"
    src.write_bytes(lzma_tpu.compress(data, dict_size=1 << 15))
    assert lzma_tpu.decompress_file(src, out) == len(data)
    assert out.read_bytes() == data


def test_corrupt_header_rejected(workdir):
    bad = workdir / "bad.lztb"
    out = workdir / "out.bin"
    bad.write_bytes(b"NOPE" + b"\x00" * 40)
    with pytest.raises(CorruptStreamError):
        filestream.decode_file(bad, out)


def test_truncated_payload_rejected(workdir):
    data = _mixed_data(100_000)
    src = workdir / "in.bin"
    mid = workdir / "c.lztb"
    out = workdir / "out.bin"
    src.write_bytes(data)
    filestream.encode_file(src, mid, LzmaParams(dict_size=1 << 15),
                           block_size=1 << 14)
    blob = mid.read_bytes()
    mid.write_bytes(blob[: len(blob) - 7])
    with pytest.raises(CorruptStreamError):
        filestream.decode_file(mid, out)


def test_inconsistent_block_count_rejected(workdir):
    data = _mixed_data(100_000)
    src = workdir / "in.bin"
    mid = workdir / "c.lztb"
    out = workdir / "out.bin"
    src.write_bytes(data)
    filestream.encode_file(src, mid, LzmaParams(dict_size=1 << 15),
                           block_size=1 << 14)
    blob = bytearray(mid.read_bytes())
    # bump num_blocks in the header
    magic, version, props, block_size, total_size, n = blk._HEAD.unpack_from(blob, 0)
    blk._HEAD.pack_into(blob, 0, magic, version, props, block_size, total_size, n + 1)
    mid.write_bytes(bytes(blob))
    with pytest.raises(CorruptStreamError):
        filestream.decode_file(mid, out)


def test_scalar_fallback_identical(workdir, monkeypatch):
    data = _mixed_data(80_000)
    src = workdir / "in.bin"
    a = workdir / "a.lztb"
    b = workdir / "b.lztb"
    src.write_bytes(data)
    p = LzmaParams(dict_size=1 << 15, fast_bytes=16)
    filestream.encode_file(src, a, p, block_size=1 << 14)

    # force the scalar path
    import lzma_tpu.runtime.native as native

    monkeypatch.setattr(native, "available", lambda: False)
    filestream.encode_file(src, b, p, block_size=1 << 14)
    assert a.read_bytes() == b.read_bytes()
    out = workdir / "out.bin"
    filestream.decode_file(b, out, batch_bytes=1 << 15)
    assert out.read_bytes() == data


def test_cli_streams_block_mode(workdir, capsys):
    from lzma_tpu.cli import main

    data = _mixed_data(120_000)
    src = workdir / "in.bin"
    mid = workdir / "c.lztb"
    out = workdir / "out.bin"
    src.write_bytes(data)
    assert main(["e", "-d15", "-fb16", "-bs16384", str(src), str(mid)]) == 0
    assert mid.read_bytes()[:4] == b"LZTB"
    assert "[stream]" in capsys.readouterr().out
    assert main(["d", str(mid), str(out)]) == 0
    assert out.read_bytes() == data
