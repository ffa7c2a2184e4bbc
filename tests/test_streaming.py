"""O(window)-memory single-stream streaming codec (native runtime).

The reference's primary operating mode is InputStream->OutputStream with
O(dict) resident memory: a sliding input window with in-place compaction
and periodic position rebasing (InWindow.java:24-63, BinTree.java:358-375)
and a circular output window that flushes on wrap (OutWindow.java:41-67).
These tests pin our native equivalents (lzt_encode_stream /
lzt_decode_stream) byte-for-byte against the flat in-memory paths and
against stock liblzma, including the file-level `.lzma` codec.
"""

import io
import lzma
import os

import pytest

from lzma_tpu.core.rangecoder import CorruptStreamError
from lzma_tpu.format.properties import LzmaParams

native = pytest.importorskip("lzma_tpu.runtime.native")
if not native.available():
    pytest.skip("native runtime unavailable", allow_module_level=True)

from conftest import fixture_bytes  # noqa: E402


def _lz_data(n, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    out = bytearray(rng.integers(0, 256, 512, dtype=np.uint8).tobytes())
    while len(out) < n:
        if rng.integers(0, 3):
            start = int(rng.integers(0, len(out)))
            out.extend(out[start : start + int(rng.integers(2, 100))])
        else:
            out.append(int(rng.integers(0, 256)))
    return bytes(out[:n])


def _io_pair(data, chunk=37_777):
    src = io.BytesIO(data)
    sink = io.BytesIO()
    return (lambda cap: src.read(min(cap, chunk))), sink.write, sink


@pytest.mark.parametrize("mf,mode", [("bt4", "optimal"), ("bt2", "optimal"),
                                     ("hc4", "greedy"), ("fast4", "greedy"),
                                     ("bt4", "lazy")])
def test_stream_encode_matches_flat(mf, mode):
    data = _lz_data(600_000)
    p = LzmaParams(dict_size=1 << 16, fast_bytes=16, match_finder=mf)
    flat = native.encode_stream(data, p, mode=mode)
    read, write, sink = _io_pair(data)
    n = native.encode_stream_io(read, write, p, mode=mode)
    assert sink.getvalue() == flat
    assert n == len(flat)


def test_stream_encode_exercises_compaction():
    # dict much smaller than the input forces repeated MoveBlock-style
    # compactions of the sliding window
    data = _lz_data(3_000_000, seed=9)
    p = LzmaParams(dict_size=1 << 12, fast_bytes=32)
    flat = native.encode_stream(data, p)
    read, write, sink = _io_pair(data, chunk=50_021)
    native.encode_stream_io(read, write, p)
    assert sink.getvalue() == flat


@pytest.mark.parametrize("eos", [False, True])
def test_stream_decode_matches_flat(eos):
    data = _lz_data(400_000, seed=11)
    p = LzmaParams(dict_size=1 << 14, fast_bytes=32, write_eos=eos)
    comp = native.encode_stream(data, p)
    read, write, sink = _io_pair(comp, chunk=9_973)
    n = native.decode_stream_io(read, write, p, -1 if eos else len(data))
    assert n == len(data)
    assert sink.getvalue() == data


def test_stream_decode_window_wraps():
    # output much larger than the ring window: many flush-on-wrap cycles
    data = _lz_data(2_500_000, seed=13)
    p = LzmaParams(dict_size=1 << 12, fast_bytes=32)
    comp = native.encode_stream(data, p)
    read, write, sink = _io_pair(comp)
    native.decode_stream_io(read, write, p, len(data))
    assert sink.getvalue() == data


def test_stream_decode_truncated_input_errors():
    data = _lz_data(100_000)
    p = LzmaParams(dict_size=1 << 14, fast_bytes=32)
    comp = native.encode_stream(data, p)
    read, write, _ = _io_pair(comp[: len(comp) // 2])
    with pytest.raises(CorruptStreamError):
        native.decode_stream_io(read, write, p, len(data))


def test_stream_decode_forged_distance_errors():
    # a distance pointing before the start of history must error, not read
    # out of the window
    p = LzmaParams(dict_size=1 << 14, fast_bytes=32)
    comp = native.encode_stream(b"ab" * 50_000, p)
    bad = bytes([comp[0]]) + b"\xff" * 40  # forged range-coder payload
    read, write, _ = _io_pair(bad)
    with pytest.raises(CorruptStreamError):
        native.decode_stream_io(read, write, p, 100_000)


def test_callback_exception_propagates():
    data = _lz_data(200_000)
    p = LzmaParams(dict_size=1 << 14, fast_bytes=32)

    class Boom(RuntimeError):
        pass

    def bad_write(b):
        raise Boom("sink failed")

    read, _, _ = _io_pair(data)
    with pytest.raises(Boom):
        native.encode_stream_io(read, bad_write, p)


def test_file_codec_alone_roundtrip_and_liblzma(tmp_path):
    import lzma_tpu

    data = fixture_bytes(300_000)
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    dst = tmp_path / "out.lzma"
    back = tmp_path / "back.bin"
    n = lzma_tpu.compress_file(src, dst, container="alone",
                               dict_size=1 << 16, fast_bytes=32)
    assert n == os.path.getsize(dst)
    # stock liblzma must decode our streamed container
    assert lzma.decompress(dst.read_bytes(), format=lzma.FORMAT_ALONE) == data
    # and the streaming file decoder must round-trip it
    assert lzma_tpu.decompress_file(dst, back) == len(data)
    assert back.read_bytes() == data


def test_file_codec_alone_eos(tmp_path):
    import lzma_tpu

    data = _lz_data(150_000, seed=21)
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    dst = tmp_path / "out.lzma"
    back = tmp_path / "back.bin"
    p = LzmaParams(dict_size=1 << 14, fast_bytes=16, write_eos=True)
    lzma_tpu.compress_file(src, dst, params=p, container="alone")
    blob = dst.read_bytes()
    assert blob[5:13] == b"\xff" * 8  # unknown-size field
    assert lzma.decompress(blob, format=lzma.FORMAT_ALONE) == data
    assert lzma_tpu.decompress_file(dst, back) == len(data)
    assert back.read_bytes() == data


def test_file_codec_decodes_liblzma_file(tmp_path):
    import lzma_tpu

    data = fixture_bytes(250_000)
    blob = lzma.compress(data, format=lzma.FORMAT_ALONE, preset=6)
    src = tmp_path / "lib.lzma"
    src.write_bytes(blob)
    back = tmp_path / "back.bin"
    assert lzma_tpu.decompress_file(src, back) == len(data)
    assert back.read_bytes() == data


def test_file_codec_streamed_equals_flat_container(tmp_path):
    import lzma_tpu

    data = _lz_data(500_000, seed=31)
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    dst = tmp_path / "out.lzma"
    p = LzmaParams(dict_size=1 << 15, fast_bytes=64)
    lzma_tpu.compress_file(src, dst, params=p, container="alone")
    assert dst.read_bytes() == native.encode_alone(data, p)


# --- incremental file objects over .lzma single streams --------------------

def test_alone_fileobj_write_read(tmp_path):
    import lzma_tpu

    data = _lz_data(700_000, seed=41)
    path = tmp_path / "s.lzma"
    with lzma_tpu.open(path, "wb", container="alone",
                       dict_size=1 << 15, fast_bytes=16) as w:
        for i in range(0, len(data), 50_000):
            w.write(data[i : i + 50_000])
    # unknown-size container: EOS mode, liblzma-decodable
    blob = path.read_bytes()
    assert blob[5:13] == b"\xff" * 8
    assert lzma.decompress(blob, format=lzma.FORMAT_ALONE) == data
    with lzma_tpu.open(path, "rb") as r:
        got = bytearray()
        while True:
            chunk = r.read(37_000)
            if not chunk:
                break
            got += chunk
    assert bytes(got) == data


def test_alone_fileobj_reads_liblzma_and_early_close(tmp_path):
    import lzma_tpu

    data = fixture_bytes(400_000)
    path = tmp_path / "lib.lzma"
    path.write_bytes(lzma.compress(data, format=lzma.FORMAT_ALONE, preset=1))
    with lzma_tpu.open(path, "rb") as r:
        head = r.read(10_000)
        assert head == data[:10_000]
        # early close must cancel the worker cleanly
    with lzma_tpu.open(path, "rb") as r:
        assert r.read() == data


def test_alone_fileobj_corrupt_read_raises(tmp_path):
    import lzma_tpu

    data = _lz_data(200_000, seed=43)
    p = LzmaParams(dict_size=1 << 14, fast_bytes=16)
    blob = native.encode_alone(data, p)
    path = tmp_path / "bad.lzma"
    path.write_bytes(blob[: len(blob) // 3])  # truncated
    with pytest.raises(CorruptStreamError):
        with lzma_tpu.open(path, "rb") as r:
            r.read()
