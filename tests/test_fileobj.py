"""Streaming file-object API (lzma_tpu.open / LZTBReader / LZTBWriter)."""

import io

import pytest

import lzma_tpu
from lzma_tpu.core.rangecoder import CorruptStreamError
from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.parallel import blocks as blk
from lzma_tpu.parallel.fileobj import LZTBReader, LZTBWriter


def _mixed(n=200_000, seed=30):
    import numpy as np

    rng = np.random.default_rng(seed)
    word = rng.integers(0, 256, 61, dtype=np.uint8).tobytes()
    rep = (word * (n // 100))[: n // 2]
    rnd = rng.integers(0, 256, n - len(rep), dtype=np.uint8).tobytes()
    return rep + rnd


PARAMS = LzmaParams(dict_size=1 << 15, fast_bytes=16)


def test_writer_matches_in_memory_container(tmp_path):
    data = _mixed()
    dst = tmp_path / "c.lztb"
    with lzma_tpu.open(dst, "wb", params=PARAMS, block_size=1 << 14,
                       batch_bytes=1 << 15) as w:
        # dribble in odd-sized writes to exercise the internal buffering
        for off in range(0, len(data), 7001):
            w.write(data[off : off + 7001])
    try:
        from lzma_tpu.runtime import native

        expect = native.encode_blocks(data, PARAMS, block_size=1 << 14)
    except Exception:
        expect = blk.encode_blocks(data, PARAMS, block_size=1 << 14)
    assert dst.read_bytes() == expect


def test_reader_round_trip(tmp_path):
    data = _mixed(150_001, seed=31)  # odd tail
    dst = tmp_path / "c.lztb"
    with lzma_tpu.open(dst, "wb", params=PARAMS, block_size=1 << 14) as w:
        w.write(data)
    with lzma_tpu.open(dst, "rb", batch_bytes=1 << 15) as r:
        out = bytearray()
        while True:
            chunk = r.read(7919)  # prime-sized reads across batch seams
            if not chunk:
                break
            out.extend(chunk)
    assert bytes(out) == data


def test_read_all_at_once(tmp_path):
    data = _mixed(60_000, seed=32)
    dst = tmp_path / "c.lztb"
    with lzma_tpu.open(dst, "wb", params=PARAMS, block_size=1 << 14) as w:
        w.write(data)
    with lzma_tpu.open(dst, "rb") as r:
        assert r.read() == data


def test_writer_preset(tmp_path):
    data = _mixed(150_000, seed=33)
    a = tmp_path / "plain.lztb"
    b = tmp_path / "preset.lztb"
    with lzma_tpu.open(a, "wb", params=PARAMS, block_size=1 << 14) as w:
        w.write(data)
    with lzma_tpu.open(b, "wb", params=PARAMS, block_size=1 << 14,
                       preset_len=1 << 13) as w:
        w.write(data)
    blob = b.read_bytes()
    assert blob[4] == blk.VERSION_PRESET
    assert lzma_tpu.decompress(blob) == data
    with lzma_tpu.open(b, "rb") as r:
        assert r.read() == data


def test_file_object_targets():
    data = _mixed(50_000, seed=34)
    sink = io.BytesIO()
    w = LZTBWriter(sink, params=PARAMS, block_size=1 << 14)
    w.write(data)
    w.close()
    blob = sink.getvalue()
    assert lzma_tpu.decompress(blob) == data
    r = LZTBReader(io.BytesIO(blob))
    assert r.read() == data
    r.close()


def test_open_accepts_file_objects():
    """lzma_tpu.open mirrors lzma.open: filenames OR binary file objects,
    with container auto-detection on seekable reads."""
    data = _mixed(50_000, seed=36)
    # LZTB through the top-level open
    sink = io.BytesIO()
    with lzma_tpu.open(sink, "wb", params=PARAMS, block_size=1 << 14) as w:
        w.write(data)
    blob = sink.getvalue()
    with lzma_tpu.open(io.BytesIO(blob), "rb") as r:
        assert r.read() == data
    # .lzma single stream: auto-detected from the same entry point
    from lzma_tpu.runtime import native

    if not native.available():
        pytest.skip("alone file objects need the native runtime")
    sink2 = io.BytesIO()
    with lzma_tpu.open(sink2, "wb", container="alone", params=PARAMS) as w:
        w.write(data)
    with lzma_tpu.open(io.BytesIO(sink2.getvalue()), "rb") as r:
        assert r.read() == data


def test_empty_stream(tmp_path):
    dst = tmp_path / "e.lztb"
    with lzma_tpu.open(dst, "wb", params=PARAMS) as w:
        pass
    with lzma_tpu.open(dst, "rb") as r:
        assert r.read() == b""


def test_single_block_drops_preset(tmp_path):
    data = _mixed(5_000, seed=35)
    dst = tmp_path / "s.lztb"
    with lzma_tpu.open(dst, "wb", params=PARAMS, block_size=1 << 14,
                       preset_len=1 << 12) as w:
        w.write(data)
    blob = dst.read_bytes()
    assert blob[4] == blk.VERSION  # no preset on a single-block container
    assert lzma_tpu.decompress(blob) == data


def test_reader_rejects_garbage(tmp_path):
    # an invalid .lzma properties byte (>= 225) is rejected at open
    bad = tmp_path / "bad.lzma"
    bad.write_bytes(b"\xff" + bytes(40))
    with pytest.raises(CorruptStreamError):
        lzma_tpu.open(bad, "rb")
    # NB: non-LZTB magic with a VALID props byte is a syntactically legal
    # .lzma container (the format has no magic; b"NOPE"+zeros parses as an
    # empty known-size stream — the reference CLI accepts it the same way,
    # LzmaAlone.java:220-236)
    weird = tmp_path / "weird.lzma"
    weird.write_bytes(b"NOPE" + bytes(40))
    with lzma_tpu.open(weird, "rb") as r:
        assert r.read() == b""


def test_bad_mode():
    with pytest.raises(ValueError):
        lzma_tpu.open("x", "ab")


def test_writer_preset_multi_batch_matches_filestream(tmp_path):
    data = _mixed(300_000, seed=36)
    src = tmp_path / "in.bin"
    a = tmp_path / "fs.lztb"
    b = tmp_path / "fo.lztb"
    src.write_bytes(data)
    from lzma_tpu.parallel import filestream

    filestream.encode_file(src, a, PARAMS, block_size=1 << 14,
                           batch_bytes=1 << 15, preset_len=1 << 13)
    with lzma_tpu.open(b, "wb", params=PARAMS, block_size=1 << 14,
                       batch_bytes=1 << 15, preset_len=1 << 13) as w:
        for off in range(0, len(data), 50_000):
            w.write(data[off : off + 50_000])
    assert b.read_bytes() == a.read_bytes()
