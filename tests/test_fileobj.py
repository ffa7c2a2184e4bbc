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


# --- hardening regressions (review findings) --------------------------------

def test_reader_rejects_forged_total_size(tmp_path):
    """A ~30-byte forged container claiming a multi-GiB total_size must be
    rejected BEFORE any decoder allocation (same guard as decode_file)."""
    import struct

    head = (b"LZTB" + bytes([1]) + PARAMS.encode_props()
            + struct.pack("<IQI", 0xFFFFFFFF, 0xFFFFFFFF, 1))
    forged = head + struct.pack("<I", 5) + b"\x00" * 5
    f = tmp_path / "forged.lztb"
    f.write_bytes(forged)
    with pytest.raises(CorruptStreamError):
        r = LZTBReader(f)
        try:
            r.read()
        finally:
            r.close()


def test_partial_construction_close_is_noop(tmp_path):
    """Constructor failures must not leave close() raising AttributeError
    from the io finalizer, and must not leak the opened fd."""
    import gc
    import os

    def nfds():
        return len(os.listdir("/proc/self/fd"))

    bad = tmp_path / "garbage.bin"
    bad.write_bytes(b"\x13" * 64)
    gc.collect()
    before = nfds()
    for _ in range(5):
        with pytest.raises(ValueError):
            LZTBWriter(tmp_path / "w.lztb", block_size=0)
        with pytest.raises(CorruptStreamError):
            LZTBReader(bad)
    gc.collect()
    assert nfds() <= before + 1  # no fd accumulation from failed ctors


def test_encode_file_reader_thread_not_leaked(tmp_path, monkeypatch):
    """When the encode consumer raises, the read-ahead thread must retire
    instead of blocking forever on the full queue."""
    import threading
    import time

    from lzma_tpu.parallel import filestream as fs

    src = tmp_path / "src.bin"
    src.write_bytes(_mixed(400_000))

    real_backend = fs._backend

    def broken_backend(num_threads):
        enc, dec = real_backend(num_threads)

        def bad_enc(*a, **k):
            raise RuntimeError("simulated encoder failure")

        return bad_enc, dec

    monkeypatch.setattr(fs, "_backend", broken_backend)
    base = threading.active_count()
    with pytest.raises(RuntimeError):
        fs.encode_file(src, tmp_path / "dst.lztb", PARAMS,
                       block_size=1 << 14, batch_bytes=1 << 15)
    for _ in range(50):  # the reader retires within the 0.2s put timeout
        if threading.active_count() <= base:
            break
        time.sleep(0.1)
    assert threading.active_count() <= base


def test_alone_writer_fails_fast_without_native(tmp_path, monkeypatch):
    """An unbuilt native runtime must surface BEFORE the destination file
    is created/truncated."""
    from lzma_tpu.parallel.fileobj import AloneWriter
    from lzma_tpu.runtime import native

    monkeypatch.setattr(native, "available", lambda: False)
    dst = tmp_path / "out.lzma"
    with pytest.raises(native.NativeUnavailable):
        AloneWriter(dst)
    assert not dst.exists()


def test_alone_reader_rejects_forged_size(tmp_path):
    from lzma_tpu.parallel.fileobj import AloneReader

    forged = PARAMS.encode_props() + (1 << 63).to_bytes(8, "little") + b"\x00" * 16
    f = tmp_path / "forged.lzma"
    f.write_bytes(forged)
    with pytest.raises(CorruptStreamError):
        AloneReader(f)


def test_alone_reader_close_with_stalled_pipe_source():
    """close() must return promptly even when the codec worker is stalled
    in a blocking read on an unowned pipe whose peer never sends."""
    import os
    import time

    from lzma_tpu.parallel.fileobj import AloneReader

    rfd, wfd = os.pipe()
    rf = os.fdopen(rfd, "rb")
    try:
        os.write(wfd, PARAMS.encode_props() + (50_000).to_bytes(8, "little"))
        r = AloneReader(rf)  # worker now blocks reading payload
        time.sleep(0.3)
        t0 = time.perf_counter()
        r.close()
        assert time.perf_counter() - t0 < 3.0
    finally:
        # release the (abandoned) worker before touching rf: closing a
        # buffered file object while another thread reads it deadlocks
        os.close(wfd)  # EOF wakes the worker's blocking read
        for _ in range(50):
            if not r._thread.is_alive():
                break
            time.sleep(0.1)
        rf.close()
