"""Constant-memory file-to-file codec over the LZTB block container.

The reference is a streaming codec: it encodes/decodes arbitrarily large
files with O(dictionary) memory via a sliding input window
(InWindow.java:24-63) and a flushing output window (OutWindow.java:41-51).
Our block-parallel design gets the same property a different way — the
scaling unit *is* the resume seam: blocks are independent streams, so a
file can be fed through the codec one batch of blocks at a time with
O(batch) memory, while every batch still uses all host threads.

Encode writes the LZTB header with a zeroed size table up front, streams
compressed payload behind it, then seeks back and patches the real table
(LZTB keeps the ragged-gather size table in the header so that *decode*
can stream without any back-seek).  The resulting file is byte-identical
to an in-memory `native.encode_blocks` of the whole input.

Falls back to the scalar codec when the native runtime is unavailable;
output is byte-identical either way (pinned by tests/test_filestream.py).
"""

from __future__ import annotations

import os
import struct
from concurrent.futures import ThreadPoolExecutor

from ..core.rangecoder import CorruptStreamError
from ..format.properties import LzmaParams
from . import blocks as blk

#: uncompressed bytes fed to the encoder per batch (multiple of block_size)
DEFAULT_BATCH_BYTES = 64 << 20


def _backend(num_threads: int):
    """Return (encode_batch, decode_batch) callables for the best backend.

    encode_batch(data, params, block_size, mode, preset) -> (payload, sizes)
    decode_batch(payload, params, block_size, batch_total, sizes, preset) -> bytes

    `preset` applies to every block in the batch (the LZTB v2 shared
    dictionary); pass b"" for plain blocks.
    """
    try:
        from ..runtime import native

        if native.available():
            def enc(data, params, block_size, mode, preset=b""):
                return native.encode_block_payload_pre(
                    data, preset, params, block_size, num_threads, mode=mode
                )

            def dec(payload, params, block_size, batch_total, sizes, preset=b""):
                return native.decode_block_payload_pre(
                    payload, preset, params, block_size, batch_total, sizes,
                    num_threads,
                )

            return enc, dec
    except Exception:
        pass

    from ..codec.decoder import decode_stream
    from ..codec.encoder import encode_stream

    def enc(data, params, block_size, mode, preset=b""):
        pieces = blk.split_blocks(data, block_size)
        fn = lambda b: encode_stream(b, params, mode=mode, preset=preset)  # noqa: E731
        if num_threads > 1 and len(pieces) > 1:
            with ThreadPoolExecutor(num_threads) as ex:
                streams = list(ex.map(fn, pieces))
        else:
            streams = [fn(b) for b in pieces]
        return b"".join(streams), [len(s) for s in streams]

    def dec(payload, params, block_size, batch_total, sizes, preset=b""):
        offs = [0]
        for s in sizes:
            offs.append(offs[-1] + s)

        def one(i):
            out_size = min(block_size, batch_total - i * block_size)
            return decode_stream(
                bytes(payload[offs[i] : offs[i + 1]]), params, out_size,
                preset=preset,
            )

        if num_threads > 1 and len(sizes) > 1:
            with ThreadPoolExecutor(num_threads) as ex:
                parts = list(ex.map(one, range(len(sizes))))
        else:
            parts = [one(i) for i in range(len(sizes))]
        return b"".join(parts)

    return enc, dec


def _encode_batch(enc, chunk, params, block_size, mode, preset_req, preset,
                  first):
    """Encode one uncompressed batch, handling the LZTB v2 first-batch
    split (block 0 — the preset source — encodes plain, the rest against
    the preset).  The ONE implementation shared by encode_file and
    LZTBWriter (fileobj.py) so the logic cannot drift.  Returns
    (payload, sizes, preset)."""
    if preset_req and first:
        preset = chunk[: min(preset_req, block_size, len(chunk))]
        p0, s0 = enc(chunk[:block_size], params, block_size, mode)
        p1, s1 = enc(chunk[block_size:], params, block_size, mode, preset)
        return p0 + p1, s0 + s1, preset
    payload, sizes = enc(chunk, params, block_size, mode, preset)
    return payload, sizes, preset


def _decode_batch(dec, payload, params, block_size, batch_total, batch,
                  preset_len, preset, first):
    """Decode one batch of blocks, handling the LZTB v2 first-batch split
    (block 0 decodes plain and donates the preset).  Shared by
    decode_file and LZTBReader (fileobj.py).  Returns (out, preset)."""
    if preset_len and first:
        b0_total = min(block_size, batch_total)
        out0 = dec(payload[: batch[0]], params, block_size, b0_total,
                   batch[:1])
        preset = out0[:preset_len]
        rest = dec(payload[batch[0] :], params, block_size,
                   batch_total - b0_total, batch[1:], preset)
        out = out0 + rest
    else:
        out = dec(payload, params, block_size, batch_total, batch, preset)
    if len(out) != batch_total:
        raise CorruptStreamError("decoded size mismatch")
    return out, preset


def check_total_size_plausible(total_size: int, fileobj) -> None:
    """Anti-DoS guard shared by every streaming reader: a forged
    total_size drives upfront output allocations, so it must be possible
    for the actual payload size.  Skipped when the source size cannot be
    determined (unseekable pipe without fileno)."""
    try:
        src_size = os.fstat(fileobj.fileno()).st_size
    except (AttributeError, OSError):
        try:
            pos = fileobj.tell()
            src_size = fileobj.seek(0, os.SEEK_END)
            fileobj.seek(pos)
        except (AttributeError, OSError, ValueError):
            return
    if total_size > src_size * blk.MAX_EXPANSION + (1 << 16):
        raise CorruptStreamError(
            "claimed total_size is impossible for this payload"
        )


def encode_file(
    src,
    dst,
    params: LzmaParams | None = None,
    block_size: int = blk.DEFAULT_BLOCK_SIZE,
    num_threads: int = 0,
    mode: str | None = None,
    batch_bytes: int = DEFAULT_BATCH_BYTES,
    progress=None,
    preset_len: int = 0,
    dictionary: bytes = b"",
) -> int:
    """Stream-encode file `src` into an LZTB container at `dst`.

    Memory use is O(batch_bytes + compressed batch), independent of file
    size.  `progress(in_bytes, out_bytes)` mirrors the reference's
    ICodeProgress callback (ICodeProgress.java:4).  `preset_len` shares
    the file's first bytes as a preset dictionary for every block after
    block 0 (LZTB v2); `dictionary` stores a trained dictionary that
    primes EVERY block (LZTB v3, utils/dicttrain.py).  Returns the
    container size in bytes.
    """
    params = (params or LzmaParams()).validated_for_encode()
    if params.write_eos:
        raise ValueError("block container uses known sizes; EOS not supported")
    if block_size < 1:
        raise ValueError("block_size must be positive")
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    batch_bytes = max(block_size, (batch_bytes // block_size) * block_size)
    total_size = os.path.getsize(src)
    num_blocks = (total_size + block_size - 1) // block_size
    preset_len = blk.validated_preset_len(preset_len, block_size, total_size)
    dictionary = blk.validated_dictionary(dictionary, preset_len)
    if num_blocks < 2:
        preset_len = 0  # single block: a preset would be pointless
    if num_blocks == 0:
        dictionary = b""
    enc, _ = _backend(num_threads)

    dict_stream = b""
    if dictionary:
        # always optimal-parse the (small) dict stream, whatever the block
        # mode — keeps the container byte-identical to the in-memory path
        dict_stream, _ds = enc(dictionary, params, len(dictionary), None)
    sizes: list[int] = []
    written = 0
    preset = dictionary
    with open(src, "rb") as fi, open(dst, "wb") as fo:
        head = blk.pack_header(params, block_size, total_size, num_blocks,
                               preset_len, len(dictionary), len(dict_stream))
        fo.write(head)
        table_offset = len(head)
        fo.write(b"\x00" * (4 * num_blocks))  # patched after the payload
        fo.write(dict_stream)
        written += len(dict_stream)
        consumed = 0
        # read-ahead thread: overlap input IO with encoding (one batch of
        # look-ahead — bounded so memory stays O(batch)).  Every reader
        # put is bounded and stop-aware: if the consumer dies, stop is
        # set and the thread retires instead of blocking forever on the
        # full queue with a batch buffer pinned.
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=1)
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def _reader():
            try:
                while not stop.is_set():
                    c = fi.read(batch_bytes)
                    if not _put(c) or not c:
                        return
            except Exception as e:  # surfaced by the consumer
                _put(e)

        rt = threading.Thread(target=_reader, daemon=True)
        rt.start()
        try:
            while True:
                chunk = q.get()
                if isinstance(chunk, Exception):
                    raise chunk
                if not chunk:
                    break
                consumed += len(chunk)
                if consumed > total_size:
                    raise ValueError(f"{src} grew while encoding")
                payload, bsizes, preset = _encode_batch(
                    enc, chunk, params, block_size, mode,
                    preset_len, preset, first=not sizes)
                fo.write(payload)
                written += len(payload)
                sizes.extend(bsizes)
                if progress is not None:
                    progress(consumed, table_offset + 4 * num_blocks + written)
        finally:
            stop.set()
            rt.join(timeout=5)
        if consumed != total_size or len(sizes) != num_blocks:
            raise ValueError(f"{src} changed size while encoding")
        fo.seek(table_offset)
        fo.write(struct.pack(f"<{num_blocks}I", *sizes))
    return table_offset + 4 * num_blocks + written


def decode_file(
    src,
    dst,
    num_threads: int = 0,
    batch_bytes: int = DEFAULT_BATCH_BYTES,
    progress=None,
) -> int:
    """Stream-decode an LZTB container file `src` to `dst`.

    Reads the header + size table, then decodes batches of blocks with
    O(batch) memory.  Returns the decoded size in bytes.
    """
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    _, dec = _backend(num_threads)
    with open(src, "rb") as fi, open(dst, "wb") as fo:
        (params, block_size, total_size, n, preset_len,
         dict_len, dict_comp, head_size) = (
            blk.read_header(fi)  # validates the block geometry
        )
        check_total_size_plausible(total_size, fi)
        table = fi.read(4 * n)
        if len(table) < 4 * n:
            raise CorruptStreamError("container size table truncated")
        comp_sizes = struct.unpack(f"<{n}I", table)

        blocks_per_batch = max(1, batch_bytes // block_size)
        done = 0  # uncompressed bytes written
        comp_done = 0  # compressed payload bytes consumed
        preset = b""
        if dict_len:  # LZTB v3: the stored dictionary primes every block
            ds = fi.read(dict_comp)
            if len(ds) < dict_comp:
                raise CorruptStreamError("container dict stream truncated")
            preset = dec(ds, params, dict_len, dict_len, [dict_comp])
            comp_done += dict_comp
        for start in range(0, n, blocks_per_batch):
            batch = comp_sizes[start : start + blocks_per_batch]
            need = sum(batch)
            payload = fi.read(need)
            if len(payload) < need:
                raise CorruptStreamError("container payload truncated")
            batch_total = min(block_size * len(batch), total_size - done)
            out, preset = _decode_batch(
                dec, payload, params, block_size, batch_total, batch,
                preset_len, preset, first=start == 0)
            fo.write(out)
            done += batch_total
            comp_done += need
            if progress is not None:
                progress(done, head_size + 4 * n + comp_done)
        if done != total_size:
            raise CorruptStreamError("decoded size mismatch")
    return done


# --- .lzma (LZMA_Alone) single-stream file codec ---------------------------
# The reference's own container and operating mode: one stream, O(dict)
# resident memory via the native runtime's sliding InWindow / circular
# OutWindow equivalents (lzt_encode_stream / lzt_decode_stream).  The LZTB
# paths above scale across threads; these produce/consume files that stock
# liblzma and the reference CLI understand (LzmaAlone.java:208-239).

def encode_file_alone(src, dst, params: LzmaParams | None = None,
                      optimal: bool = True, mode: str | None = None,
                      progress=None, chunk: int = 1 << 20) -> int:
    """Stream-encode file `src` into a `.lzma` (LZMA_Alone) file at `dst`
    with O(dict) memory.  With params.write_eos the size field is -1 and
    an end-of-stream marker is written (the reference CLI's -eos mode).
    Returns the container size in bytes."""
    params = (params or LzmaParams()).validated_for_encode()
    from ..runtime import native

    total = os.path.getsize(src)
    size_field = (
        0xFFFFFFFFFFFFFFFF if params.write_eos else total & 0xFFFFFFFFFFFFFFFF
    )
    state = {"in": 0, "out": 13}
    with open(src, "rb") as fi, open(dst, "wb") as fo:
        fo.write(params.encode_props() + size_field.to_bytes(8, "little"))

        def read(cap: int) -> bytes:
            b = fi.read(min(cap, chunk))
            state["in"] += len(b)
            return b

        def write(b: bytes) -> None:
            fo.write(b)
            state["out"] += len(b)
            if progress is not None:
                progress(state["in"], state["out"])

        native.encode_stream_io(read, write, params, optimal=optimal,
                                mode=mode)
    return state["out"]


def decode_file_alone(src, dst, progress=None, chunk: int = 1 << 20) -> int:
    """Stream-decode a `.lzma` (LZMA_Alone) file to `dst` in
    max(dict,4K)+chunk memory; handles both known-size and EOS-terminated
    (size field -1) containers.  Returns the decoded size in bytes."""
    from ..format.properties import decode_props
    from ..runtime import native

    state = {"in": 13, "out": 0}
    with open(src, "rb") as fi, open(dst, "wb") as fo:
        head = fi.read(13)
        if len(head) < 13:
            raise CorruptStreamError(".lzma input too short")
        try:
            params = decode_props(head[:5])
        except ValueError as e:
            raise CorruptStreamError(str(e)) from e
        out_size = int.from_bytes(head[5:13], "little")
        eos = out_size == 0xFFFFFFFFFFFFFFFF
        if not eos and out_size > (1 << 62):
            raise CorruptStreamError("implausible .lzma size field")

        def read(cap: int) -> bytes:
            b = fi.read(min(cap, chunk))
            state["in"] += len(b)
            return b

        def write(b: bytes) -> None:
            fo.write(b)
            state["out"] += len(b)
            if progress is not None:
                progress(state["in"], state["out"])

        n = native.decode_stream_io(read, write, params,
                                    -1 if eos else out_size)
    return int(n)
