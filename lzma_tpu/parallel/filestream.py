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
from ..format.properties import LzmaParams, decode_props
from . import blocks as blk

#: uncompressed bytes fed to the encoder per batch (multiple of block_size)
DEFAULT_BATCH_BYTES = 64 << 20


def _backend(num_threads: int):
    """Return (encode_batch, decode_batch) callables for the best backend.

    encode_batch(data, params, block_size, mode) -> (payload, sizes)
    decode_batch(payload, params, block_size, batch_total, sizes) -> bytes
    """
    try:
        from ..runtime import native

        if native.available():
            def enc(data, params, block_size, mode):
                return native.encode_block_payload(
                    data, params, block_size, num_threads, mode=mode
                )

            def dec(payload, params, block_size, batch_total, sizes):
                return native.decode_block_payload(
                    payload, params, block_size, batch_total, sizes, num_threads
                )

            return enc, dec
    except Exception:
        pass

    from ..codec.decoder import decode_stream
    from ..codec.encoder import encode_stream

    def enc(data, params, block_size, mode):
        pieces = blk.split_blocks(data, block_size)
        fn = lambda b: encode_stream(b, params, mode=mode)  # noqa: E731
        if num_threads > 1 and len(pieces) > 1:
            with ThreadPoolExecutor(num_threads) as ex:
                streams = list(ex.map(fn, pieces))
        else:
            streams = [fn(b) for b in pieces]
        return b"".join(streams), [len(s) for s in streams]

    def dec(payload, params, block_size, batch_total, sizes):
        offs = [0]
        for s in sizes:
            offs.append(offs[-1] + s)

        def one(i):
            out_size = min(block_size, batch_total - i * block_size)
            return decode_stream(
                bytes(payload[offs[i] : offs[i + 1]]), params, out_size
            )

        if num_threads > 1 and len(sizes) > 1:
            with ThreadPoolExecutor(num_threads) as ex:
                parts = list(ex.map(one, range(len(sizes))))
        else:
            parts = [one(i) for i in range(len(sizes))]
        return b"".join(parts)

    return enc, dec


def encode_file(
    src,
    dst,
    params: LzmaParams | None = None,
    block_size: int = blk.DEFAULT_BLOCK_SIZE,
    num_threads: int = 0,
    mode: str | None = None,
    batch_bytes: int = DEFAULT_BATCH_BYTES,
    progress=None,
) -> int:
    """Stream-encode file `src` into an LZTB container at `dst`.

    Memory use is O(batch_bytes + compressed batch), independent of file
    size.  `progress(in_bytes, out_bytes)` mirrors the reference's
    ICodeProgress callback (ICodeProgress.java:4).  Returns the container
    size in bytes.
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
    enc, _ = _backend(num_threads)

    sizes: list[int] = []
    written = 0
    with open(src, "rb") as fi, open(dst, "wb") as fo:
        head = blk._HEAD.pack(
            blk.MAGIC, blk.VERSION, params.encode_props(),
            block_size, total_size, num_blocks,
        )
        fo.write(head)
        table_offset = len(head)
        fo.write(b"\x00" * (4 * num_blocks))  # patched after the payload
        consumed = 0
        while True:
            chunk = fi.read(batch_bytes)
            if not chunk:
                break
            consumed += len(chunk)
            if consumed > total_size:
                raise ValueError(f"{src} grew while encoding")
            payload, bsizes = enc(chunk, params, block_size, mode)
            fo.write(payload)
            written += len(payload)
            sizes.extend(bsizes)
            if progress is not None:
                progress(consumed, table_offset + 4 * num_blocks + written)
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
        head = fi.read(blk._HEAD.size)
        if len(head) < blk._HEAD.size or head[:4] != blk.MAGIC:
            raise CorruptStreamError("not an LZTB container")
        magic, version, props, block_size, total_size, n = blk._HEAD.unpack(head)
        if version != blk.VERSION:
            raise CorruptStreamError(f"unsupported LZTB version {version}")
        if block_size < 1 or n != (total_size + block_size - 1) // block_size:
            raise CorruptStreamError("block count inconsistent with sizes")
        params = decode_props(props)
        table = fi.read(4 * n)
        if len(table) < 4 * n:
            raise CorruptStreamError("container size table truncated")
        comp_sizes = struct.unpack(f"<{n}I", table)

        blocks_per_batch = max(1, batch_bytes // block_size)
        done = 0  # uncompressed bytes written
        comp_done = 0  # compressed payload bytes consumed
        for start in range(0, n, blocks_per_batch):
            batch = comp_sizes[start : start + blocks_per_batch]
            need = sum(batch)
            payload = fi.read(need)
            if len(payload) < need:
                raise CorruptStreamError("container payload truncated")
            batch_total = min(block_size * len(batch), total_size - done)
            out = dec(payload, params, block_size, batch_total, batch)
            if len(out) != batch_total:
                raise CorruptStreamError("decoded size mismatch")
            fo.write(out)
            done += batch_total
            comp_done += need
            if progress is not None:
                progress(done, blk._HEAD.size + 4 * n + comp_done)
        if done != total_size:
            raise CorruptStreamError("decoded size mismatch")
    return done
