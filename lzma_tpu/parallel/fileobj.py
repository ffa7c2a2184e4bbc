"""File-like streaming objects over the LZTB container.

The reference codes between java.io streams (LzmaAlone.java:208-239);
the Pythonic equivalent is a file object.  `lzma_tpu.open(path, "wb")`
returns a writer that accepts incremental `write()` calls with O(batch)
memory and unknown final size; `open(path, "rb")` returns a reader with
incremental `read()`.  Both ride the same backend codecs as
filestream.py (native thread pool when built, scalar otherwise).

Writer layout problem: the LZTB header carries num_blocks and the size
table BEFORE the payload, but a streaming writer learns both only at
close().  Solution: payload batches stream to an anonymous spill file;
close() writes the real header + table and splices the payload in
(one sequential copy of the compressed bytes — compressed, so cheap).
"""

from __future__ import annotations

import io
import os
import shutil
import struct
import tempfile

from ..core.rangecoder import CorruptStreamError
from ..format.properties import LzmaParams
from . import blocks as blk
from .filestream import (
    DEFAULT_BATCH_BYTES,
    _backend,
    _decode_batch,
    _encode_batch,
    check_total_size_plausible,
)


class LZTBWriter(io.RawIOBase):
    """Incremental LZTB writer: buffers up to batch_bytes of input, then
    encodes a batch of blocks to a spill file; close() assembles the
    final container."""

    def __init__(self, target, params: LzmaParams | None = None,
                 block_size: int = blk.DEFAULT_BLOCK_SIZE,
                 num_threads: int = 0, mode: str | None = None,
                 preset_len: int = 0, dictionary: bytes = b"",
                 batch_bytes: int = DEFAULT_BATCH_BYTES):
        # until construction completes, close() must be a no-op (the
        # io finalizer calls it even when __init__ raises)
        self._closed = True
        self._params = (params or LzmaParams()).validated_for_encode()
        if self._params.write_eos:
            raise ValueError("block container uses known sizes; EOS not supported")
        if block_size < 1:
            raise ValueError("block_size must be positive")
        self._block_size = block_size
        self._mode = mode
        self._preset_req = blk.validated_preset_len(
            preset_len, block_size, 1 << 62)
        self._dictionary = blk.validated_dictionary(dictionary, preset_len)
        self._preset = self._dictionary
        self._batch_bytes = max(
            block_size, (batch_bytes // block_size) * block_size)
        if num_threads <= 0:
            num_threads = os.cpu_count() or 1
        self._enc, _ = _backend(num_threads)
        self._own_target = isinstance(target, (str, os.PathLike))
        self._out = open(target, "wb") if self._own_target else target
        try:
            self._spill = tempfile.TemporaryFile()
        except Exception:
            if self._own_target:
                self._out.close()
            raise
        self._buf = bytearray()
        self._sizes: list[int] = []
        self._total = 0
        self._closed = False

    # -- io plumbing --
    def writable(self):
        return True

    def write(self, data) -> int:
        if self._closed:
            raise ValueError("I/O operation on closed file")
        with memoryview(data) as mv:
            n = mv.nbytes
            self._buf.extend(mv)
        self._total += n
        while len(self._buf) >= self._batch_bytes:
            # one copy per flushed batch (a bytearray slice + bytes() pair
            # would copy twice)
            with memoryview(self._buf) as mv:
                chunk = bytes(mv[: self._batch_bytes])
            del self._buf[: self._batch_bytes]
            self._flush_batch(chunk)
        return n

    def _flush_batch(self, chunk: bytes) -> None:
        if self._dictionary:
            payload, sizes = self._enc(chunk, self._params, self._block_size,
                                       self._mode, self._dictionary)
        else:
            # shared with encode_file: the v2 first-batch split lives in
            # ONE place (filestream._encode_batch)
            payload, sizes, self._preset = _encode_batch(
                self._enc, chunk, self._params, self._block_size, self._mode,
                self._preset_req, self._preset, first=not self._sizes)
        self._spill.write(payload)
        self._sizes.extend(sizes)

    def close(self) -> None:
        if self._closed:
            return
        try:
            if self._buf:
                self._flush_batch(bytes(self._buf))
                self._buf.clear()
            n = len(self._sizes)
            dict_stream = b""
            if self._dictionary and n > 0:
                # optimal-parse the (small) dict stream whatever the block
                # mode — byte-identical to the in-memory encoders
                dict_stream, _ = self._enc(
                    self._dictionary, self._params, len(self._dictionary), None
                )
                preset_len, dict_len = 0, len(self._dictionary)
            else:
                preset_len = len(self._preset) if n > 1 else 0
                dict_len = 0
            head = blk.pack_header(self._params, self._block_size,
                                   self._total, n, preset_len,
                                   dict_len, len(dict_stream))
            self._out.write(head)
            self._out.write(struct.pack(f"<{n}I", *self._sizes))
            self._out.write(dict_stream)
            self._spill.seek(0)
            shutil.copyfileobj(self._spill, self._out)
        finally:
            self._spill.close()
            if self._own_target:
                self._out.close()
            self._closed = True
            super().close()


class LZTBReader(io.RawIOBase):
    """Incremental LZTB reader: decodes a batch of blocks at a time and
    serves `read()` from the decoded buffer."""

    def __init__(self, source, num_threads: int = 0,
                 batch_bytes: int = DEFAULT_BATCH_BYTES):
        self._closed = True  # no-op close() until fully constructed
        if num_threads <= 0:
            num_threads = os.cpu_count() or 1
        _, self._dec = _backend(num_threads)
        self._own_source = isinstance(source, (str, os.PathLike))
        self._in = open(source, "rb") if self._own_source else source
        try:
            (self._params, self._block_size, self._total, self._n,
             self._preset_len, dict_len, dict_comp, _) = blk.read_header(
                self._in)
            # anti-DoS (same guard as decode_file): total_size drives the
            # decoders' upfront output allocation
            check_total_size_plausible(self._total, self._in)
            table = self._in.read(4 * self._n)
            if len(table) < 4 * self._n:
                raise CorruptStreamError("container size table truncated")
            self._comp_sizes = struct.unpack(f"<{self._n}I", table)
            self._batch_blocks = max(1, batch_bytes // self._block_size)
            self._next_block = 0
            self._done = 0
            self._preset = b""
            if dict_len:  # LZTB v3: the stored dictionary primes every block
                ds = self._in.read(dict_comp)
                if len(ds) < dict_comp:
                    raise CorruptStreamError("container dict stream truncated")
                self._preset = self._dec(ds, self._params, dict_len, dict_len,
                                         [dict_comp])
        except BaseException:
            if self._own_source:
                self._in.close()
            raise
        self._buf = memoryview(b"")
        self._closed = False

    def readable(self):
        return True

    def _fill(self) -> bool:
        """Decode the next batch into the buffer; False at EOF."""
        if self._next_block >= self._n:
            return False
        start = self._next_block
        batch = self._comp_sizes[start : start + self._batch_blocks]
        need = sum(batch)
        payload = self._in.read(need)
        if len(payload) < need:
            raise CorruptStreamError("container payload truncated")
        batch_total = min(self._block_size * len(batch), self._total - self._done)
        # shared with decode_file: the v2 first-batch split lives in ONE
        # place (filestream._decode_batch), size-mismatch check included
        out, self._preset = _decode_batch(
            self._dec, payload, self._params, self._block_size, batch_total,
            batch, self._preset_len, self._preset, first=start == 0)
        self._next_block = start + len(batch)
        self._done += batch_total
        self._buf = memoryview(out)
        return True

    def read(self, size: int = -1) -> bytes:
        if self._closed:
            raise ValueError("I/O operation on closed file")
        parts = []
        remaining = None if size is None or size < 0 else size
        while remaining is None or remaining > 0:
            if not self._buf:
                if not self._fill():
                    break
            take = len(self._buf) if remaining is None else min(remaining, len(self._buf))
            parts.append(bytes(self._buf[:take]))
            self._buf = self._buf[take:]
            if remaining is not None:
                remaining -= take
        return b"".join(parts)

    def readinto(self, b) -> int:
        data = self.read(len(b))
        b[: len(data)] = data
        return len(data)

    def close(self) -> None:
        if not self._closed:
            if self._own_source:
                self._in.close()
            self._closed = True
        super().close()


def open_lztb(path, mode: str = "rb", **kw):
    """Open an LZTB container for streaming ('rb' -> LZTBReader,
    'wb' -> LZTBWriter).  Keyword args pass through to the class."""
    if mode in ("rb", "r"):
        return LZTBReader(path, **kw)
    if mode in ("wb", "w"):
        return LZTBWriter(path, **kw)
    raise ValueError(f"mode must be 'rb' or 'wb', not {mode!r}")


# --- .lzma (LZMA_Alone) single-stream file objects --------------------------
# The native streaming codec (runtime/native.encode_stream_io /
# decode_stream_io) is callback-synchronous: it drives the whole stream in
# one call.  A file object needs the inverted control flow — incremental
# read()/write() from the caller — so these classes run the codec on a
# worker thread and hand bytes across a bounded queue (backpressure keeps
# memory O(queue), and the codec itself is O(dict)).

class _CodecThread:
    """Shared worker-thread plumbing for the alone-stream file objects."""

    QUEUE_CHUNKS = 8

    def __init__(self):
        import queue
        import threading

        self._q = queue.Queue(maxsize=self.QUEUE_CHUNKS)
        self._error: list[BaseException] = []
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):  # pragma: no cover - exercised via subclasses
        raise NotImplementedError

    def _check_error(self):
        if self._error:
            raise self._error[0]


class AloneWriter(io.RawIOBase, _CodecThread):
    """Incremental writer producing a `.lzma` (LZMA_Alone) stream.

    The final size is unknown while writing, so the container uses the
    reference's unknown-size mode: size field -1 + end-of-stream marker
    (LzmaAlone.java:215-217, Encoder.WriteEndMarker).  Memory is O(dict).
    """

    _EOF = object()

    def __init__(self, target, params: LzmaParams | None = None,
                 optimal: bool = True, mode: str | None = None):
        io.RawIOBase.__init__(self)
        _CodecThread.__init__(self)
        from ..runtime import native

        # fail fast BEFORE touching the target: available() returns a
        # bool; a bare call would silently proceed and the unbuilt
        # runtime would only surface after the destination was truncated
        if not native.available():
            raise native.NativeUnavailable(
                "AloneWriter needs the native runtime (python -m "
                "lzma_tpu.runtime.build)")
        import dataclasses

        p = params or LzmaParams()
        p = dataclasses.replace(p, write_eos=True).validated_for_encode()
        self._params = p
        self._optimal = optimal
        self._mode = mode
        self._target = target
        self._file = open(target, "wb") if not hasattr(target, "write") else target
        self._owns = not hasattr(target, "write") or self._file is not target
        self._file.write(p.encode_props() + b"\xff" * 8)
        self._pending = b""  # partial chunk handed to the codec's read()
        self._closed_input = False
        self._thread.start()

    def _run(self):
        from ..runtime import native

        def read(cap: int) -> bytes:
            while True:
                if self._pending:
                    out, self._pending = self._pending[:cap], self._pending[cap:]
                    return out
                item = self._q.get()
                if item is self._EOF:
                    return b""
                self._pending = item

        try:
            native.encode_stream_io(read, self._file.write, self._params,
                                    optimal=self._optimal, mode=self._mode)
        except BaseException as e:  # noqa: BLE001 - re-raised on the caller side
            self._error.append(e)
            # drain so a blocked writer wakes up
            try:
                while self._q.get_nowait() is not self._EOF:
                    pass
            except Exception:
                pass

    def writable(self):
        return True

    def write(self, data) -> int:
        import queue

        self._check_error()
        if self._closed_input:
            raise ValueError("write after close")
        b = bytes(data)
        if b:
            while True:  # bounded put that stays responsive to codec errors
                self._check_error()
                try:
                    self._q.put(b, timeout=0.2)
                    break
                except queue.Full:
                    continue
        self._check_error()
        return len(b)

    def close(self):
        if self.closed:
            return
        if not self._closed_input:
            self._closed_input = True
            self._q.put(self._EOF)
            self._thread.join()
        try:
            self._check_error()
        finally:
            if self._owns:
                self._file.close()
            io.RawIOBase.close(self)


class AloneReader(io.RawIOBase, _CodecThread):
    """Incremental reader over a `.lzma` (LZMA_Alone) stream; handles both
    known-size and EOS-terminated containers in O(dict) memory."""

    _EOF = object()
    _CHUNK = 1 << 18

    class _Cancelled(Exception):
        pass

    def __init__(self, source):
        io.RawIOBase.__init__(self)
        _CodecThread.__init__(self)
        from ..format.properties import decode_props
        from ..runtime import native

        if not native.available():
            raise native.NativeUnavailable(
                "AloneReader needs the native runtime (python -m "
                "lzma_tpu.runtime.build)")
        self._cancel = False
        self._file = open(source, "rb") if not hasattr(source, "read") else source
        self._owns = not hasattr(source, "read") or self._file is not source
        head = self._file.read(13)
        if len(head) < 13:
            if self._owns:
                self._file.close()
            raise CorruptStreamError(".lzma input too short")
        try:
            self._params = decode_props(head[:5])
        except ValueError as e:
            if self._owns:
                self._file.close()
            raise CorruptStreamError(str(e)) from e
        size = int.from_bytes(head[5:13], "little")
        self._out_size = -1 if size == 0xFFFFFFFFFFFFFFFF else size
        # same guard as decode_file_alone: a forged size >= 2^63 would
        # otherwise surface as a ctypes ArgumentError (c_int64 overflow)
        # from the worker instead of a CorruptStreamError here
        if self._out_size > (1 << 62):
            if self._owns:
                self._file.close()
            raise CorruptStreamError("implausible .lzma size field")
        self._buf = b""
        self._done = False
        self._thread.start()

    def _run(self):
        import queue

        from ..runtime import native

        def put(item) -> bool:
            # cancel-aware bounded put: after close() stops draining, the
            # worker must not block forever on the full queue
            while True:
                if self._cancel:
                    return False
                try:
                    self._q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue

        def write(b: bytes) -> None:
            if not put(bytes(b)):
                raise AloneReader._Cancelled()

        try:
            native.decode_stream_io(
                lambda cap: self._file.read(min(cap, self._CHUNK)),
                write, self._params, self._out_size,
            )
        except AloneReader._Cancelled:
            pass
        except BaseException as e:  # noqa: BLE001
            self._error.append(e)
        finally:
            # on the cancel path the sentinel is optional (close() treats
            # empty-queue + dead thread as EOF); put() never blocks on it
            put(self._EOF)

    def readable(self):
        return True

    def read(self, size: int = -1) -> bytes:
        if self.closed:
            raise ValueError("read on closed file")
        out = bytearray()
        while size < 0 or len(out) < size:
            if self._buf:
                take = len(self._buf) if size < 0 else size - len(out)
                out += self._buf[:take]
                self._buf = self._buf[take:]
                continue
            if self._done:
                break
            item = self._q.get()
            if item is self._EOF:
                self._done = True
                self._check_error()
                break
            self._buf = item
        self._check_error()
        return bytes(out)

    def readinto(self, b) -> int:
        data = self.read(len(b))
        b[: len(data)] = data
        return len(data)

    def close(self):
        if self.closed:
            return
        # cancel the codec (its next write callback raises), then drain so
        # a blocked put wakes up and the worker retires promptly.  The
        # worker can instead be stalled inside a blocking
        # self._file.read() (pipe/socket with a silent peer); that read
        # cannot be interrupted safely from this thread — closing a
        # buffered file object cross-thread deadlocks on its internal
        # lock, and closing the raw fd does not wake a blocked pipe read
        # on Linux — so after a bounded wait the daemon worker is
        # abandoned; it retires when the source finally yields bytes/EOF.
        import queue

        self._cancel = True
        stalled = False
        try:
            while not self._done:
                try:
                    item = self._q.get(timeout=0.2)
                except queue.Empty:
                    if self._thread.is_alive():
                        stalled = True  # worker blocked in _file.read()
                    self._done = True  # stop serving read() either way
                    break
                if item is self._EOF:
                    self._done = True
        finally:
            self._thread.join(timeout=0.5 if stalled else 5)
            if self._owns:
                if self._thread.is_alive():
                    # abandoned worker may be inside _file.read(); closing
                    # the buffered object here would deadlock on its lock.
                    # Owned sources are opened from paths (regular files,
                    # which cannot stall) so this branch is a pipe-like
                    # path edge case: leave the fd to process exit.
                    pass
                else:
                    self._file.close()
            io.RawIOBase.close(self)
