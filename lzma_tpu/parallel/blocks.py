"""Block-parallel multi-stream container — the scaling unit of the framework.

One LZMA stream is inherently bit-serial (the reference's decode loop is a
strict chain, Decoder.java:219-296), so throughput scaling comes from
chunking input into independent streams ("blocks"), encoding/decoding them
data-parallel — across host threads (runtime/), TPU lanes (ops/) and mesh
devices (parallel/mesh.py) — and concatenating results in order.  This is
the LZMA analogue of data parallelism called for by SURVEY.md §5.7/§5.8.

Container layout (all little-endian):

    magic  b"LZTB"                      4
    version u8 = 1                      1
    props   5 bytes (lc/lp/pb + dict)   5   -- shared by every block
    block_size u32                      4   -- uncompressed bytes per block
    total_size u64                      8   -- original length
    num_blocks u32                      4
    comp_sizes u32[num_blocks]          4*n -- ragged-gather size table
    payload: concatenated raw LZMA streams (no per-block headers)

Each block is a fresh LZMA stream with its own dictionary window, known
uncompressed size (block_size, except possibly the last), no EOS marker.
"""

from __future__ import annotations

import struct
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from ..codec.decoder import decode_stream
from ..codec.encoder import encode_stream
from ..core.rangecoder import CorruptStreamError
from ..format.properties import LzmaParams, decode_props

MAGIC = b"LZTB"
VERSION = 1
_HEAD = struct.Struct("<4sB5sIQI")
DEFAULT_BLOCK_SIZE = 1 << 20


@dataclass(frozen=True)
class BlockFrame:
    """Parsed container header + payload offsets."""

    params: LzmaParams
    block_size: int
    total_size: int
    comp_sizes: tuple
    payload_offset: int


def split_blocks(data: bytes, block_size: int):
    return [data[i : i + block_size] for i in range(0, len(data), block_size)]


def build_container(params: LzmaParams, block_size: int, total_size: int, streams) -> bytes:
    head = _HEAD.pack(
        MAGIC, VERSION, params.encode_props(), block_size, total_size, len(streams)
    )
    sizes = struct.pack(f"<{len(streams)}I", *(len(s) for s in streams))
    return head + sizes + b"".join(streams)


def parse_container(blob) -> BlockFrame:
    if len(blob) < _HEAD.size or bytes(blob[:4]) != MAGIC:
        raise CorruptStreamError("not an LZTB container")
    magic, version, props, block_size, total_size, n = _HEAD.unpack_from(blob, 0)
    if version != VERSION:
        raise CorruptStreamError(f"unsupported LZTB version {version}")
    sizes = struct.unpack_from(f"<{n}I", blob, _HEAD.size)
    return BlockFrame(
        params=decode_props(props),
        block_size=block_size,
        total_size=total_size,
        comp_sizes=sizes,
        payload_offset=_HEAD.size + 4 * n,
    )


def encode_blocks(
    data: bytes,
    params: LzmaParams | None = None,
    block_size: int = DEFAULT_BLOCK_SIZE,
    num_threads: int = 1,
    optimal: bool = True,
    encode_fn=None,
) -> bytes:
    """Chunk + encode data-parallel + ordered concat.

    `encode_fn(block_bytes) -> stream_bytes` lets callers swap the backend
    (native C++ / TPU lanes) while reusing the framing.
    """
    params = (params or LzmaParams()).validated_for_encode()
    if params.write_eos:
        raise ValueError("block container uses known sizes; EOS not supported")
    blocks = split_blocks(data, block_size)
    fn = encode_fn or (lambda b: encode_stream(b, params, optimal=optimal))
    if num_threads > 1 and len(blocks) > 1:
        with ThreadPoolExecutor(num_threads) as ex:
            streams = list(ex.map(fn, blocks))
    else:
        streams = [fn(b) for b in blocks]
    return build_container(params, block_size, len(data), streams)


def decode_blocks(blob, num_threads: int = 1, decode_fn=None) -> bytes:
    """Parse + decode data-parallel + ordered concat."""
    frame = parse_container(blob)
    n = len(frame.comp_sizes)
    offsets = [frame.payload_offset]
    for s in frame.comp_sizes:
        offsets.append(offsets[-1] + s)
    if offsets[-1] > len(blob):
        raise CorruptStreamError("container payload truncated")

    def out_size(i: int) -> int:
        if i < n - 1:
            return frame.block_size
        return frame.total_size - frame.block_size * (n - 1)

    fn = decode_fn or (
        lambda i: decode_stream(
            blob, frame.params, out_size=out_size(i), start=offsets[i], end=offsets[i + 1]
        )
    )
    if num_threads > 1 and n > 1:
        with ThreadPoolExecutor(num_threads) as ex:
            parts = list(ex.map(fn, range(n)))
    else:
        parts = [fn(i) for i in range(n)]
    out = b"".join(parts)
    if len(out) != frame.total_size:
        raise CorruptStreamError("decoded size mismatch")
    return out
