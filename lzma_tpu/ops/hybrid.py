"""Hybrid TPU encode pipeline: device match search + native serialization.

The architecturally-sound split for LZMA on TPU hardware:

  * the O(n log n) expensive part — match finding + greedy parse — runs on
    the TPU as sort/compare/scan vector work (ops/device_matcher.py,
    measured multi-GB/s per chip);
  * the O(compressed-bits) inherently bit-serial part — LZMA state
    machine + adaptive range coding — runs on the host native runtime
    (TokenEncoder in runtime/src/lzma_core.cpp) across a thread pool.

The per-lane data leaving the device is just the compact token stream
(pos, len, dist per parse step), so the PCIe/ICI traffic is ~data-sized.
Output is bit-identical to the all-device encoder for the same tokens and
decodes everywhere (scalar/native/device/liblzma).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..format.properties import LzmaParams
from ..parallel import blocks as blk
from ..runtime import native
from .device_matcher import tokenize


@partial(jax.jit, static_argnames=("fb", "num_candidates"))
def _tokenize_lanes(data, lens, dict_size, fb, num_candidates):
    return jax.vmap(lambda d, n: tokenize(d, n, dict_size, fb, num_candidates))(
        data, lens
    )


def encode_blocks_hybrid(
    data: bytes,
    params: LzmaParams | None = None,
    block_size: int = 1 << 18,
    num_threads: int = 0,
    fb: int | None = None,
    num_candidates: int = 2,
) -> bytes:
    """TPU-search + host-serialize block-parallel encode to LZTB."""
    params = (params or LzmaParams()).validated_for_encode()
    blocks = blk.split_blocks(data, block_size)
    if not blocks:
        return blk.build_container(params, block_size, 0, [])
    fb = int(fb if fb is not None else min(params.fast_bytes, 64))
    n = len(blocks)
    bs = block_size
    arr = np.zeros((n, bs), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int32)
    for i, b in enumerate(blocks):
        arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)

    # device: parallel match search + parse
    t_pos, t_len, t_dist, t_valid, ntok = _tokenize_lanes(
        jnp.asarray(arr), jnp.asarray(lens),
        jnp.int32(min(params.dict_size, bs)), fb, num_candidates,
    )
    t_pos = np.asarray(t_pos)
    t_len = np.asarray(t_len)
    t_dist = np.asarray(t_dist)
    counts = np.asarray(ntok, dtype=np.int64)

    # host: flatten compacted token prefixes
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    total_tok = int(counts.sum())
    fp = np.empty(total_tok, dtype=np.int32)
    fl = np.empty(total_tok, dtype=np.int32)
    fd = np.empty(total_tok, dtype=np.int32)
    for i in range(n):
        c = int(counts[i])
        o = int(offsets[i])
        fp[o : o + c] = t_pos[i, :c]
        fl[o : o + c] = t_len[i, :c]
        fd[o : o + c] = t_dist[i, :c]

    payload, sizes = native.encode_token_blocks(
        arr.reshape(-1), bs, params.lc, params.lp, params.pb,
        fp, fl, fd, offsets, counts, num_threads=num_threads,
    )
    head = blk._HEAD.pack(
        blk.MAGIC, blk.VERSION, params.encode_props(), bs, len(data), n
    )
    import struct

    return head + struct.pack(f"<{n}I", *sizes) + payload
