"""Pallas range-coder serializer vs the XLA reference (interpret mode).

On the CPU test mesh the kernel runs through the Pallas interpreter; the
same code lowers through Mosaic on TPU (exercised by bench.py).  The
contract: byte-identical output to device_encoder.serialize, and the
consumed-bits report that gates the safe fallback.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lzma_tpu.core.layout import ProbLayout
from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.ops.device_encoder import classify_tokens, lower_tokens, serialize
from lzma_tpu.ops.device_matcher import tokenize
from lzma_tpu.ops.pallas_serializer import serialize_pallas, serialize_with_fallback


def _bit_streams(n_lanes=4, max_n=2048, seed=0, lc=3, lp=0, pb=2):
    rng = np.random.default_rng(seed)
    words = [rng.integers(0, 256, int(rng.integers(3, 30)), dtype=np.uint8).tobytes() for _ in range(32)]
    data = np.zeros((n_lanes, max_n), dtype=np.uint8)
    for i in range(n_lanes):
        b = bytearray()
        while len(b) < max_n:
            b.extend(words[int(rng.integers(0, 32))])
        data[i] = np.frombuffer(bytes(b[:max_n]), dtype=np.uint8)
    dj = jnp.asarray(data)
    lens = jnp.full((n_lanes,), max_n, jnp.int32)
    t_pos, t_len, t_dist, t_valid, _ = jax.vmap(
        lambda d, n: tokenize(d, n, max_n, 32, 2)
    )(dj, lens)
    meta = classify_tokens(dj, t_pos, t_len, t_dist, t_valid)
    ctx, bits, totals = lower_tokens(
        dj, meta, t_pos, t_len, t_dist, t_valid, lc, lp, pb, 10 * max_n + 128
    )
    layout = ProbLayout(lc, lp, pb, pos_bits=pb)
    return ctx, bits, totals, layout.size, max_n + max_n // 4 + 128


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_serializer_bit_exact(seed):
    ctx, bits, totals, arena, mo = _bit_streams(seed=seed)
    ref_out, ref_lens = serialize(ctx, bits, totals, arena, mo)
    pl_out, pl_lens, consumed = serialize_pallas(
        ctx, bits, totals, arena, mo, interpret=True
    )
    assert bool(jnp.all(consumed == totals))
    assert bool(jnp.all(pl_lens == ref_lens))
    po, ro = np.asarray(pl_out), np.asarray(ref_out)
    for i in range(po.shape[0]):
        n = int(ref_lens[i])
        assert po[i, :n].tobytes() == ro[i, :n].tobytes()


@pytest.mark.parametrize("n_lanes", [3, 12])
def test_pallas_serializer_unaligned_lanes(n_lanes):
    """Lane counts that aren't sublane (8) multiples must pad internally —
    unaligned scratch tiles fail Mosaic lowering on real hardware — and
    slice back to exactly the caller's lanes."""
    ctx, bits, totals, arena, mo = _bit_streams(n_lanes=n_lanes, seed=5)
    ref_out, ref_lens = serialize(ctx, bits, totals, arena, mo)
    pl_out, pl_lens, consumed = serialize_pallas(
        ctx, bits, totals, arena, mo, interpret=True
    )
    assert pl_out.shape[0] == n_lanes and pl_lens.shape[0] == n_lanes
    assert bool(jnp.all(consumed == totals))
    assert bool(jnp.all(pl_lens == ref_lens))
    po, ro = np.asarray(pl_out), np.asarray(ref_out)
    for i in range(n_lanes):
        n = int(ref_lens[i])
        assert po[i, :n].tobytes() == ro[i, :n].tobytes()


def test_pallas_fallback_wrapper():
    ctx, bits, totals, arena, mo = _bit_streams(seed=7)
    ref_out, ref_lens = serialize(ctx, bits, totals, arena, mo)
    out, lens = serialize_with_fallback(ctx, bits, totals, arena, mo)
    assert bool(jnp.all(lens == ref_lens))
    po, ro = np.asarray(out), np.asarray(ref_out)
    for i in range(po.shape[0]):
        n = int(ref_lens[i])
        assert po[i, :n].tobytes() == ro[i, :n].tobytes()
