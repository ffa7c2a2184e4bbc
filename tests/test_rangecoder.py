"""Range-coder golden vectors.

Pins our coder bit-for-bit to the reference's learning-test vectors
(EncoderLearningTest.java:29-73): adaptive-bit sequences on a fresh prob,
direct-bits split/joint equivalence, and the always-0x00 first byte.
"""

import numpy as np
import pytest

from lzma_tpu.core.prices import PROB_INIT
from lzma_tpu.core.rangecoder import RangeDecoder, RangeEncoder


def _encode_bits(bits):
    probs = np.full(12, PROB_INIT, dtype=np.uint16)
    rc = RangeEncoder()
    for b in bits:
        rc.encode_bit(probs, 4, b)
    rc.flush()
    return bytes(rc.out)


@pytest.mark.parametrize(
    "bits,expected",
    [
        ([0, 0, 0], "00 00 00 00 00"),
        ([1, 1, 1], "00 dc f8 3c 00"),          # EncoderLearningTest.java:36
        ([], "00 00 00 00 00"),
        ([0], "00 00 00 00 00"),
        ([1], "00 7f ff fc 00"),
        ([0, 1] * 5, "00 56 fa d6 38 2c"),
        ([1] * 10, "00 ff 2e 08 28 00"),
        ([0, 1] * 10, "00 57 0d 5d 83 4f 8e"),
        ([1] * 20, "00 ff fb 88 c9 99"),
    ],
)
def test_adaptive_bit_golden(bits, expected):
    assert _encode_bits(bits).hex(" ") == expected


def test_direct_bits_split_equals_joint():
    # EncoderLearningTest.java:60-73
    rc = RangeEncoder()
    rc.encode_direct_bits(0x1, 2)
    rc.encode_direct_bits(0xD, 4)
    rc.flush()
    split = bytes(rc.out)
    rc2 = RangeEncoder()
    rc2.encode_direct_bits(0x1D, 6)
    rc2.flush()
    assert split == bytes(rc2.out)
    assert split.hex(" ") == "00 73 ff ff fc"


def test_prob_adaptation_rate():
    """p += (2048-p)>>5 on 0; p -= p>>5 on 1 (RangeEncoder.java:44,48)."""
    probs = np.full(1, PROB_INIT, dtype=np.uint16)
    rc = RangeEncoder()
    rc.encode_bit(probs, 0, 0)
    assert probs[0] == 1024 + ((2048 - 1024) >> 5)
    rc.encode_bit(probs, 0, 1)
    assert probs[0] == 1056 - (1056 >> 5)


@pytest.mark.parametrize("seed", range(5))
def test_encode_decode_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, size=500).tolist()
    idxs = rng.integers(0, 12, size=500).tolist()
    probs = np.full(12, PROB_INIT, dtype=np.uint16)
    rc = RangeEncoder()
    for b, i in zip(bits, idxs):
        rc.encode_bit(probs, i, b)
    direct = int(rng.integers(0, 1 << 30))
    rc.encode_direct_bits(direct, 30)
    rc.flush()

    probs2 = np.full(12, PROB_INIT, dtype=np.uint16)
    rd = RangeDecoder(bytes(rc.out))
    out = [rd.decode_bit(probs2, i) for i in idxs]
    assert out == bits
    assert rd.decode_direct_bits(30) == direct
    assert np.array_equal(probs, probs2)


def test_tree_roundtrip():
    probs = np.full(64, PROB_INIT, dtype=np.uint16)
    rc = RangeEncoder()
    symbols = [0, 31, 63, 17, 5, 63, 0]
    for s in symbols:
        rc.encode_tree(probs, 0, 6, s)
    rsyms = [9, 0, 15, 7]
    for s in rsyms:
        rc.encode_tree_reverse(probs, 16, 4, s)
    rc.flush()
    probs2 = np.full(64, PROB_INIT, dtype=np.uint16)
    rd = RangeDecoder(bytes(rc.out))
    assert [rd.decode_tree(probs2, 0, 6) for _ in symbols] == symbols
    assert [rd.decode_tree_reverse(probs2, 16, 4) for _ in rsyms] == rsyms
