"""Price-model golden vectors (BitTreeEncoderLearningTest.java:14-32)."""

import numpy as np

from lzma_tpu.core.prices import PRICE_TABLE, PROB_INIT, price, price0, price1
from lzma_tpu.core.rangecoder import RangeEncoder


def _tree_price(probs, nbits, symbol):
    p = 0
    m = 1
    for i in range(nbits - 1, -1, -1):
        bit = (symbol >> i) & 1
        p += price(int(probs[m]), bit)
        m = (m << 1) + bit
    return p


def test_bittree_prices_after_one_encode():
    probs = np.full(1 << 3, PROB_INIT, dtype=np.uint16)
    rc = RangeEncoder()
    rc.encode_tree(probs, 0, 3, 3)
    expected = [194, 194, 192, 186, 196, 196, 196, 196]
    assert [_tree_price(probs, 3, s) for s in range(8)] == expected


def test_price_symmetry_at_init():
    assert price0(PROB_INIT) == price1(PROB_INIT) == 64  # half prob = 1 bit = 64 units


def test_price_table_shape_and_monotonicity():
    assert PRICE_TABLE.shape == (512,)
    # price of a 0-bit decreases as prob of 0 grows
    probs = np.arange(64, 2048, 64)
    costs = [price0(int(p)) for p in probs]
    assert all(a >= b for a, b in zip(costs, costs[1:]))
