"""Randomized cross-validation: random params x random corpora vs liblzma.

Property: for ANY valid parameter set and input, our encoder's output
must decode bit-exactly via (a) our decoder, (b) our native decoder,
(c) stock liblzma; and our decoder must decode liblzma's output.
"""

import lzma

import numpy as np
import pytest

from lzma_tpu.codec.decoder import decode_alone, decode_stream
from lzma_tpu.codec.encoder import encode_alone
from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.runtime import native


def _random_params(rng):
    return LzmaParams(
        lc=int(rng.integers(0, 9)),
        lp=int(rng.integers(0, 5)),
        pb=int(rng.integers(0, 5)),
        dict_size=1 << int(rng.integers(0, 22)),
        fast_bytes=int(rng.integers(5, 274)),
        match_finder=["bt2", "bt4", "hc4"][int(rng.integers(0, 3))],
        write_eos=bool(rng.integers(0, 2)),
    )


def _random_corpus(rng):
    kind = int(rng.integers(0, 4))
    n = int(rng.integers(0, 20000))
    if kind == 0:
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == 1:
        alphabet = rng.integers(0, 256, int(rng.integers(1, 5)), dtype=np.uint8).tobytes()
        return (alphabet * (n // max(len(alphabet), 1) + 1))[:n]
    if kind == 2:
        out = bytearray(rng.integers(0, 256, min(64, n + 1), dtype=np.uint8).tobytes())
        while len(out) < n:
            s = int(rng.integers(0, len(out)))
            out.extend(out[s : s + int(rng.integers(1, 300))])
        return bytes(out[:n])
    return (b"variable length words " * 2000)[:n]


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_roundtrip(seed):
    rng = np.random.default_rng(1000 + seed)
    p = _random_params(rng)
    data = _random_corpus(rng)
    comp = encode_alone(data, p)
    assert decode_alone(comp) == data
    if native.available():
        assert native.decode_alone(comp) == data
    if p.lc + p.lp <= 4:
        assert lzma.decompress(comp, format=lzma.FORMAT_ALONE) == data


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_decode_liblzma(seed):
    rng = np.random.default_rng(2000 + seed)
    data = _random_corpus(rng)
    lc = int(rng.integers(0, 5))
    lp = int(rng.integers(0, 5 - lc))
    filt = {
        "id": lzma.FILTER_LZMA1,
        "lc": lc,
        "lp": lp,
        "pb": int(rng.integers(0, 5)),
        "dict_size": 1 << int(rng.integers(12, 24)),
    }
    comp = lzma.compress(data, format=lzma.FORMAT_ALONE, filters=[filt])
    assert decode_alone(comp) == data


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_corrupt_never_crashes(seed):
    """Arbitrary corruption must raise a typed error or produce different
    output — never crash the process or hang."""
    rng = np.random.default_rng(3000 + seed)
    data = _random_corpus(rng)
    p = LzmaParams(dict_size=1 << 14, fast_bytes=16)
    comp = bytearray(encode_alone(data, p))
    if len(comp) > 14:
        for _ in range(4):
            comp[int(rng.integers(13, len(comp)))] ^= int(rng.integers(1, 256))
    try:
        out = decode_alone(bytes(comp))
        assert isinstance(out, bytes)
    except Exception as e:
        assert type(e).__name__ in ("CorruptStreamError", "ValueError", "IndexError")
