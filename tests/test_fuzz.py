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
        match_finder=["bt2", "bt4", "hc4", "fast4"][int(rng.integers(0, 4))],
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


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_preset_roundtrip(seed):
    """Random params x corpora with a random preset dictionary: scalar and
    native must agree byte-for-byte and cross-decode."""
    rng = np.random.default_rng(4000 + seed)
    p = _random_params(rng)
    data = _random_corpus(rng)
    preset = _random_corpus(rng)[: int(rng.integers(0, 8192))]
    from lzma_tpu.codec.encoder import encode_stream as s_enc
    comp = s_enc(data, p, preset=preset)
    assert decode_stream(comp, p, out_size=len(data), preset=preset) == data
    if native.available():
        n_comp = native.encode_stream(data, p, preset=preset)
        assert n_comp == comp
        if not p.write_eos:
            assert native.decode_stream(comp, p, len(data), preset=preset) == data


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_corrupt_v2_container_never_crashes(seed):
    """Arbitrary corruption of an LZTB v2 container (header, size table,
    preset field, payload) must raise a typed error or produce different
    output — never crash the native runtime or hang."""
    if not native.available():
        pytest.skip("native runtime unavailable")
    from lzma_tpu.parallel import blocks as blk

    rng = np.random.default_rng(5000 + seed)
    data = _random_corpus(rng)
    p = LzmaParams(dict_size=1 << 14, fast_bytes=16)
    blob = bytearray(
        native.encode_blocks(data, p, block_size=1 << 12,
                             preset_len=int(rng.integers(1, 1 << 12)))
    )
    for _ in range(6):
        blob[int(rng.integers(0, len(blob)))] ^= int(rng.integers(1, 256))
    try:
        out = native.decode_blocks(bytes(blob))
        assert isinstance(out, bytes)
    except Exception as e:
        assert type(e).__name__ in (
            "CorruptStreamError", "ValueError", "IndexError", "error",
            "struct.error",
        ), type(e).__name__


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_corrupt_v3_container_never_crashes(seed):
    """Arbitrary corruption of an LZTB v3 container (header, dict fields,
    dict stream, size table, payload) must raise a typed error or produce
    different output — never crash the native runtime or hang."""
    if not native.available():
        pytest.skip("native runtime unavailable")

    rng = np.random.default_rng(6000 + seed)
    data = _random_corpus(rng)
    p = LzmaParams(dict_size=1 << 14, fast_bytes=16)
    dict_len = int(rng.integers(1, 4096))
    dictionary = _random_corpus(rng)[:dict_len] or b"\x00"
    blob = bytearray(
        native.encode_blocks(data, p, block_size=1 << 12,
                             dictionary=dictionary)
    )
    for _ in range(6):
        blob[int(rng.integers(0, len(blob)))] ^= int(rng.integers(1, 256))
    try:
        out = native.decode_blocks(bytes(blob))
        assert isinstance(out, bytes)
    except Exception as e:
        assert type(e).__name__ in (
            "CorruptStreamError", "ValueError", "IndexError", "error",
            "struct.error",
        ), type(e).__name__


def test_forged_total_size_rejected_before_allocation():
    """A forged multi-GB total_size in a tiny container must be rejected
    by the expansion bound, not attempted as an allocation."""
    import struct

    from lzma_tpu.core.rangecoder import CorruptStreamError
    from lzma_tpu.parallel import blocks as blk

    p = LzmaParams(dict_size=1 << 14, fast_bytes=16)
    if native.available():
        blob = bytearray(native.encode_blocks(b"x" * 5000, p, block_size=1 << 12))
    else:
        blob = bytearray(blk.encode_blocks(b"x" * 5000, p, block_size=1 << 12))
    struct.pack_into("<Q", blob, 14, 1 << 60)  # total_size field
    with pytest.raises(CorruptStreamError):
        blk.parse_container(bytes(blob))
    if native.available():
        with pytest.raises(CorruptStreamError):
            native.decode_blocks(bytes(blob))


def test_forged_block_geometry_rejected():
    """Forged block_size/num_blocks vs total_size (the heap-overflow
    geometry: block i writes at i*block_size into a total_size buffer)
    must be rejected by every container entry point."""
    import struct

    from lzma_tpu.core.rangecoder import CorruptStreamError
    from lzma_tpu.parallel import blocks as blk

    p = LzmaParams(dict_size=1 << 14, fast_bytes=16)
    enc = native.encode_blocks if native.available() else blk.encode_blocks
    blob = bytearray(enc(b"y" * 5000, p, block_size=1 << 12))
    # total_size=100 with block_size=2**20 and the real num_blocks=2
    struct.pack_into("<I", blob, 10, 1 << 20)   # block_size
    struct.pack_into("<Q", blob, 14, 100)       # total_size
    for fn in ([native.decode_blocks] if native.available() else []) + [
        blk.decode_blocks, blk.parse_container,
    ]:
        with pytest.raises(CorruptStreamError):
            fn(bytes(blob))


def test_native_block_encode_rejects_invalid_params():
    """The block C entry points validate params like the single-stream
    ones (fb beyond 273 would overflow fixed-size price tables)."""
    if not native.available():
        pytest.skip("native runtime unavailable")
    import dataclasses

    good = LzmaParams(dict_size=1 << 14, fast_bytes=16)
    bad = dataclasses.replace(good, fast_bytes=500)
    with pytest.raises(ValueError):
        native.encode_block_payload(b"z" * 1000, bad, 1 << 12)
    with pytest.raises(ValueError):
        native.encode_block_payload_pre(b"z" * 1000, b"pre", bad, 1 << 12)


def test_scalar_decode_enforces_declared_size():
    """Scalar decode must error (like the native -5/-9 paths) instead of
    silently returning wrong-length data."""
    from lzma_tpu.codec.encoder import encode_stream as s_enc
    from lzma_tpu.core.rangecoder import CorruptStreamError

    p = LzmaParams(dict_size=1 << 12, fast_bytes=16)
    data = (b"abcd" * 600)[:2000]
    comp = s_enc(data, p)
    # claim fewer bytes than the stream produces, cutting mid-match (the
    # parse opens with 5 literals, so 6 lands inside the first match)
    with pytest.raises(CorruptStreamError):
        decode_stream(comp, p, out_size=6)
    # EOS marker before the declared size
    p_eos = LzmaParams(dict_size=1 << 12, fast_bytes=16, write_eos=True)
    comp_eos = s_enc(data, p_eos)
    with pytest.raises(CorruptStreamError):
        decode_stream(comp_eos, p_eos, out_size=len(data) + 50)
