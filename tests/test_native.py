"""Native C++ runtime: byte-identity with the scalar oracle + golden parity.

The native backend must produce EXACTLY the scalar oracle's bytes (same
prob-arena layout, same semantics), which transitively pins it to the
reference Java encoder's golden output.
"""

import hashlib
import lzma

import numpy as np
import pytest

from lzma_tpu.codec.decoder import decode_stream as py_decode
from lzma_tpu.codec.encoder import encode_stream as py_encode
from lzma_tpu.core.rangecoder import CorruptStreamError
from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.parallel import blocks as blk
from lzma_tpu.runtime import native

from conftest import fixture_bytes, has_reference
from test_golden_sizes import BASE, GOLDEN

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def _data(n=60_000, seed=5):
    rng = np.random.default_rng(seed)
    out = bytearray(rng.integers(0, 256, 300, dtype=np.uint8).tobytes())
    while len(out) < n:
        if rng.integers(0, 3):
            start = int(rng.integers(0, len(out)))
            out.extend(out[start : start + int(rng.integers(2, 80))])
        else:
            out.append(int(rng.integers(0, 256)))
    return bytes(out[:n])


@pytest.mark.parametrize("mf", ["bt4", "bt2", "hc4"])
@pytest.mark.parametrize("lc,lp,pb", [(3, 0, 2), (0, 2, 0), (8, 4, 4)])
def test_native_matches_scalar(mf, lc, lp, pb):
    data = _data()
    p = LzmaParams(lc=lc, lp=lp, pb=pb, dict_size=1 << 15, fast_bytes=32, match_finder=mf)
    assert native.encode_stream(data, p) == py_encode(data, p)


@pytest.mark.parametrize("eos", [False, True])
def test_native_eos_matches_scalar(eos):
    data = _data(20_000)
    p = LzmaParams(dict_size=1 << 14, fast_bytes=16, write_eos=eos)
    assert native.encode_stream(data, p) == py_encode(data, p)


def test_native_greedy_matches_scalar():
    data = _data()
    p = LzmaParams(dict_size=1 << 15, fast_bytes=32)
    assert native.encode_stream(data, p, optimal=False) == py_encode(data, p, optimal=False)


def test_native_decode_matches_scalar():
    data = _data()
    p = LzmaParams(dict_size=1 << 15, fast_bytes=32)
    comp = py_encode(data, p)
    assert native.decode_stream(comp, p, len(data)) == data


def test_native_decodes_liblzma():
    data = _data()
    filt = {"id": lzma.FILTER_LZMA1, "lc": 3, "lp": 0, "pb": 2, "dict_size": 1 << 16}
    comp = lzma.compress(data, format=lzma.FORMAT_ALONE, filters=[filt])
    assert native.decode_alone(comp) == data


def test_native_corrupt_detected():
    data = _data()
    p = LzmaParams(dict_size=1 << 15, fast_bytes=32)
    comp = bytearray(py_encode(data, p))
    comp[10] ^= 0xFF
    with pytest.raises(CorruptStreamError):
        native.decode_stream(bytes(comp), p, len(data))


def test_native_blocks_roundtrip_and_interop():
    data = _data(300_000)
    p = LzmaParams(dict_size=1 << 14, fast_bytes=16)
    blob_native = native.encode_blocks(data, p, block_size=1 << 15, num_threads=4)
    blob_py = blk.encode_blocks(data, p, block_size=1 << 15)
    assert blob_native == blob_py  # backends agree bit-for-bit
    assert native.decode_blocks(blob_py, num_threads=4) == data
    assert blk.decode_blocks(blob_native) == data


def test_native_empty_and_tiny():
    p = LzmaParams(dict_size=1 << 12, fast_bytes=8)
    for data in (b"", b"a", b"ab", b"aaaaaaa"):
        assert native.encode_stream(data, p) == py_encode(data, p)
        blob = native.encode_blocks(data, p, block_size=16)
        assert native.decode_blocks(blob) == data


@pytest.mark.skipif(not has_reference(), reason="reference fixture not mounted")
@pytest.mark.parametrize("name", list(GOLDEN))
def test_native_golden_parity_full_sweep(name):
    """All 12 reference golden configs, byte-exact, via the fast native path."""
    over, size, md5 = GOLDEN[name]
    p = LzmaParams(**{**BASE, **over})
    comp = native.encode_alone(fixture_bytes(), p)
    assert len(comp) == size
    assert hashlib.md5(comp).hexdigest() == md5


@pytest.mark.parametrize("mode", ["greedy", "lazy", "optimal"])
@pytest.mark.parametrize("mf", ["bt4", "hc4", "fast4"])
def test_native_modes_match_scalar(mode, mf):
    data = _data(40_000, seed=21)
    p = LzmaParams(dict_size=1 << 14, fast_bytes=32, match_finder=mf)
    assert native.encode_stream(data, p, mode=mode) == py_encode(data, p, mode=mode)


def test_native_eos_decode_roundtrip_and_liblzma():
    import lzma as pylzma

    import numpy as np

    rng = np.random.default_rng(44)
    word = rng.integers(0, 256, 31, dtype=np.uint8).tobytes()
    data = (word * 500)[:12000] + rng.integers(0, 256, 3000, dtype=np.uint8).tobytes()
    p = LzmaParams(dict_size=1 << 16, write_eos=True)
    blob = native.encode_alone(data, p)
    assert blob[5:13] == b"\xff" * 8  # unknown-size header
    assert native.decode_alone(blob) == data
    assert pylzma.decompress(blob, format=pylzma.FORMAT_ALONE) == data
    # liblzma's ALONE containers are EOS-terminated; decode them natively
    lb = pylzma.compress(data, format=pylzma.FORMAT_ALONE, preset=6)
    assert native.decode_alone(lb) == data


def test_native_eos_decode_growth_loop():
    # high-ratio stream forces the capacity-retry path (-6)
    data = b"B" * (2 << 20)
    blob = native.encode_alone(data, LzmaParams(dict_size=1 << 16, write_eos=True))
    assert native.decode_alone(blob) == data


def test_top_level_api_routes_native_and_matches_scalar():
    import lzma_tpu

    data = fixture_bytes()[:40000]
    p = LzmaParams(dict_size=1 << 16, fast_bytes=32)
    blob = lzma_tpu.compress(data, p)
    # top-level output must equal the scalar oracle's container byte-for-byte
    from lzma_tpu.codec.encoder import encode_alone as scalar_alone

    assert blob == scalar_alone(data, p)
    assert lzma_tpu.decompress(blob) == data


def test_native_decode_alone_rejects_forged_size():
    """A tiny forged .lzma claiming a TB-scale size must raise
    CorruptStreamError BEFORE the upfront output allocation."""
    forged = (LzmaParams().encode_props()
              + (1 << 40).to_bytes(8, "little") + b"\x00" * 8)
    with pytest.raises(CorruptStreamError):
        native.decode_alone(forged)
    # >= 2^63 must not surface as ctypes OverflowError either
    forged63 = (LzmaParams().encode_props()
                + (1 << 63).to_bytes(8, "little") + b"\x00" * 8)
    with pytest.raises(CorruptStreamError):
        native.decode_alone(forged63)


def test_native_block_size_validated():
    for bs in (0, -5):
        with pytest.raises(ValueError):
            native.encode_blocks(b"x" * 100, LzmaParams(), block_size=bs)
        with pytest.raises(ValueError):
            native.encode_block_payload_pre(
                b"x" * 100, b"pre", LzmaParams(), bs)
