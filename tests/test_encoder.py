"""Encoder round-trips, liblzma cross-validation, parameter sweep."""

import lzma

import numpy as np
import pytest

from lzma_tpu.codec.decoder import decode_alone
from lzma_tpu.codec.encoder import LzmaEncoder, encode_alone, encode_stream
from lzma_tpu.codec.decoder import decode_stream
from lzma_tpu.format.properties import LzmaParams


def _data(kind="text", n=20000):
    if kind == "text":
        return (b"compression ratio parity requires exact semantics " * 500)[:n]
    rng = np.random.default_rng(3)
    if kind == "lz":
        # match-rich synthetic data
        out = bytearray(rng.integers(0, 256, 256, dtype=np.uint8).tobytes())
        while len(out) < n:
            if rng.integers(0, 2):
                start = int(rng.integers(0, len(out)))
                ln = int(rng.integers(2, 100))
                out.extend(out[start : start + ln])
            else:
                out.append(int(rng.integers(0, 256)))
        return bytes(out[:n])
    return rng.integers(0, 256, n, dtype=np.uint8).tobytes()


@pytest.mark.parametrize("mf", ["bt4", "bt2", "hc4", "fast4"])
@pytest.mark.parametrize("eos", [False, True])
def test_roundtrip_all_finders(mf, eos):
    data = _data("lz")
    p = LzmaParams(dict_size=1 << 16, fast_bytes=32, match_finder=mf, write_eos=eos)
    comp = encode_alone(data, p)
    assert decode_alone(comp) == data
    assert lzma.decompress(comp, format=lzma.FORMAT_ALONE) == data


@pytest.mark.parametrize(
    "lc,lp,pb", [(0, 0, 0), (8, 0, 0), (0, 4, 0), (0, 0, 4), (1, 1, 1), (3, 0, 2)]
)
def test_roundtrip_lclppb_sweep(lc, lp, pb):
    data = _data("text")
    p = LzmaParams(lc=lc, lp=lp, pb=pb, dict_size=1 << 15, fast_bytes=16)
    comp = encode_alone(data, p)
    assert decode_alone(comp) == data
    if lc + lp <= 4:  # liblzma rejects lc+lp>4; the format (and we) allow it
        assert lzma.decompress(comp, format=lzma.FORMAT_ALONE) == data


@pytest.mark.parametrize("n", [0, 1, 2, 3, 5, 13])
def test_tiny_inputs(n):
    data = bytes(range(n))
    for eos in (False, True):
        p = LzmaParams(dict_size=1 << 12, fast_bytes=8, write_eos=eos)
        comp = encode_alone(data, p)
        assert decode_alone(comp) == data
        assert lzma.decompress(comp, format=lzma.FORMAT_ALONE) == data


@pytest.mark.parametrize("dict_log", [0, 4, 12, 20])
def test_dict_sizes(dict_log):
    data = _data("lz", 30000)
    p = LzmaParams(dict_size=1 << dict_log, fast_bytes=32)
    comp = encode_alone(data, p)
    assert decode_alone(comp) == data
    assert lzma.decompress(comp, format=lzma.FORMAT_ALONE) == data


@pytest.mark.parametrize("fb", [5, 32, 273])
def test_fast_bytes_extremes(fb):
    data = _data("lz")
    p = LzmaParams(dict_size=1 << 16, fast_bytes=fb)
    comp = encode_alone(data, p)
    assert decode_alone(comp) == data


def test_optimal_beats_greedy():
    data = _data("lz", 50000)
    p = LzmaParams(dict_size=1 << 16, fast_bytes=64)
    opt = encode_stream(data, p, optimal=True)
    greedy = encode_stream(data, p, optimal=False)
    assert len(opt) <= len(greedy)
    assert decode_stream(opt, p, out_size=len(data)) == data
    assert decode_stream(greedy, p, out_size=len(data)) == data


def test_incompressible_expansion_bounded():
    data = _data("random", 10000)
    comp = encode_alone(data, LzmaParams(dict_size=1 << 14, fast_bytes=16))
    assert len(comp) < len(data) * 1.1 + 64


def test_param_validation():
    with pytest.raises(ValueError):
        LzmaParams(lc=9).validated_for_encode()
    with pytest.raises(ValueError):
        LzmaParams(lp=5).validated_for_encode()
    with pytest.raises(ValueError):
        LzmaParams(pb=5).validated_for_encode()
    with pytest.raises(ValueError):
        LzmaParams(fast_bytes=4).validated_for_encode()
    with pytest.raises(ValueError):
        LzmaParams(fast_bytes=274).validated_for_encode()
    with pytest.raises(ValueError):
        LzmaParams(dict_size=1 << 30).validated_for_encode()


@pytest.mark.parametrize("mode", ["greedy", "lazy", "optimal"])
def test_parse_mode_ladder(mode):
    data = _data("lz", 40000)
    p = LzmaParams(dict_size=1 << 15, fast_bytes=32)
    comp = encode_stream(data, p, mode=mode)
    assert decode_stream(comp, p, out_size=len(data)) == data
    assert lzma.decompress(
        p.encode_props() + len(data).to_bytes(8, "little") + comp,
        format=lzma.FORMAT_ALONE,
    ) == data


def test_mode_ratio_ordering():
    data = _data("lz", 60000)
    p = LzmaParams(dict_size=1 << 15, fast_bytes=64)
    sizes = {
        m: len(encode_stream(data, p, mode=m)) for m in ("greedy", "lazy", "optimal")
    }
    assert sizes["optimal"] <= sizes["lazy"] <= sizes["greedy"] * 1.02


def test_invalid_mode_rejected():
    with pytest.raises(ValueError):
        LzmaEncoder(LzmaParams(), mode="turbo")
