"""Benchmark subsystem: exact PRNG semantics, ratings, harness smoke."""

import pytest

from lzma_tpu.bench.datagen import MwcRandom, generate_bench_data
from lzma_tpu.bench.rating import compress_rating, decompress_rating, speed_kb_s
from lzma_tpu.utils.crc import crc32


def test_mwc_first_values():
    """First outputs of the two-stream MWC PRNG (LzmaBench.java:15-33),
    computed by hand from the recurrence with 32-bit wrap-around."""
    rg = MwcRandom()
    a1, a2 = 362436069, 521288629
    expected = []
    M = 0xFFFFFFFF
    for _ in range(5):
        a1 = (36969 * (a1 & 0xFFFF) + (a1 >> 16)) & M
        a2 = (18000 * (a2 & 0xFFFF) + (a2 >> 16)) & M
        expected.append(((a1 << 16) ^ a2) & M)
    assert [rg.next() for _ in range(5)] == expected


def test_bench_data_deterministic_and_structured():
    a = generate_bench_data(1 << 16)
    b = generate_bench_data(1 << 16)
    assert a == b
    assert crc32(a) == crc32(b)
    # LZ-structured: must compress far better than random bytes
    import lzma

    ratio = len(lzma.compress(a)) / len(a)
    assert ratio < 0.8


def test_bench_data_prefix_stability():
    """Generator state depends only on the PRNG stream, but match copies are
    clamped at the buffer end, so prefixes agree up to near the tail."""
    a = generate_bench_data(1 << 12)
    b = generate_bench_data(1 << 13)
    assert b[: (1 << 12) - 64].startswith(a[: (1 << 12) - 64])


def test_rating_formulas():
    # 2^22 dict: GetLogSize = 22<<8, t = 4<<8, cmds/B = 1060 + (4<<8)^2*10>>16 = 1220
    assert compress_rating(1 << 22, 1000, 1000) == 1000 * 1220
    assert decompress_rating(1000, 100, 10) == 10 * 220 + 100 * 20
    assert speed_kb_s(1 << 20, 1000) == 1024


@pytest.mark.slow
def test_harness_smoke():
    from lzma_tpu.bench.harness import run_benchmark
    from lzma_tpu.format.properties import LzmaParams

    # tiny pass over the min dict with the fast finder: validates CRC loop
    res = run_benchmark(
        1,
        1 << 18,
        params=LzmaParams(dict_size=1 << 18, fast_bytes=16, match_finder="hc4"),
        out=lambda *_: None,
    )
    assert len(res.passes) == 1


def test_total_rating_is_mean_of_parts():
    from lzma_tpu.bench.rating import total_rating

    c = compress_rating(1 << 22, 500, 1 << 20)
    d = decompress_rating(250, 1 << 20, 1 << 18)
    assert total_rating(1 << 22, 500, 1 << 20, 250, 1 << 18, 1 << 20) == (c + d) // 2


def test_sweep_smoke(capsys=None):
    from lzma_tpu.bench import sweep

    data = sweep.mixed_corpus(1 << 18)
    assert len(data) == 1 << 18
    lines = []
    from lzma_tpu.format.properties import LzmaParams

    r, e, d = sweep._run(data, LzmaParams(dict_size=1 << 16, fast_bytes=16), 1 << 16)
    assert r > 1.0 and e > 0 and d > 0
