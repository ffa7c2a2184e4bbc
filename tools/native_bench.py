#!/usr/bin/env python
"""Focused native-runtime micro-benchmark for optimization work.

Measures single-thread and all-core encode/decode MB/s on the synthetic
LzmaBench corpus for the bench-relevant profiles (greedy hc4 fb=8 fast
profile, bt4 optimal), CRC-checked.  Used to compare native-code changes
(e.g. PGO builds) against the committed baseline.
"""

import sys
import time

sys.path.insert(0, ".")

from lzma_tpu.bench.datagen import generate_bench_data
from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.runtime import native
from lzma_tpu.utils.crc import crc32


def timed(fn, repeat=3):
    best = float("inf")
    out = None
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    size = 8 << 20
    data = generate_bench_data(size)
    digest = crc32(data)
    rows = []
    fast = LzmaParams(dict_size=1 << 20, fast_bytes=8, match_finder="hc4")
    norm = LzmaParams(dict_size=1 << 20, fast_bytes=32, match_finder="bt4")
    for label, params, optimal in (
        ("hc4-greedy-fb8", fast, False),
        ("bt4-optimal", norm, True),
    ):
        for nt in (1, 0):  # 1 thread, all cores
            blob, t_enc = timed(
                lambda: native.encode_blocks(
                    data, block_size=1 << 20, params=params,
                    optimal=optimal, num_threads=nt))
            out, t_dec = timed(
                lambda: native.decode_blocks(blob, num_threads=nt))
            assert crc32(out) == digest
            rt = size / (t_enc + t_dec) / 1e6
            rows.append((label, nt, size / t_enc / 1e6, size / t_dec / 1e6,
                         rt, size / len(blob)))
    print(f"{'profile':<16} {'nt':>2} {'enc':>7} {'dec':>7} {'rt':>7} {'ratio':>6}")
    for label, nt, enc, dec, rt, ratio in rows:
        print(f"{label:<16} {nt:>2} {enc:7.1f} {dec:7.1f} {rt:7.1f} {ratio:6.3f}")


if __name__ == "__main__":
    main()
