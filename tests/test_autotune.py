"""Measured lc/lp/pb selection (utils/autotune.py)."""

import subprocess
import sys

import numpy as np

import lzma_tpu
from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.utils.autotune import select_params


def _word_binary(n, stride=4, seed=3):
    # word-aligned records: every `stride`-th byte is a high-entropy
    # payload byte, the rest is structure — the lp-wins regime
    rng = np.random.default_rng(seed)
    rec = np.zeros((n // stride, stride), dtype=np.uint8)
    rec[:, 0] = rng.integers(0, 256, n // stride)
    rec[:, 1] = np.arange(n // stride) & 0xFF
    return rec.tobytes()


def _text(n, seed=4):
    rng = np.random.default_rng(seed)
    words = [rng.integers(97, 123, int(k), dtype=np.uint8).tobytes()
             for k in rng.integers(3, 11, 50)]
    b = bytearray()
    while len(b) < n:
        b += words[int(rng.integers(0, 50))] + b" "
    return bytes(b[:n])


def test_select_params_moves_on_aligned_binary():
    data = _word_binary(1 << 16)
    base = LzmaParams(dict_size=1 << 16, fast_bytes=16)
    tuned = select_params(data, base, sample_size=1 << 14)
    # the tuned triple must never be measurably worse than the default
    a = len(lzma_tpu.compress(data, base))
    b = len(lzma_tpu.compress(
        data, LzmaParams(lc=tuned.lc, lp=tuned.lp, pb=tuned.pb,
                         dict_size=1 << 16, fast_bytes=16)))
    assert b <= a * 1.002
    # non-lc/lp/pb fields pass through
    assert tuned.dict_size == 1 << 16 and tuned.fast_bytes == 16


def test_select_params_margin_keeps_base():
    # the margin rule pins the baseline unless a candidate wins by more
    # than `margin` — with a huge margin nothing can displace it
    data = _word_binary(1 << 16)
    tuned = select_params(data, LzmaParams(dict_size=1 << 16, fast_bytes=16),
                          sample_size=1 << 14, margin=10.0)
    assert (tuned.lc, tuned.lp, tuned.pb) == (3, 0, 2)


def test_compress_params_auto_roundtrip():
    data = _word_binary(1 << 15) + _text(1 << 15)
    for container in ("alone", "lztb"):
        blob = lzma_tpu.compress(data, params="auto", container=container,
                                 block_size=1 << 14)
        assert lzma_tpu.decompress(blob) == data


def test_compress_file_params_auto(tmp_path):
    data = _word_binary(1 << 15)
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.lztb"
    src.write_bytes(data)
    lzma_tpu.compress_file(str(src), str(dst), params="auto",
                           block_size=1 << 14)
    out = tmp_path / "rt.bin"
    lzma_tpu.decompress_file(str(dst), str(out))
    assert out.read_bytes() == data


def test_cli_tune_switch(tmp_path):
    data = _word_binary(1 << 15)
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    dst = tmp_path / "out.lzma"
    r = subprocess.run(
        [sys.executable, "-m", "lzma_tpu", "e", "-tune", "-d16",
         str(src), str(dst)],
        capture_output=True, text=True, check=True)
    assert "tuned:" in r.stdout
    rt = tmp_path / "rt.bin"
    subprocess.run(
        [sys.executable, "-m", "lzma_tpu", "d", str(dst), str(rt)],
        capture_output=True, check=True)
    assert rt.read_bytes() == data
