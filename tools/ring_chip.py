"""Real-chip validation + A/B for the ring-window Pallas decoder.

Usage: python tools/ring_chip.py [lanes blocksize dictlog lc]
Round-trips the ring kernel (both staging modes) on the real TPU and
A/Bs its rate against the v1 whole-block Pallas kernel on the same data.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
import numpy as np

from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.runtime import native
from lzma_tpu.ops.pallas_decoder import decode_batch_pallas
from lzma_tpu.ops.pallas_ring import decode_batch_ring


def corpus(n, seed=11):
    import random
    rng = random.Random(seed)
    words = [bytes(rng.randrange(256) for _ in range(rng.randrange(5, 25)))
             for _ in range(40)]
    b = bytearray()
    while len(b) < n:
        b += words[rng.randrange(40)]
    return bytes(b[:n])


def timed(fn, warm=1, reps=3):
    for _ in range(warm):
        fn()
    best = min(time.perf_counter() - t0
               for _ in range(reps)
               if (t0 := time.perf_counter()) or True
               for _ in [fn()])
    return best


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    dlog = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    lc = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    which = sys.argv[5] if len(sys.argv) > 5 else "all"
    print(f"backend={jax.default_backend()} lanes={lanes} bs={bs} "
          f"dict=2^{dlog} lc={lc}", flush=True)
    params = LzmaParams(dict_size=1 << dlog, lc=lc, lp=0, pb=2, fast_bytes=16)
    blocks = [corpus(bs, seed=100 + i) for i in range(lanes)]
    streams = [native.encode_stream(b, params, optimal=False) for b in blocks]
    sizes = [len(b) for b in blocks]
    total = sum(sizes)

    variants = [
        ("ring(stage)", lambda: decode_batch_ring(
            streams, params, sizes, fallback=False, stage_input=True,
            max_group=lanes)),
        ("ring(nostage)", lambda: decode_batch_ring(
            streams, params, sizes, fallback=False, stage_input=False,
            max_group=lanes)),
        ("v1", lambda: decode_batch_pallas(
            streams, params, sizes, fallback=False, max_group=lanes)),
    ]
    if which != "all":
        variants = [v for v in variants
                    if which in v[0].replace("(", "").replace(")", "")]
    for name, fn in variants:
        t0 = time.perf_counter()
        try:
            out = fn()
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        compile_s = time.perf_counter() - t0
        assert out == blocks, f"{name} round-trip mismatch"
        best = timed(fn)
        print(f"{name}: ok  compile+run1 {compile_s:.1f}s  "
              f"best {best*1e3:.1f}ms  {total/best/1e6:.2f} MB/s", flush=True)


if __name__ == "__main__":
    main()
