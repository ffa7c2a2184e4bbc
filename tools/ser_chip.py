"""Real-chip A/B for the Pallas serializer (old snapshot vs current).

Usage: python tools/ser_chip.py [lanes blocksize lc]
Expects the pre-change snapshot at /tmp/pallas_serializer_old.py (it is
self-contained — only jax imports); skips the A side if absent.
"""
import importlib.util
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
import jax.numpy as jnp
import numpy as np

from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.core.layout import ProbLayout
from lzma_tpu.ops.device_encoder import _lower_lanes
from lzma_tpu.ops import pallas_serializer as cur


def corpus(n, seed=11):
    import random
    rng = random.Random(seed)
    words = [bytes(rng.randrange(256) for _ in range(rng.randrange(5, 25)))
             for _ in range(40)]
    b = bytearray()
    while len(b) < n:
        b += words[rng.randrange(40)]
    return bytes(b[:n])


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    lc = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    print(f"backend={jax.default_backend()} lanes={lanes} bs={bs} lc={lc}",
          flush=True)
    params = LzmaParams(dict_size=1 << 14, lc=lc, lp=0, pb=2, fast_bytes=32)
    data = np.zeros((lanes, bs), dtype=np.uint8)
    for i in range(lanes):
        data[i] = np.frombuffer(corpus(bs, seed=100 + i), dtype=np.uint8)
    lens = jnp.full((lanes,), bs, dtype=jnp.int32)
    ctx, bits, totals, max_out = _lower_lanes(
        jnp.asarray(data), lens, jnp.int32(1 << 14),
        params.lc, params.lp, params.pb, 32, 4, None)
    jax.block_until_ready(ctx)
    arena = ProbLayout(params.lc, params.lp, params.pb).size
    total_in = lanes * bs

    variants = {"cur": lambda: cur.serialize_pallas(
        ctx, bits, totals, arena, int(max_out))}
    if os.path.exists("/tmp/pallas_serializer_old.py"):
        spec = importlib.util.spec_from_file_location(
            "ser_old", "/tmp/pallas_serializer_old.py")
        old = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(old)
        variants["old"] = lambda: old.serialize_pallas(
            ctx, bits, totals, arena, int(max_out))

    ref = None
    for name in ("old", "cur"):
        if name not in variants:
            continue
        fn = variants[name]
        t0 = time.perf_counter()
        try:
            out, olens, consumed = fn()
            jax.block_until_ready(out)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        compile_s = time.perf_counter() - t0
        assert bool(jnp.all(consumed == totals)), f"{name}: incomplete lanes"
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out, olens, consumed = fn()
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        streams = [np.asarray(out)[i, : int(olens[i])].tobytes()
                   for i in range(lanes)]
        if ref is None:
            ref = streams
        else:
            assert streams == ref, f"{name}: byte mismatch vs other side"
        print(f"{name}: compile+run1 {compile_s:.1f}s  best {best*1e3:.1f}ms"
              f"  {total_in/best/1e6:.2f} MB/s", flush=True)


if __name__ == "__main__":
    main()
