"""Round-2 chip sweep of the PACKED ring decoder at large lane counts.

The packed memory plan (b4783a9) dropped VMEM/lane ~4x and the
per-lane per-iteration slope to ~16-17 ns; this sweep records the
resulting MB/s at the lane counts the old kernel could not fit, in both
input modes (post-packing the unstaged input gather is a larger share of
the slope, so staged may now win).

Usage: python tools/lane_scale2.py [configs...]
  config = lc,n,staged  e.g. 0,128,un  0,256,st
Defaults cover the champion chase: lc0 x {64,128,256} x {un,st} + lc3 256.
Set CORPUS=words for ring_chip's word corpus (the round-1 champion
fixture: 40 random 5-25 byte words repeated — long matches), default is
the LzmaBench datagen corpus.
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
import jax.numpy as jnp
import numpy as np

from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.bench.datagen import generate_bench_data

DEFAULTS = ["0,64,un", "0,128,un", "0,256,un",
            "0,64,st", "0,128,st", "0,256,st", "3,256,un"]


def main():
    configs = sys.argv[1:] or DEFAULTS
    bs = 1 << 14
    dict_size = 1 << 12
    lanes_max = 256
    if os.environ.get("CORPUS") == "words":
        import random
        rng = random.Random(11)
        words = [bytes(rng.randrange(256) for _ in range(rng.randrange(5, 25)))
                 for _ in range(40)]
        b = bytearray()
        while len(b) < bs * lanes_max:
            b += words[rng.randrange(40)]
        data = bytes(b)
        fb, mf = 16, "bt4"       # ring_chip.py's encode config
    else:
        data = generate_bench_data(max(1 << 22, bs * lanes_max))
        fb, mf = 8, "fast4"
    blocks = [bytes(data[i * bs:(i + 1) * bs]) for i in range(lanes_max)]

    from lzma_tpu.runtime import native
    from lzma_tpu.ops.pallas_ring import decode_pallas_ring, C_IN

    streams_by_lc = {}
    for cfg in configs:
        parts = cfg.split(",")
        lc, n, tag = int(parts[0]), int(parts[1]), parts[2]
        staged = tag == "st"
        copy4 = "c1" not in parts[3:]
        if lc not in streams_by_lc:
            p = LzmaParams(dict_size=dict_size, fast_bytes=fb,
                           match_finder=mf, lc=lc)
            streams_by_lc[lc] = [native.encode_stream(b, p, optimal=False)
                                 for b in blocks]
        streams = streams_by_lc[lc]
        max_in = 1 << (max(len(s) for s in streams) - 1).bit_length()
        mi = max_in if not staged else ((max_in + C_IN - 1) // C_IN) * C_IN
        comp = np.zeros((n, mi), dtype=np.int32)
        lens = np.zeros(n, dtype=np.int32)
        for i in range(n):
            s = streams[i % lanes_max]
            comp[i, :len(s)] = np.frombuffer(s, np.uint8)
            lens[i] = len(s)
        sizes = jnp.full((n,), bs, jnp.int32)
        lj = jnp.asarray(lens)

        comp_j = jnp.asarray(comp)

        @jax.jit
        def _perturb(c, t):
            # ON-DEVICE perturbation of a padding byte: defeats the relay
            # result cache without re-uploading comp over the slow relay
            # link per trial (which inflates ns/iter at large N)
            return c.at[:, -1].set(t)

        def run(trial):
            cj = _perturb(comp_j, jnp.int32(trial + 1))
            o, ok, it = decode_pallas_ring(
                cj, lj, sizes, dict_size, lc, 0, 2, bs, stage_input=staged,
                copy4=copy4)
            jax.block_until_ready(o)
            return o, ok, it

        try:
            t0 = time.perf_counter()
            o, ok, it = run(0)
            tc = time.perf_counter() - t0
            # verify round-trip on lane 0
            ref = np.frombuffer(blocks[0], np.uint8)
            assert bool(jnp.all(ok)), f"decode failed {cfg}"
            assert np.array_equal(np.asarray(o[0]), ref), f"bytes wrong {cfg}"
            times = []
            for trial in range(1, 4):
                t0 = time.perf_counter()
                run(trial)
                times.append(time.perf_counter() - t0)
            dt = sorted(times)[1]
            tot = n * bs
            iters = int(jnp.max(it))
            c4t = "c4" if copy4 else "c1"
            print(f"ring lc{lc} n={n:3d} {tag} {c4t}: {tot/dt/1e6:6.2f} MB/s  "
                  f"{dt/iters*1e9:7.0f} ns/iter  "
                  f"({dt/iters/n*1e9:6.2f} ns/lane-iter, {iters} iters, "
                  f"compile+run {tc:.0f}s, "
                  f"spread {min(times)*1e3:.0f}-{max(times)*1e3:.0f} ms)",
                  flush=True)
        except Exception as e:
            print(f"ring lc{lc} n={n:3d} {tag}: FAIL {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    print("jax", jax.__version__, jax.devices(), flush=True)
    main()
