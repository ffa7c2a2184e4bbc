"""Round-3 chip measurement of the PACKED-ARENA serializer.

One XLA lowering at 32 lanes (the only relay-expensive compile), tiled
up to the requested lane counts — the kernel treats lanes independently,
so repeated rows cost exactly what distinct rows do.  Honest protocol:
inputs resident, ON-DEVICE pad perturbation per trial, median of 3.

Usage: python tools/ser_chip3.py [lc,n ...]   (default lc3/lc0 x 64,128)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
import jax.numpy as jnp
import numpy as np

from lzma_tpu.bench.datagen import generate_bench_data
from lzma_tpu.core.layout import ProbLayout
from lzma_tpu.ops.device_encoder import _lower_lanes_jit
from lzma_tpu.ops.pallas_serializer import serialize_pallas

LAND = 32  # lowering lane count


def main():
    bs, dict_size = 1 << 14, 1 << 12
    data = generate_bench_data(bs * LAND)
    configs = ([tuple(map(int, a.split(","))) for a in sys.argv[1:]]
               or [(3, 64), (3, 128), (0, 128), (3, 256)])
    lowered = {}
    for lc, n in configs:
        if lc not in lowered:
            arr = np.frombuffer(data[: LAND * bs], np.uint8).reshape(LAND, bs)
            t0 = time.perf_counter()
            ctx, bits, totals, max_out = _lower_lanes_jit(
                jnp.asarray(arr), jnp.full((LAND,), bs, jnp.int32),
                jnp.int32(dict_size), lc=lc, lp=0, pb=2, fb=32,
                num_candidates=4)
            jax.block_until_ready(ctx)
            print(f"lowering lc{lc}: {time.perf_counter()-t0:.0f}s",
                  flush=True)
            lowered[lc] = (ctx, bits, totals, int(max_out))
        ctx, bits, totals, mo = lowered[lc]
        rep = n // LAND
        ctx_t = jnp.tile(ctx, (rep, 1))
        bits_t = jnp.tile(bits, (rep, 1))
        tot_t = jnp.tile(totals, (rep,))
        arena = ProbLayout(lc, 0, 2, pos_bits=2).size

        @jax.jit
        def _perturb(b, t):
            return b.at[:, -1].set(t & 1)

        def run(trial):
            b = _perturb(bits_t, jnp.int32(trial))
            out, olens, consumed = serialize_pallas(ctx_t, b, tot_t, arena, mo)
            jax.block_until_ready(out)
            return out, olens, consumed

        try:
            t0 = time.perf_counter()
            out, olens, consumed = run(0)
            tc = time.perf_counter() - t0
            okc = bool(jnp.all(consumed == tot_t))
            times = []
            for trial in range(1, 4):
                t0 = time.perf_counter()
                run(trial)
                times.append(time.perf_counter() - t0)
            dt = sorted(times)[1]
            print(f"serialize lc{lc} n={n:3d}: {n*bs/dt/1e6:6.2f} MB/s  "
                  f"consumed={okc}  compile+run {tc:.0f}s  "
                  f"spread {min(times)*1e3:.0f}-{max(times)*1e3:.0f} ms",
                  flush=True)
        except Exception as e:
            print(f"serialize lc{lc} n={n:3d}: FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    print("jax", jax.__version__, jax.devices(), flush=True)
    main()
