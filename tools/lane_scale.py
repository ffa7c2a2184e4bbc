"""Lane-count scaling of the production ring decoder + serializer on the
real chip: is per-iteration cost flat in N (probe_gather2 says wide masked
ops are latency-bound, not width-bound)?  If so, throughput ~ N and the
VMEM footprint is the only cap — the motivation for the packed v2 kernels."""
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

from lzma_tpu.core.layout import ProbLayout
from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.bench.datagen import generate_bench_data


def main():
    bs = 1 << 14
    dict_size = 1 << 12
    data = generate_bench_data(max(1 << 22, bs * 64))
    lanes_max = 64
    blocks = [bytes(data[i * bs:(i + 1) * bs]) for i in range(lanes_max)]

    from lzma_tpu.runtime import native
    for lc in (3, 0):
        p = LzmaParams(dict_size=dict_size, fast_bytes=8, match_finder="fast4",
                       lc=lc)
        streams = [native.encode_stream(b, p, optimal=False) for b in blocks]
        max_in = 1 << (max(len(s) for s in streams) - 1).bit_length()

        from lzma_tpu.ops.pallas_ring import decode_pallas_ring, C_IN
        import itertools
        for n, staged in itertools.product((32, 64, 128, 256), (False, True)):
            mi = max_in if not staged else ((max_in + C_IN - 1) // C_IN) * C_IN
            comp = np.zeros((n, mi), dtype=np.int32)
            lens = np.zeros(n, dtype=np.int32)
            for i in range(n):
                s = streams[i % lanes_max]
                comp[i, :len(s)] = np.frombuffer(s, np.uint8)
                lens[i] = len(s)
            sizes = jnp.full((n,), bs, jnp.int32)
            lj = jnp.asarray(lens)

            def run(trial):
                # perturb a padding byte per trial: this rig's relay
                # memoizes a repeated (program, inputs) execution, so
                # identical-input repeats can return a ~0.2 ms cache hit
                # instead of running (MEASUREMENTS.md round-2 entry)
                c = comp.copy()
                c[:, -1] = trial + 1
                cj = jnp.asarray(c)
                o, ok, it = decode_pallas_ring(
                    cj, lj, sizes, dict_size, lc, 0, 2, bs,
                    stage_input=staged)
                jax.block_until_ready(o)
                return o, ok, it

            try:
                o, ok, it = run(0)
                assert bool(jnp.all(ok)), f"decode failed n={n}"
                times = []
                for trial in range(1, 4):
                    t0 = time.perf_counter()
                    run(trial)
                    times.append(time.perf_counter() - t0)
                dt = sorted(times)[1]  # median of 3
                tot = n * bs
                iters = int(jnp.max(it))
                tag = "st" if staged else "un"
                print(f"ring-decode lc{lc} n={n:3d} {tag}: {tot/dt/1e6:6.2f} MB/s  "
                      f"{dt/iters*1e9:7.0f} ns/iter ({iters} iters, "
                      f"spread {min(times)*1e3:.0f}-{max(times)*1e3:.0f} ms)")
            except Exception as e:
                tag = "st" if staged else "un"
                print(f"ring-decode lc{lc} n={n:3d} {tag}: FAIL {str(e)[:100]}")


if __name__ == "__main__":
    print("jax", jax.__version__, jax.devices())
    main()
