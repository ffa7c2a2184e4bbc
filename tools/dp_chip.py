"""Chip-rate measurement for the device optimal-parse DP (VERDICT r3
item 1 speed half).  Honest protocol: inputs resident, on-device input
perturbation per trial, median of N (MEASUREMENTS.md round-2 hazard).

Usage: python tools/dp_chip.py [lanes] [log2_bs] [n_iter] [seed] [m_cap] [fb]
(seed: lists (default) | lazy | lists2 | lists_ext — the statistics
seed mode, round-4 A/B; m_cap: search right-sizing cap, round 5;
fb: fast bytes, default 32)
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(
    globals().get("__file__", "tools/x.py"))))
sys.path.insert(0, _ROOT)
import numpy as np

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp

from lzma_tpu.bench.corpus import frozen_corpus
from lzma_tpu.ops.device_parser import tokenize_optimal

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
BS = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 16)
N_ITER = int(sys.argv[3]) if len(sys.argv) > 3 else 2
SEED = sys.argv[4] if len(sys.argv) > 4 else "lists"
M_CAP = int(sys.argv[5]) if len(sys.argv) > 5 else 12  # production default (rr)
FB = int(sys.argv[6]) if len(sys.argv) > 6 else 32
TIERS = (("k4", 12), ("k6", 4), ("k8", 6), ("k16", 3), ("k32", 2))

corpus = frozen_corpus()
reps = (L * BS + len(corpus) - 1) // len(corpus)
blob = (corpus * reps)[: L * BS]
arr = jnp.asarray(np.frombuffer(blob, np.uint8).reshape(L, BS))
lens = jnp.full((L,), BS, jnp.int32)

BAND = os.environ.get(
    "LZMA_TPU_DP_BAND",
    "pallas" if jax.default_backend() == "tpu" else "band")
BAND = True if BAND == "band" else BAND


def run(a):
    return tokenize_optimal(a, lens, jnp.int32(BS), lc=3, lp=0, pb=2,
                            fb=FB, tiers_key=TIERS, n_iter=N_ITER,
                            band=BAND, seed=SEED, m_cap_search=M_CAP)

print(f"config: {L} x {BS >> 10} KB lanes, n_iter={N_ITER}, seed={SEED}, "
      f"m_cap={M_CAP}, fb={FB}, band={BAND}, "
      f"backend={jax.default_backend()}")
t0 = time.perf_counter()
out = run(arr)
jax.block_until_ready(out)
print(f"compile+first run: {time.perf_counter() - t0:.1f}s")

ts = []
for t in range(5):
    # on-device perturbation: flip one byte per trial (cache-proof)
    arr = arr.at[0, 0].set((arr[0, 0] + 1) % 251)
    jax.block_until_ready(arr)
    t0 = time.perf_counter()
    out = run(arr)
    # force a data-dependent scalar to the host: block_until_ready alone
    # can report before the remote execution has actually finished
    sink = int(jnp.sum(out[4]) + jnp.sum(out[1]))
    ts.append(time.perf_counter() - t0)
ts.sort()
med = ts[len(ts) // 2]
total = L * BS
print(f"median {med*1e3:.0f} ms  ->  {total/med/1e6:.2f} MB/s "
      f"(min {total/ts[-1]/1e6:.2f}, max {total/ts[0]/1e6:.2f})")
