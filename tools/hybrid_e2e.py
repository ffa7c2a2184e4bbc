"""Honest hybrid-optimal END-TO-END rate on this rig (VERDICT r4 item 3).

Measures the full pipeline a user would run — device candidate search +
device->host transfer of the packed lists + host optimal parse +
serialize — under the readback protocol (every leg ends in host-visible
data; the search leg's product IS the transferred numpy arrays, so the
timing cannot be a dispatch ack).  Per-trial input perturbation defeats
the relay result cache.  Prints per-leg times and the e2e MB/s next to
a plain native bt4-opt encode of the same sample, and states which one
wins.

Usage: python tools/hybrid_e2e.py [size_mb] [log2_bs] [--cpu]
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(
    globals().get("__file__", "tools/x.py"))))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
import numpy as np

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp

from lzma_tpu.bench.corpus import frozen_corpus
from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.ops.hybrid import (DEFAULT_TIERS, _flatten_packed,
                                 _match_lists_grouped,
                                 encode_blocks_hybrid_optimal)
from lzma_tpu.runtime import native

SIZE = (int(sys.argv[1]) if len(sys.argv) > 1 else 2) << 20
BS = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 18)
FB = 32

corpus = frozen_corpus()
reps = (SIZE + len(corpus) - 1) // len(corpus)
data = bytearray((corpus * reps)[:SIZE])
p = LzmaParams(dict_size=BS, fast_bytes=FB, match_finder="bt4")
print(f"config: {SIZE >> 20} MB frozen corpus, bs {BS >> 10} KB, fb{FB}, "
      f"tiers {DEFAULT_TIERS}, backend={jax.default_backend()}")

# warm/compile + validate
blob = encode_blocks_hybrid_optimal(bytes(data), p, block_size=BS,
                                    num_threads=0)
assert native.decode_blocks(blob) == bytes(data)
print(f"warm OK, container {len(blob)} B (ratio {SIZE/len(blob):.3f})")

# ---- per-leg + e2e, 3 trials, median ----
legs = {"search+transfer": [], "flatten": [], "parse+serialize": []}
e2e = []
for t in range(3):
    data[t] = (data[t] + 1) % 251          # perturb: cache-proof
    d = bytes(data)
    n = len(d) // BS
    arr = np.frombuffer(d, np.uint8).reshape(n, BS)
    lens = np.full(n, BS, np.int32)
    t0 = time.perf_counter()
    fl, fd, counts = _match_lists_grouped(arr, lens, jnp.int32(BS), FB,
                                          dict(DEFAULT_TIERS))
    t1 = time.perf_counter()               # fl/fd/counts are numpy: real
    flat_l, flat_d, flat_off, pos_base = _flatten_packed(fl, fd, counts, lens)
    t2 = time.perf_counter()
    payload, sizes = native.encode_candidate_blocks(
        arr.reshape(-1), BS, p.lc, p.lp, p.pb, BS, FB,
        flat_l, flat_d, flat_off, pos_base, num_threads=0, total_len=len(d))
    t3 = time.perf_counter()
    legs["search+transfer"].append(t1 - t0)
    legs["flatten"].append(t2 - t1)
    legs["parse+serialize"].append(t3 - t2)
    e2e.append(t3 - t0)

for k, v in legs.items():
    v.sort()
    print(f"  {k:16s} {v[1]:7.2f} s (min {v[0]:.2f}, max {v[2]:.2f})")
e2e.sort()
hyb_rate = SIZE / e2e[1] / 1e6
print(f"hybrid-optimal e2e: {e2e[1]:.2f} s -> {hyb_rate:.3f} MB/s "
      f"(band {SIZE/e2e[2]/1e6:.3f}-{SIZE/e2e[0]/1e6:.3f})")

# ---- native bt4-opt anchor on the same sample ----
ts = []
for t in range(3):
    data[t + 8] = (data[t + 8] + 1) % 251
    d = bytes(data)
    t0 = time.perf_counter()
    blob_bt = native.encode_blocks(d, p, block_size=BS, num_threads=0)
    ts.append(time.perf_counter() - t0)
ts.sort()
bt_rate = SIZE / ts[1] / 1e6
print(f"native bt4-opt e2e: {ts[1]:.2f} s -> {bt_rate:.3f} MB/s")
verdict = "BEATS" if hyb_rate > bt_rate else "DOES NOT BEAT"
print(f"VERDICT: hybrid-optimal {verdict} native bt4-opt end-to-end on "
      f"this rig ({hyb_rate:.3f} vs {bt_rate:.3f} MB/s, "
      f"{hyb_rate/bt_rate:.2f}x)")
