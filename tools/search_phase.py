"""Internal phase attribution of find_match_lists_rmq on chip (round 5):
suffix sort + LCP table | tier hashing/neighbors | LCP pair queries |
merge/compact.  Readback protocol (per-phase scalar sink between
repeats evicts the relay cache), median of 3.

Usage: python tools/search_phase.py [lanes] [log2_bs] [fb] [--cpu]
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
from lzma_tpu.ops import device_matcher as DM

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
BS = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 16)
FB = int(sys.argv[3]) if len(sys.argv) > 3 else 32
TIERS = dict(k4=12, k6=4, k8=6, k16=3, k32=2)

corpus = frozen_corpus()
reps = (L * BS + len(corpus) - 1) // len(corpus)
blob = (corpus * reps)[: L * BS]
arr = jnp.asarray(np.frombuffer(blob, np.uint8).reshape(L, BS))
lens = jnp.full((L,), BS, jnp.int32)
ds = jnp.int32(BS)
total = L * BS


def _tier_cands(data, n, k4, k8, k2=1, k3=1, k6=0, k16=0, k32=0):
    """The SHARED production tier build (device_matcher._tier_candidates)
    — the probe measures exactly what _rmq_search runs."""
    max_n = data.shape[0]
    pos = jnp.arange(max_n, dtype=jnp.int32)
    return DM._tier_candidates(data, n, pos, max_n, k4, k8, k2, k3,
                               k6, k16, k32)


@jax.jit
def f_suffix(a):
    def one(d, n):
        pos = jnp.arange(d.shape[0], dtype=jnp.int32)
        return DM._suffix_rank_lcp(d, n, pos, d.shape[0], FB)
    return jax.vmap(one)(a, lens)


@jax.jit
def f_tiers(a):
    return jax.vmap(lambda d, n: _tier_cands(d, n, **TIERS))(a, lens)


@jax.jit
def f_dedup(cand):
    def one(c):
        max_n = c.shape[0]
        cs = jnp.sort(c, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((max_n, 1), bool), cs[:, 1:] == cs[:, :-1]], axis=1)
        cs = jnp.where(dup, -1, cs)
        key = jnp.sort(jnp.where(cs >= 0, -cs, jnp.int32(1 << 30)), axis=1)
        return jnp.where(key >= (1 << 30), -1, -key)
    return jax.vmap(one)(cand)


@jax.jit
def f_query(rank, T, cand):
    def one(r, t, c, n):
        max_n = c.shape[0]
        pos = jnp.arange(max_n, dtype=jnp.int32)
        in_w = (c >= 0) & (pos[:, None] - c <= ds) & (c < pos[:, None])
        # rp=rank: the production query's gather-saving (round 5)
        length = DM._lcp_query(r, t, pos[:, None], c, max_n,
                               rp=r[:, None])
        length = jnp.minimum(length, jnp.maximum(n - pos, 0)[:, None])
        dist = jnp.where(in_w, pos[:, None] - c - 1, jnp.int32(1 << 30))
        return jnp.where(in_w, length, 0), dist
    return jax.vmap(one)(rank, T, cand, lens)


@jax.jit
def f_merge(length, dist):
    def one(ln, dt):
        max_n, M = ln.shape
        order = jnp.argsort(dt, axis=1)
        sl = jnp.take_along_axis(ln, order, axis=1)
        sd = jnp.take_along_axis(dt, order, axis=1)
        runmax = jnp.zeros((max_n,), dtype=jnp.int32)
        keeps = []
        for j in range(M):
            keep_j = (sl[:, j] >= 2) & (sl[:, j] > runmax) & (
                sd[:, j] < (1 << 30))
            keeps.append(keep_j)
            runmax = jnp.maximum(runmax, sl[:, j])
        keep = jnp.stack(keeps, axis=1)
        slot = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
        tgt = jnp.where(keep, slot, M)
        rows = jnp.arange(max_n)[:, None]
        lens_c = jnp.zeros((max_n, M + 1), jnp.int32)
        dists_c = jnp.zeros((max_n, M + 1), jnp.int32)
        lens_c = lens_c.at[rows, tgt].set(sl, mode="drop")[:, :M]
        dists_c = dists_c.at[rows, tgt].set(sd, mode="drop")[:, :M]
        return lens_c, dists_c, jnp.sum(keep.astype(jnp.int32), axis=1)
    return jax.vmap(one)(length, dist)


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        _ = sum(int(jnp.sum(l.astype(jnp.int32))) for l in leaves[:2])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{name:10s} {ts[1]*1e3:8.0f} ms  (min {ts[0]*1e3:.0f}, "
          f"max {ts[2]*1e3:.0f})")
    return out, ts[1]


print(f"config: {L} x {BS >> 10} KB, fb{FB}, tiers {TIERS}, "
      f"backend={jax.default_backend()}")
(rank, T), t1 = timed("suffix+T", f_suffix, arr)
cand, t2 = timed("tiers", f_tiers, arr)
dcand, t3 = timed("dedup", f_dedup, cand)
(length, dist), t4 = timed("queries", f_query, rank, T, dcand)
_, t5 = timed("merge", f_merge, length, dist)
tot = t1 + t2 + t3 + t4 + t5
print(f"sum {tot*1e3:.0f} ms -> {total/tot/1e6:.3f} MB/s "
      f"(suffix {100*t1/tot:.0f}%, tiers {100*t2/tot:.0f}%, dedup "
      f"{100*t3/tot:.0f}%, queries {100*t4/tot:.0f}%, merge {100*t5/tot:.0f}%)")
