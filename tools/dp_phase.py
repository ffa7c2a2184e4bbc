"""Per-phase chip timing of the device optimal-parse DP pipeline
(tokenize_optimal's internal stages), honest protocol: resident inputs,
forced readback sink per phase, median of 3.  Trials re-run each phase
on unchanged inputs; the per-trial readback sink is a DIFFERENT program
dispatched between repeats, which evicts the rig's single-entry relay
result cache (MEASUREMENTS.md round-2 hazard), so repeats measure real
executions.  (dp_chip.py additionally perturbs the input per trial —
equivalent protection for its single end-to-end program.)

Phases (matching ops/device_parser.tokenize_optimal):
  search  - _rmq_search (suffix-RMQ lists at any fb, production
            m_cap/m_cap_order defaults) + _select_dp_pairs
  seed    - device_matcher.tokenize lazy pass (statistics seed)
  stats   - classify_tokens + lower_tokens + empirical_probs
  model   - rep0_trace + rep_match_lens_rmq + build_price_model
  dp      - dp_parse_pallas (tpu; LZMA_TPU_DP_BAND=pallas2|band) /
            dp_parse_band (cpu)
  extract - extract_tokens

Usage: python tools/dp_phase.py [lanes] [log2_bs] [fb] [m_cap] [--cpu]
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
from functools import partial

from lzma_tpu.bench.corpus import frozen_corpus
from lzma_tpu.ops import device_parser as P
from lzma_tpu.ops.device_encoder import classify_tokens, lower_tokens
from lzma_tpu.ops.device_matcher import tokenize
from lzma_tpu.core.layout import ProbLayout

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
BS = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 16)
FB = int(sys.argv[3]) if len(sys.argv) > 3 else 32
M_CAP = int(sys.argv[4]) if len(sys.argv) > 4 else 0
LC, LP, PB = 3, 0, 2
TIERS = dict((("k4", 12), ("k6", 4), ("k8", 6), ("k16", 3), ("k32", 2)))

corpus = frozen_corpus()
reps = (L * BS + len(corpus) - 1) // len(corpus)
blob = (corpus * reps)[: L * BS]
arr = jnp.asarray(np.frombuffer(blob, np.uint8).reshape(L, BS))
lens = jnp.full((L,), BS, jnp.int32)
dict_size = jnp.int32(BS)
layout = ProbLayout(LC, LP, PB, pos_bits=PB)
max_bits = 10 * BS + 128
total = L * BS



M_ORDER = os.environ.get("MCAP_ORDER", P.DP_M_CAP_ORDER)


@jax.jit
def f_search(a):
    from lzma_tpu.ops.device_matcher import _rmq_search

    cl, cd, counts, rank, T = jax.vmap(
        lambda d, n: _rmq_search(d, n, dict_size, FB, m_cap=M_CAP,
                                 m_cap_order=M_ORDER, **TIERS))(a, lens)
    # pair selection is part of the search product the DP consumes
    lds, dds = P._select_dp_pairs(cl, cd, counts, P.DEFAULT_M_DP)
    return cl, cd, counts, lds, dds, rank, T


@jax.jit
def f_seed(a):
    return jax.vmap(lambda d, n: tokenize(d, n, dict_size, FB, 4))(a, lens)


@jax.jit
def f_seed_lists(cl, cd, counts, a):
    return jax.vmap(lambda c, e, k, n, d: P._seed_from_lists(
        c, e, k, n, data=d, ext_from=FB, ext_to=0, min_len=4)
    )(cl, cd, counts, lens, a)


@jax.jit
def f_stats(a, tp, tl, td, tv):
    meta = classify_tokens(a, tp, tl, td, tv)
    ctx, bits, totals = lower_tokens(a, meta, tp, tl, td, tv,
                                     LC, LP, PB, max_bits)
    return P.empirical_probs(ctx, bits, totals, layout.size)


@jax.jit
def f_model(a, probs, tp, td, tv, rank, T):
    from lzma_tpu.ops.device_matcher import rep_match_lens_rmq

    r0pos = P.rep0_trace(tp, td, tv, BS)
    replen = jax.vmap(
        lambda r, t, rp, n: rep_match_lens_rmq(r, t, rp, n, FB)
    )(rank, T, r0pos, lens)
    model = P.build_price_model(a, probs, LC, LP, PB, FB, r0pos=r0pos)
    return r0pos, replen, model


BAND = os.environ.get(
    "LZMA_TPU_DP_BAND",
    "pallas" if jax.default_backend() == "tpu" else "band")


@jax.jit
def f_dp(a, ld, dd, model, r0pos, replen):
    if BAND == "pallas":
        return P.dp_parse_pallas(a, lens, ld, dd, model, FB, PB, False,
                                 r0pos=r0pos, replen=replen)
    if BAND == "pallas2":
        return P.dp_parse_pallas2(a, lens, ld, dd, model, FB, PB, False,
                                  r0pos=r0pos, replen=replen)
    return P.dp_parse_band(a, lens, ld, dd, model, FB, PB, False,
                           r0pos=r0pos, replen=replen)


@jax.jit
def f_extract(from_, choice):
    return P.extract_tokens(from_, choice, lens)


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)           # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        sink = sum(int(jnp.sum(l.astype(jnp.int64) if l.dtype != jnp.uint8
                               else l.astype(jnp.int32))) for l in leaves[:2])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[1]
    print(f"{name:8s} {med*1e3:8.0f} ms  {total/med/1e6:8.3f} MB/s "
          f"(min {ts[0]*1e3:.0f}, max {ts[2]*1e3:.0f})")
    return out, med


print(f"config: {L} x {BS >> 10} KB lanes, fb{FB}, tiers {TIERS}, "
      f"backend={jax.default_backend()}, band={BAND}")
(cl, cd, counts, lds, dds, rank, T), t_search = timed("search", f_search, arr)
(tp, tl, td, tv, ntok), t_seed = timed("seed", f_seed, arr)
_, t_seed_l = timed("seed_ls", f_seed_lists, cl, cd, counts, arr)
probs, t_stats = timed("stats", f_stats, arr, tp, tl, td, tv)
(r0pos, replen, model), t_model = timed("model", f_model, arr, probs, tp,
                                        td, tv, rank, T)
(from_, choice), t_dp = timed("dp", f_dp, arr, lds, dds, model, r0pos, replen)
_, t_ex = timed("extract", f_extract, from_, choice)

for name, ts in (("lazy", t_seed), ("lists", t_seed_l)):
    tot = t_search + ts + 2 * (t_stats + t_model + t_dp + t_ex)
    print(f"n_iter=2 pipeline model (seed={name}): {tot:.1f} s -> "
          f"{total/tot/1e6:.3f} MB/s "
          f"(search {100*t_search/tot:.0f}%, seed {100*ts/tot:.0f}%, "
          f"2x stats+model {200*(t_stats+t_model)/tot:.0f}%, "
          f"2x dp {200*t_dp/tot:.0f}%, 2x extract {200*t_ex/tot:.0f}%)")
