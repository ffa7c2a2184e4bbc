"""Prototype v2: forward segment DP with rep0-state propagation.

v1 (parse_proto.py) showed a rep-blind static-price DP LOSES to the lazy
heuristic — LZMA's ratio lives in rep-distance chains.  This version
carries the reference optimal parser's key idea (Optimal.java stores the
rep history per DP node) in its minimal form: each node keeps the last
match distance along its best path, and an edge whose distance equals it
is priced as a rep (4 bits + len) instead of a fresh match (8+ bits).
All arrays are vectorized across segments so the structure maps 1:1 onto
a device lax.scan (edge targets j+l are uniform across segments for the
sampled length grid).

Usage: python tools/parse_proto2.py [synthetic|text] [lit_bits]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.runtime import native
from lzma_tpu.ops.device_matcher import find_best_matches, tokenize

LGRID = np.array([2, 3, 4, 5, 6, 8, 10, 12, 16, 24, 32, 48, 64, 96, 128,
                  192, 273], dtype=np.int32)
SEG = 1024
INF = 1e18


def len_bits(l):
    return 4.0 if l <= 9 else (5.0 if l <= 17 else 10.0)


def slot_extra(d):
    d = np.asarray(d, dtype=np.int64)
    bl = np.zeros_like(d)
    x = d.copy()
    for _ in range(31):
        bl = np.where(x > 0, bl + 1, bl)
        x >>= 1
    slot = np.where(d < 4, d, (2 * (bl - 1)) + ((d >> np.maximum(bl - 2, 0)) & 1))
    return np.maximum(slot // 2 - 1, 0).astype(np.float64)


def dp_parse_rep(best_len, best_dist, n, lit_bits=7.0, seg=SEG):
    """Forward 1-rep DP.  Returns (choice_len, choice_dist, choice_rep)
    per position (only meaningful on the chosen path)."""
    nseg = (n + seg - 1) // seg
    S = seg
    BL = np.zeros((nseg, S), dtype=np.int32)
    BD = np.zeros((nseg, S), dtype=np.int64)
    pad = nseg * seg - n
    bl = np.concatenate([best_len[:n], np.zeros(pad, np.int32)])
    bd = np.concatenate([best_dist[:n].astype(np.int64), np.zeros(pad, np.int64)])
    BL[:] = bl.reshape(nseg, S)
    BD[:] = bd.reshape(nseg, S)
    # clip match reach at the segment end
    j_idx = np.arange(S)[None, :]
    BL = np.minimum(BL, S - j_idx).astype(np.int32)
    match_base = 8.0 + slot_extra(BD)          # isMatch+isRep0+slot tree+extra
    REP_BASE = 4.0                              # isMatch+isRep+g0+0long

    d = np.full((nseg, S + 1), INF)
    d[:, 0] = 0.0
    rep = np.full((nseg, S + 1), -1, dtype=np.int64)
    src_len = np.zeros((nseg, S + 1), dtype=np.int32)
    src_dist = np.full((nseg, S + 1), -1, dtype=np.int64)
    src_rep = np.zeros((nseg, S + 1), dtype=bool)

    for j in range(S):
        dj = d[:, j]
        live = dj < INF
        # literal
        cand = dj + lit_bits
        upd = live & (cand < d[:, j + 1])
        d[:, j + 1] = np.where(upd, cand, d[:, j + 1])
        rep[:, j + 1] = np.where(upd, rep[:, j], rep[:, j + 1])
        src_len[:, j + 1] = np.where(upd, 1, src_len[:, j + 1])
        src_dist[:, j + 1] = np.where(upd, -1, src_dist[:, j + 1])
        src_rep[:, j + 1] = np.where(upd, False, src_rep[:, j + 1])

        blj = BL[:, j]
        bdj = BD[:, j]
        isrep = (bdj == rep[:, j]) & live
        base = dj + np.where(isrep, REP_BASE, match_base[:, j])
        for l in LGRID:
            if j + l > S:
                break
            ok = live & (blj >= l)
            cost = base + len_bits(l)
            tgt = j + l
            upd = ok & (cost < d[:, tgt])
            d[:, tgt] = np.where(upd, cost, d[:, tgt])
            rep[:, tgt] = np.where(upd, bdj, rep[:, tgt])
            src_len[:, tgt] = np.where(upd, l, src_len[:, tgt])
            src_dist[:, tgt] = np.where(upd, bdj, src_dist[:, tgt])
            src_rep[:, tgt] = np.where(upd, isrep, src_rep[:, tgt])

    # reconstruct per segment (backward walk), then emit forward choices
    choice_len = np.ones(n, dtype=np.int32)
    choice_dist = np.full(n, -1, dtype=np.int64)
    for g in range(nseg):
        end = S if (g + 1) * seg <= n else n - g * seg
        j = end
        picks = []
        while j > 0:
            l = int(src_len[g, j])
            if l == 0:  # unreached (shouldn't happen) — literal fallback
                l = 1
                picks.append((j - 1, 1, -1))
            else:
                picks.append((j - l, l, int(src_dist[g, j])))
            j -= l
        for (jj, l, dd) in picks:
            p = g * seg + jj
            if p < n:
                choice_len[p] = l
                choice_dist[p] = dd
    return choice_len, choice_dist


def tokens_from_choice(choice_len, choice_dist, n):
    tp, tl, td = [], [], []
    i = 0
    while i < n:
        tp.append(i)
        tl.append(int(choice_len[i]))
        td.append(int(choice_dist[i]))
        i += max(int(choice_len[i]), 1)
    return (np.asarray(tp, np.int32), np.asarray(tl, np.int32),
            np.asarray(td, np.int32))


def container_size(blocks, tokens, params, bs):
    n = len(blocks)
    arr = np.zeros((n, bs), dtype=np.uint8)
    for i, b in enumerate(blocks):
        arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    counts = np.asarray([len(t[0]) for t in tokens], dtype=np.int64)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    fp = np.concatenate([t[0] for t in tokens])
    fl = np.concatenate([t[1] for t in tokens])
    fd = np.concatenate([t[2].astype(np.int32) for t in tokens])
    payload, sizes = native.encode_token_blocks(
        arr.reshape(-1), bs, params.lc, params.lp, params.pb,
        fp, fl, fd, offsets, counts)
    return sum(sizes) + 4 * n


def main():
    from lzma_tpu.bench.datagen import generate_bench_data

    which = sys.argv[1] if len(sys.argv) > 1 else "synthetic"
    lit = float(sys.argv[2]) if len(sys.argv) > 2 else 7.0
    if which == "synthetic":
        data = generate_bench_data(2 << 20)
    else:
        import glob
        parts = [open(f, "rb").read() for f in
                 sorted(glob.glob("/usr/local/lib/python3.12/*.py"))]
        data = b"".join(parts)[: 2 << 20]
    bs = 1 << 16
    params = LzmaParams(dict_size=bs, fast_bytes=32)
    blocks = [data[i : i + bs] for i in range(0, len(data), bs)]
    fb, K = 32, 4

    toks_lazy, toks_dp = [], []
    for b in blocks:
        arr = np.zeros(bs, dtype=np.uint8)
        arr[: len(b)] = np.frombuffer(b, dtype=np.uint8)
        nn = len(b)
        blv, bdv = find_best_matches(jnp.asarray(arr), jnp.int32(nn),
                                     jnp.int32(bs), fb, K)
        blv, bdv = np.asarray(blv), np.asarray(bdv)
        tp, tl, td, tv, nt = tokenize(jnp.asarray(arr), jnp.int32(nn),
                                      jnp.int32(bs), fb, K, lazy=True)
        c = int(nt)
        toks_lazy.append((np.asarray(tp)[:c], np.asarray(tl)[:c],
                          np.asarray(td)[:c]))
        cl, cd = dp_parse_rep(blv, bdv, nn, lit_bits=lit)
        toks_dp.append(tokens_from_choice(cl, cd, nn))

    for name, toks in (("lazy", toks_lazy), ("dp-rep", toks_dp)):
        sz = container_size(blocks, toks, params, bs)
        print(f"{name:8s}: {sz:9d} bytes  ratio {len(data)/sz:.4f}")
    blob = native.encode_blocks(bytes(data), params, block_size=bs)
    print(f"{'bt4-opt':8s}: {len(blob):9d} bytes  ratio {len(data)/len(blob):.4f}")


if __name__ == "__main__":
    main()
