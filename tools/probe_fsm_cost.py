"""Probe 3: per-iteration cost of candidate decode-FSM op structures on
the real chip, as a function of lane count.  Measures the fixed-latency F
and per-lane slope w of:
  v1   — current ring-kernel structure: i32 arena gather+scatter (S wide),
         i32 byte window gather+scatter (W wide), input gather (1024)
  v2   — packed: arena pairs in i32 (S/2), window words (W/4) gather-only
         + register accumulator (amortized scatter), input words (256)
  i16  — native int16 arena (S entries, i16 math) if Mosaic lowers it
Also validates i16/i8 compare/select/reduce support.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 8192
S = 2688      # lc0 arena
W = 4096      # ring window (dict 4K)
C = 1024      # staged input


def run(f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e9


def v1(n):
    def kernel(seed_ref, out_ref, probs, win):
        probs[:] = jnp.full_like(probs, 1024)
        win[:] = jnp.zeros_like(win)
        acols = jax.lax.broadcasted_iota(jnp.int32, (n, S), 1)
        wcols = jax.lax.broadcasted_iota(jnp.int32, (n, W), 1)

        def body(t, carry):
            bit, pos = carry
            idx = (seed_ref[:, 0] * 131 + t * 7 + bit * 3) % S
            m = acols == idx[:, None]
            p = jnp.sum(jnp.where(m, probs[:], 0), axis=1)
            np_ = jnp.where(bit == 0, p + ((2048 - p) >> 5), p - (p >> 5))
            probs[:] = jnp.where(m, np_[:, None], probs[:])
            # input gather
            ib = jnp.sum(jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (n, C), 1)
                == (pos % C)[:, None], 1, 0), axis=1)
            # window gather + scatter
            gidx = (pos - p) & (W - 1)
            bb = jnp.sum(jnp.where(wcols == gidx[:, None], win[:], 0), axis=1)
            wm = wcols == (pos & (W - 1))[:, None]
            win[:] = jnp.where(wm, (bb + ib)[:, None], win[:])
            nbit = (p + bb) & 1
            return (nbit, pos + 1)

        bit, pos = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((n,), jnp.int32),
                             jnp.zeros((n,), jnp.int32)))
        out_ref[:, 0] = bit + pos

    seed = jnp.arange(n, dtype=jnp.int32).reshape(n, 1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, S), jnp.int32),
                        pltpu.VMEM((n, W), jnp.int32)],
    ), seed


def v2(n):
    SH, WH, CH = S // 2, W // 4, C // 4

    def kernel(seed_ref, out_ref, probs, win):
        probs[:] = jnp.full_like(probs, 1024 | (1024 << 16))
        win[:] = jnp.zeros_like(win)
        acols = jax.lax.broadcasted_iota(jnp.int32, (n, SH), 1)
        wcols = jax.lax.broadcasted_iota(jnp.int32, (n, WH), 1)
        ccols = jax.lax.broadcasted_iota(jnp.int32, (n, CH), 1)

        def body(t, carry):
            bit, pos, accum = carry
            idx = (seed_ref[:, 0] * 131 + t * 7 + bit * 3) % S
            wi = idx >> 1
            half = idx & 1
            m = acols == wi[:, None]
            word = jnp.sum(jnp.where(m, probs[:], 0), axis=1)
            p = jnp.where(half == 1, word >> 16, word) & 0xFFFF
            np_ = jnp.where(bit == 0, p + ((2048 - p) >> 5), p - (p >> 5))
            nw = jnp.where(half == 1,
                           (word & 0xFFFF) | (np_ << 16),
                           (word & ~0xFFFF) | np_)
            probs[:] = jnp.where(m, nw[:, None], probs[:])
            # input word gather + byte extract
            ipos = pos % C
            iw = jnp.sum(jnp.where(ccols == (ipos >> 2)[:, None], 1, 0), axis=1)
            ib = (iw >> ((ipos & 3) * 8)) & 0xFF
            # window word gather + byte extract
            gpos = (pos - p) & (W - 1)
            gw = jnp.sum(jnp.where(wcols == (gpos >> 2)[:, None], win[:], 0),
                         axis=1)
            bb = (gw >> ((gpos & 3) * 8)) & 0xFF
            # write accumulator: flush a word every 4 bytes
            byte = (bb + ib) & 0xFF
            accum = accum | (byte << ((pos & 3) * 8))
            flushing = (pos & 3) == 3
            wm = (wcols == ((pos >> 2) & (WH - 1))[:, None]) & (
                flushing.astype(jnp.int32)[:, None] != 0)
            win[:] = jnp.where(wm, accum[:, None], win[:])
            accum = jnp.where(flushing, 0, accum)
            nbit = (p + bb) & 1
            return (nbit, pos + 1, accum)

        bit, pos, _ = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((n,), jnp.int32),
                             jnp.zeros((n,), jnp.int32),
                             jnp.zeros((n,), jnp.int32)))
        out_ref[:, 0] = bit + pos

    seed = jnp.arange(n, dtype=jnp.int32).reshape(n, 1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, SH), jnp.int32),
                        pltpu.VMEM((n, WH), jnp.int32)],
    ), seed


def v_i16(n):
    """Native i16 arena: gather+scatter in int16."""
    def kernel(seed_ref, out_ref, probs):
        probs[:] = jnp.full_like(probs, 1024)
        acols = jax.lax.broadcasted_iota(jnp.int16, (n, S), 1)

        def body(t, bit):
            idx = ((seed_ref[:, 0] * 131 + t * 7 + bit * 3) % S).astype(jnp.int16)
            m = acols == idx[:, None]
            p = jnp.sum(jnp.where(m, probs[:], 0), axis=1,
                        dtype=jnp.int16)
            np_ = jnp.where(bit.astype(jnp.int16) == 0,
                            p + ((2048 - p) >> 5), p - (p >> 5))
            probs[:] = jnp.where(m, np_[:, None], probs[:])
            return (p & 1).astype(jnp.int32)

        bit = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((n,), jnp.int32))
        out_ref[:, 0] = bit

    seed = jnp.arange(n, dtype=jnp.int32).reshape(n, 1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, S), jnp.int16)],
    ), seed


if __name__ == "__main__":
    print("jax", jax.__version__, jax.devices())
    for name, mk in (("v1", v1), ("v2-packed", v2), ("i16-arena", v_i16)):
        for n in (32, 64, 128, 256):
            try:
                f, seed = mk(n)
                ns = run(f, seed)
                print(f"{name:10s} n={n:3d}: {ns:7.1f} ns/iter")
            except Exception as e:
                print(f"{name:10s} n={n:3d}: FAIL {type(e).__name__} {str(e)[:90]}")


def verify_v1(n=16, iters=512):
    """Cross-check v1's computation against numpy to rule out silent DCE."""
    global ITERS
    old = ITERS
    ITERS = iters
    try:
        f, seed = v1(n)
        out = np.asarray(f(seed))[:, 0]
    finally:
        ITERS = old
    probs = np.full((n, S), 1024, np.int64)
    win = np.zeros((n, W), np.int64)
    bit = np.zeros(n, np.int64)
    pos = np.zeros(n, np.int64)
    sd = np.arange(n)
    rows = np.arange(n)
    for t in range(iters):
        idx = (sd * 131 + t * 7 + bit * 3) % S
        p = probs[rows, idx]
        np_ = np.where(bit == 0, p + ((2048 - p) >> 5), p - (p >> 5))
        probs[rows, idx] = np_
        ib = np.ones(n, np.int64)
        gidx = (pos - p) & (W - 1)
        bb = win[rows, gidx]
        win[rows, pos & (W - 1)] = bb + ib
        bit = (p + bb) & 1
        pos = pos + 1
    want = (bit + pos) & 0xFFFFFFFF
    print("verify v1:", np.array_equal(out.astype(np.int64) & 0xFFFFFFFF, want),
          out[:4], want[:4])
