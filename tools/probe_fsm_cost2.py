"""Probe 4: what makes the real ring kernel ~1-3us/iter when the wide
masked ops alone cost ~20ns/iter (probe_fsm_cost)?  Suspects:
  A. lax.while_loop with jnp.any() condition (scalar sync per iter)
  B. the ~150-op select network over (N,) vectors (serial VPU latency)
  C. dict-of-registers loop carry size
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
S = 2688
W = 4096


def run(f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e9


def make(n, loop="fori", selects=0, nregs=0):
    def kernel(seed_ref, out_ref, probs, win):
        probs[:] = jnp.full_like(probs, 1024)
        win[:] = jnp.zeros_like(win)
        acols = jax.lax.broadcasted_iota(jnp.int32, (n, S), 1)
        wcols = jax.lax.broadcasted_iota(jnp.int32, (n, W), 1)

        def step(t, bit, pos, regs):
            idx = (seed_ref[:, 0] * 131 + t * 7 + bit * 3) % S
            m = acols == idx[:, None]
            p = jnp.sum(jnp.where(m, probs[:], 0), axis=1)
            np_ = jnp.where(bit == 0, p + ((2048 - p) >> 5), p - (p >> 5))
            probs[:] = jnp.where(m, np_[:, None], probs[:])
            gidx = (pos - p) & (W - 1)
            bb = jnp.sum(jnp.where(wcols == gidx[:, None], win[:], 0), axis=1)
            wm = wcols == (pos & (W - 1))[:, None]
            win[:] = jnp.where(wm, (bb + p)[:, None], win[:])
            x = bb
            nregs_out = []
            for r in regs:
                # chained (N,) select network stand-in
                x = jnp.where((x & 1) == 0, x + r, x - r)
                nregs_out.append(jnp.where((x & 3) == 0, r + 1, r))
            for _ in range(selects):
                x = jnp.where((x & 1) == 0, x + 3, x >> 1)
            nbit = (p + x) & 1
            return nbit, pos + 1, tuple(nregs_out)

        regs0 = tuple(jnp.full((n,), i + 1, jnp.int32) for i in range(nregs))
        if loop == "fori":
            def body(t, carry):
                bit, pos, regs = carry
                return step(t, bit, pos, regs)
            bit, pos, _ = jax.lax.fori_loop(
                0, ITERS, body, (jnp.zeros((n,), jnp.int32),
                                 jnp.zeros((n,), jnp.int32), regs0))
        else:
            def cond(carry):
                t, bit, pos, regs = carry
                return jnp.any(pos < ITERS) & (t < ITERS)

            def body(carry):
                t, bit, pos, regs = carry
                bit, pos, regs = step(t, bit, pos, regs)
                return (t + 1, bit, pos, regs)
            _, bit, pos, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.zeros((n,), jnp.int32),
                             jnp.zeros((n,), jnp.int32), regs0))
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


if __name__ == "__main__":
    print("jax", jax.__version__, jax.devices())
    for desc, kw in (
        ("fori plain", dict(loop="fori")),
        ("while plain", dict(loop="while")),
        ("fori +150sel", dict(loop="fori", selects=150)),
        ("while +150sel", dict(loop="while", selects=150)),
        ("fori +24regs", dict(loop="fori", nregs=24)),
        ("while +24regs", dict(loop="while", nregs=24)),
        ("while +24regs+120sel", dict(loop="while", nregs=24, selects=120)),
    ):
        for n in (32, 128):
            try:
                f, seed = make(n, **kw)
                ns = run(f, seed)
                print(f"{desc:22s} n={n:3d}: {ns:7.1f} ns/iter")
            except Exception as e:
                print(f"{desc:22s} n={n:3d}: FAIL {type(e).__name__} {str(e)[:90]}")
