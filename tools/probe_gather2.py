"""Probe 2: lane-count scaling of the one-hot masked gather/scatter at
fixed width (latency- vs throughput-bound crossover), chained-op cost
(how much does ADDING ops to the dependency chain cost vs widening them),
and what take_along_axis actually returns inside a kernel."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 4096


def time_kernel(f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e9, out


def probe_chain(n, width, n_gathers):
    """n_gathers dependent gather+scatter pairs per iteration."""
    def kernel(arr_ref, idx_ref, out_ref, scratch):
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, width), 1)
        scratch[:] = arr_ref[:]

        def body(t, acc):
            v = acc
            for k in range(n_gathers):
                idx = (idx_ref[:, 0] + t + v) % width
                m = cols == idx[:, None]
                v = jnp.sum(jnp.where(m, scratch[:], 0), axis=1) & 1023
                scratch[:] = jnp.where(m, (v + 1)[:, None], scratch[:])
            return v
        out_ref[:, 0] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((n,), jnp.int32))

    arr = (jnp.arange(n * width, dtype=jnp.int32).reshape(n, width) * 7) % 1000
    idx = jnp.arange(n, dtype=jnp.int32).reshape(n, 1) % width
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, width), jnp.int32)],
    )
    ns, out = time_kernel(f, arr, idx)
    # verify against numpy
    a = np.asarray(arr).copy()
    ii0 = np.asarray(idx)[:, 0]
    v = np.zeros(n, np.int64)
    for t in range(ITERS):
        for k in range(n_gathers):
            ii = (ii0 + t + v) % width
            v = a[np.arange(n), ii] & 1023
            a[np.arange(n), ii] = v + 1
    ok = np.array_equal(np.asarray(out)[:, 0], v)
    return ns, ok


def probe_taa(n, width):
    """What does take_along_axis return?"""
    def kernel(arr_ref, idx_ref, out_ref):
        v = jnp.take_along_axis(arr_ref[:], idx_ref[:], axis=1)
        out_ref[:] = v

    arr = jnp.arange(n * width, dtype=jnp.int32).reshape(n, width)
    idx = (jnp.arange(n, dtype=jnp.int32).reshape(n, 1) * 37) % width
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = np.asarray(f(arr, idx))[:, 0]
    want = np.asarray(arr)[np.arange(n), np.asarray(idx)[:, 0]]
    return out, want


if __name__ == "__main__":
    print("jax", jax.__version__, jax.devices())
    # take_along_axis semantics
    for width in (128, 512):
        try:
            out, want = probe_taa(16, width)
            print(f"taa w={width}: match={np.array_equal(out, want)} out[:6]={out[:6]} want[:6]={want[:6]}")
        except Exception as e:
            print(f"taa w={width}: FAIL {str(e)[:140]}")
    # lane scaling at realistic widths, 1 gather+scatter pair
    for n in (8, 32, 64, 128, 256):
        for width in (2688, 8064):
            try:
                ns, ok = probe_chain(n, width, 1)
                print(f"chain n={n:3d} w={width} g=1: {ns:7.1f} ns/iter ok={ok}")
            except Exception as e:
                print(f"chain n={n:3d} w={width} g=1: FAIL {str(e)[:100]}")
    # op-count scaling at fixed n=64
    for g in (1, 2, 4):
        ns, ok = probe_chain(64, 4096, g)
        print(f"chain n=64 w=4096 g={g}: {ns:7.1f} ns/iter ok={ok} ({ns/g:.1f} ns/pair)")
