"""Probe: does Mosaic lower jnp.take_along_axis (tpu.dynamic_gather)
inside a Pallas kernel, and at what gathered-axis widths?  If wide dynamic
gathers lower natively, the decode/serialize kernels' O(N x S) one-hot
masked reductions collapse to O(N) — the single biggest lever on the
on-chip coder throughput (VERDICT r1 item 1).

Also times: one-hot masked gather vs native gather at each width, and a
masked one-hot scatter, in a tight fori_loop to amortize launch overhead.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 32
ITERS = 2048


def probe_native(width):
    def kernel(arr_ref, idx_ref, out_ref):
        def body(t, acc):
            idx = (idx_ref[:, 0] + t) % width
            v = jnp.take_along_axis(arr_ref[:], idx[:, None], axis=1)[:, 0]
            return acc + v
        out_ref[:, 0] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((N,), jnp.int32))

    arr = jnp.arange(N * width, dtype=jnp.int32).reshape(N, width) % 1000
    idx = jnp.arange(N, dtype=jnp.int32).reshape(N, 1) % width
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = f(arr, idx)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = f(arr, idx)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    # verify
    ref = np.zeros(N, np.int64)
    a = np.asarray(arr)
    for t in range(ITERS):
        ii = (np.asarray(idx)[:, 0] + t) % width
        ref += a[np.arange(N), ii]
    ok = np.array_equal(np.asarray(out)[:, 0], (ref % (1 << 32)).astype(np.int64) & 0xFFFFFFFF)
    return dt / ITERS * 1e9, ok


def probe_onehot(width):
    def kernel(arr_ref, idx_ref, out_ref):
        cols = jax.lax.broadcasted_iota(jnp.int32, (N, width), 1)

        def body(t, acc):
            idx = (idx_ref[:, 0] + t) % width
            v = jnp.sum(jnp.where(cols == idx[:, None], arr_ref[:], 0), axis=1)
            return acc + v
        out_ref[:, 0] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((N,), jnp.int32))

    arr = jnp.arange(N * width, dtype=jnp.int32).reshape(N, width) % 1000
    idx = jnp.arange(N, dtype=jnp.int32).reshape(N, 1) % width
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = f(arr, idx)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = f(arr, idx)
    out.block_until_ready()
    return (time.perf_counter() - t0) / ITERS * 1e9


def probe_scatter(width):
    def kernel(arr_ref, idx_ref, out_ref, scratch):
        cols = jax.lax.broadcasted_iota(jnp.int32, (N, width), 1)
        scratch[:] = arr_ref[:]

        def body(t, _):
            idx = (idx_ref[:, 0] + t) % width
            m = cols == idx[:, None]
            scratch[:] = jnp.where(m, t, scratch[:])
            return 0
        jax.lax.fori_loop(0, ITERS, body, 0)
        out_ref[:, 0] = jnp.sum(scratch[:], axis=1)

    arr = jnp.zeros((N, width), jnp.int32)
    idx = jnp.arange(N, dtype=jnp.int32).reshape(N, 1) % width
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N, width), jnp.int32)],
    )
    out = f(arr, idx)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = f(arr, idx)
    out.block_until_ready()
    return (time.perf_counter() - t0) / ITERS * 1e9


if __name__ == "__main__":
    print("jax", jax.__version__, jax.devices())
    for width in (128, 256, 512, 1024, 4096, 8192):
        try:
            ns, ok = probe_native(width)
            print(f"native gather  w={width:5d}: {ns:8.1f} ns/iter ok={ok}")
        except Exception as e:
            print(f"native gather  w={width:5d}: FAIL {type(e).__name__}: {str(e)[:120]}")
        try:
            ns = probe_onehot(width)
            print(f"one-hot gather w={width:5d}: {ns:8.1f} ns/iter")
        except Exception as e:
            print(f"one-hot gather w={width:5d}: FAIL {str(e)[:120]}")
        try:
            ns = probe_scatter(width)
            print(f"one-hot scatter w={width:4d}: {ns:8.1f} ns/iter")
        except Exception as e:
            print(f"one-hot scatter w={width:4d}: FAIL {str(e)[:120]}")
