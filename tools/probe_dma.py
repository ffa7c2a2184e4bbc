"""Hardware probe: Mosaic patterns the ring decoder needs.

Validates on the REAL chip (interpret mode accepts forms Mosaic later
rejects) that:
  P1. a per-lane DMA with a DYNAMIC row + column offset lowers:
      make_async_copy(hbm.at[i, pl.ds(start_i, C)], vmem.at[i], sem)
      where start_i comes from a masked rank-0 reduction of a vector
  P2. the same DMA works INSIDE a lax.while_loop body
  P3. scalar read from a VMEM ref (alternative scalar-extraction path)

Run: python tools/probe_dma.py   (exits nonzero on failure)
"""
import os
import sys

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, M, C = 8, 1024, 128


def lane_scalar(vec, i):
    lanes = jax.lax.broadcasted_iota(jnp.int32, vec.shape + (1,), 0)[:, 0]
    return jnp.sum(jnp.where(lanes == i, vec, 0))


def probe1():
    def kernel(off_ref, src_hbm, out_ref, stage, sem):
        offs = off_ref[:, 0]
        for i in range(N):
            o = lane_scalar(offs, i)
            cp = pltpu.make_async_copy(
                src_hbm.at[i, pl.ds(o, C)], stage.at[i], sem)
            cp.start()
            cp.wait()
        out_ref[:] = stage[:]

    src = jnp.arange(N * M, dtype=jnp.int32).reshape(N, M)
    offs = jnp.asarray([0, 8, 16, 120, 3, 500, 777, 896], dtype=jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N, C), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offs.reshape(-1, 1), src)
    ref = np.stack([np.arange(i * M + o, i * M + o + C)
                    for i, o in enumerate(np.asarray(offs))])
    assert np.array_equal(np.asarray(out), ref), "P1 value mismatch"
    print("P1 ok: per-lane dynamic-offset DMA")


def probe2():
    def kernel(off_ref, src_hbm, out_ref, stage, sem):
        offs = off_ref[:, 0]

        def cond(c):
            return c[0] < 2

        def body(c):
            it, acc = c
            for i in range(N):
                o = lane_scalar(offs, i) + it * C
                cp = pltpu.make_async_copy(
                    src_hbm.at[i, pl.ds(o, C)], stage.at[i], sem)
                cp.start()
                cp.wait()
            return (it + 1, acc + stage[:])

        _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((N, C), jnp.int32)))
        out_ref[:] = acc

    src = jnp.arange(N * M, dtype=jnp.int32).reshape(N, M)
    offs = jnp.asarray([0, 8, 16, 120, 3, 500, 700, 640], dtype=jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N, C), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offs.reshape(-1, 1), src)
    o = np.asarray(offs)
    ref = np.stack([np.arange(i * M + oi, i * M + oi + C)
                    + np.arange(i * M + oi + C, i * M + oi + 2 * C)
                    for i, oi in enumerate(o)])
    assert np.array_equal(np.asarray(out), ref), "P2 value mismatch"
    print("P2 ok: DMA inside while_loop body")


def probe3():
    def kernel(x_ref, out_ref):
        s = x_ref[3, 5]
        out_ref[:] = x_ref[:] + s

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert np.asarray(out)[0, 0] == 3 * 128 + 5, "P3 value mismatch"
    print("P3 ok: scalar read from VMEM ref")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    failures = 0
    for p in (probe1, probe2, probe3):
        try:
            p()
        except Exception as e:
            failures += 1
            print(f"{p.__name__} FAILED: {type(e).__name__}: {str(e)[:500]}")
    sys.exit(1 if failures else 0)
