"""Bisect the per-lane DMA lowering failure from probe_dma.py.

Variants (each isolates one suspect):
  A. full-batch 2D DMA, shaped sem array   — the serializer's exact form
  B. per-lane 2D (1,C) slice, STATIC offset, shaped sem
  C. per-lane 2D (1,C) slice, DYNAMIC offset (masked-reduction scalar)
  D. per-lane 1D (C,) row slice, static offset
  E. C with bare SemaphoreType.DMA scratch (probe1's form)
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
SRC = jnp.arange(N * M, dtype=jnp.int32).reshape(N, M)
OFFS = np.asarray([0, 8, 16, 120, 3, 500, 777, 896], dtype=np.int32)


def lane_scalar(vec, i):
    lanes = jax.lax.broadcasted_iota(jnp.int32, vec.shape + (1,), 0)[:, 0]
    return jnp.sum(jnp.where(lanes == i, vec, 0))


def run(kernel, sem_shape, name, check):
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N, C), jnp.int32), sem_shape],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray(OFFS).reshape(-1, 1), SRC)
    assert check(np.asarray(out)), f"{name} value mismatch"
    print(f"{name} ok")


def kA(off_ref, src, out_ref, stage, sems):
    cp = pltpu.make_async_copy(src.at[:, pl.ds(0, C)], stage, sems.at[0])
    cp.start(); cp.wait()
    out_ref[:] = stage[:]


def kB(off_ref, src, out_ref, stage, sems):
    for i in range(N):
        cp = pltpu.make_async_copy(
            src.at[pl.ds(i, 1), pl.ds(8 * i, C)],
            stage.at[pl.ds(i, 1), :], sems.at[0])
        cp.start(); cp.wait()
    out_ref[:] = stage[:]


def kC(off_ref, src, out_ref, stage, sems):
    offs = off_ref[:, 0]
    for i in range(N):
        o = lane_scalar(offs, i)
        cp = pltpu.make_async_copy(
            src.at[pl.ds(i, 1), pl.ds(o, C)],
            stage.at[pl.ds(i, 1), :], sems.at[0])
        cp.start(); cp.wait()
    out_ref[:] = stage[:]


def kD(off_ref, src, out_ref, stage, sems):
    for i in range(N):
        cp = pltpu.make_async_copy(
            src.at[i, pl.ds(8 * i, C)], stage.at[i], sems.at[0])
        cp.start(); cp.wait()
    out_ref[:] = stage[:]


def kE(off_ref, src, out_ref, stage, sem):
    offs = off_ref[:, 0]
    for i in range(N):
        o = lane_scalar(offs, i)
        cp = pltpu.make_async_copy(
            src.at[pl.ds(i, 1), pl.ds(o, C)],
            stage.at[pl.ds(i, 1), :], sem)
        cp.start(); cp.wait()
    out_ref[:] = stage[:]


ck_static = lambda o: np.array_equal(
    o, np.stack([np.arange(i * M + 8 * i, i * M + 8 * i + C) for i in range(N)]))
ck_dyn = lambda o: np.array_equal(
    o, np.stack([np.arange(i * M + OFFS[i], i * M + OFFS[i] + C) for i in range(N)]))
ck_a = lambda o: np.array_equal(o, np.asarray(SRC[:, :C]))

if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    fails = 0
    for name, k, sem, ck in [
        ("A full-batch 2D", kA, pltpu.SemaphoreType.DMA((1,)), ck_a),
        ("B perlane 2D static", kB, pltpu.SemaphoreType.DMA((1,)), ck_static),
        ("C perlane 2D dynamic", kC, pltpu.SemaphoreType.DMA((1,)), ck_dyn),
        ("D perlane 1D static", kD, pltpu.SemaphoreType.DMA((1,)), ck_static),
        ("E bare-sem dynamic", kE, pltpu.SemaphoreType.DMA, ck_dyn),
    ]:
        try:
            run(k, sem, name, ck)
        except Exception as e:
            fails += 1
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")
    sys.exit(1 if fails else 0)
