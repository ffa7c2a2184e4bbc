"""Knock-out cost breakdown of the PACKED ring decoder (honest timing:
median of 3 repeats, inputs perturbed per repeat to defeat the relay
result cache).  Lanes are kept alive artificially and the outer trip is
fixed, so decoded output is garbage for knocked-out variants — timing
only.  Variants knock out one wide-op group each:
  full      — everything
  noarena   — skip arena gather+scatter (prob constant)
  nowin     — skip window gather + ring write
  noinput   — skip input word gather (byte constant)
  noring    — skip only the window WRITE (keep back-read)
  notrans   — replace the FSM transition network with 3 ops
  noflush   — skip the per-interval flush
"""
import os
import sys
import time
from functools import partial

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

from lzma_tpu.core.layout import ProbLayout
from lzma_tpu.ops.device_decoder import (
    PH_DONE, _bit_decode, _ctx_index, _state_struct, _transition, _I32, _U32)
from lzma_tpu.ops.pallas_decoder import _gather_cols, _mask2d, _round_up

F_STEP = 512


@partial(jax.jit, static_argnames=("dict_size", "lc", "max_out", "iters",
                                   "variant", "max_in"))
def ablate(comp, dict_size, lc, max_out, iters, variant, max_in):
    lp, pb = 0, 2
    layout = ProbLayout(lc, lp, pb)
    N = comp.shape[0]
    SP = _round_up((layout.size + 1) // 2, 128)
    W = 1 << (max(min(int(dict_size), max_out), F_STEP + 4, 1024)
              - 1).bit_length()
    WP = W // 4
    MO = _round_up(max_out, W)
    MOP = MO // 4
    n_outer = iters // F_STEP + 1
    dict_check = max(int(dict_size), 1)
    MIW = max_in // 4
    assert comp.shape[1] == MIW

    def kernel(aux_ref, comp_in, out_ref, ok_ref, probs, win):
        probs[:] = jnp.full_like(probs, 1024 | (1024 << 16))
        win[:] = jnp.zeros_like(win)
        out_ref[:] = jnp.zeros_like(out_ref)
        out_cols = jax.lax.broadcasted_iota(jnp.int32, (N, MOP), 1)
        win_cols = jax.lax.broadcasted_iota(jnp.int32, (N, WP), 1)
        arena_cols = jax.lax.broadcasted_iota(jnp.int32, (N, SP), 1)
        lens = aux_ref[0, :]
        sizes = aux_ref[1, :]
        code0 = aux_ref[2, :].astype(_U32)
        rng0 = jnp.full((N,), 0xFFFFFFFF, dtype=_U32)
        st0 = _state_struct(N)
        prev0 = jnp.zeros((N,), dtype=_I32)

        def fsm_step(carry):
            t, st, rng, code, prev, wacc = carry
            out_pos = st["out_pos"]
            idx, is_adaptive, is_direct, consumes_bit = _ctx_index(
                st, layout, pb, 0)
            safe_idx = jnp.where(is_adaptive, idx, 0)
            if variant == "noarena":
                prob = jnp.full((N,), 1024, _I32)
                bit, new_rng, new_code, _np = _bit_decode(
                    rng, code, prob, is_adaptive, is_direct)
            else:
                wi = safe_idx >> 1
                hi = safe_idx & 1
                amask = (arena_cols == wi[:, None]) & _mask2d(is_adaptive)
                word = jnp.sum(jnp.where(amask, probs[:], 0), axis=1)
                prob = jnp.where(hi == 1, word >> 16, word) & 0xFFFF
                bit, new_rng, new_code, new_prob = _bit_decode(
                    rng, code, prob, is_adaptive, is_direct)
                nword = jnp.where(hi == 1,
                                  (word & 0xFFFF) | (new_prob << 16),
                                  (word - (word & 0xFFFF)) | new_prob)
                probs[:] = jnp.where(amask, nword[:, None], probs[:])

            need = (new_rng < (1 << 24)) & consumes_bit
            in_pos = st["in_pos"]
            if variant == "noinput":
                next_byte = jnp.zeros((N,), _I32)
            else:
                ip = jnp.minimum(in_pos, max_in - 1)
                iw = _gather_cols(comp_in[:], ip >> 2)
                nb = (iw >> (8 * (ip & 3))) & 0xFF
                next_byte = jnp.where(in_pos < lens, nb, 0)
            overrun = st["overrun"] + jnp.where(need & (in_pos >= lens), 1, 0)
            new_rng = jnp.where(need, new_rng << 8, new_rng)
            new_code = jnp.where(need, (new_code << 8) | next_byte.astype(_U32),
                                 new_code)
            in_pos = jnp.where(need, in_pos + 1, in_pos)
            st1 = dict(st, in_pos=in_pos, overrun=overrun)

            if variant == "nowin":
                back_byte = jnp.zeros((N,), _I32)
            else:
                q = out_pos - st1["rep0"] - 1
                gw = _gather_cols(win[:], (q >> 2) & (WP - 1))
                in_acc = (q >> 2) == (out_pos >> 2)
                src_w = jnp.where(in_acc, wacc, gw)
                back_byte = (src_w >> (8 * (q & 3))) & 0xFF

            if variant == "notrans":
                st2 = dict(st1, out_pos=out_pos + 1)
                emit = jnp.ones((N,), jnp.bool_)
                emit_byte = back_byte + bit
            else:
                st2, emit, emit_byte = _transition(
                    st1, bit, prev, back_byte, sizes, dict_check,
                    layout, lc, lp, pb, 0)
                st2 = dict(st2, phase=jnp.where(
                    st2["phase"] >= PH_DONE, 0, st2["phase"]),
                    out_pos=jnp.minimum(st2["out_pos"], max_out - 2))

            nwacc = jnp.where(emit, wacc | (emit_byte << (8 * (out_pos & 3))),
                              wacc)
            if variant not in ("nowin", "noring"):
                closes = emit & ((out_pos & 3) == 3)
                wmask = (win_cols == ((out_pos >> 2) & (WP - 1))[:, None]) \
                    & _mask2d(closes)
                win[:] = jnp.where(wmask, nwacc[:, None], win[:])
                nwacc = jnp.where(closes, 0, nwacc)
            prev2 = jnp.where(emit, emit_byte, prev)
            return (t + 1, st2, new_rng, new_code, prev2, nwacc)

        def body(carry):
            st, rng, code, prev, wacc, outer, fbw = carry
            _, st, rng, code, prev, wacc = jax.lax.while_loop(
                lambda c: c[0] < F_STEP, fsm_step,
                (jnp.int32(0), st, rng, code, prev, wacc))
            if variant != "noflush":
                posw = st["out_pos"] >> 2
                m = (out_cols >= fbw[:, None]) & (out_cols < posw[:, None])
                out_ref[:] = jnp.where(m, jnp.tile(win[:], (1, MOP // WP)),
                                       out_ref[:])
                fbw = posw
            return (st, rng, code, prev, wacc, outer + 1, fbw)

        st, rng, code, prev, wacc, outer, fbw = jax.lax.while_loop(
            lambda c: c[5] < n_outer, body,
            (st0, rng0, code0, prev0, jnp.zeros((N,), _I32), jnp.int32(0),
             jnp.zeros((N,), _I32)))
        ok_ref[0, :] = st["out_pos"]
        ok_ref[1, :] = jnp.full((N,), outer * F_STEP, dtype=_I32)

    aux = jnp.stack([jnp.full((N,), max_in, jnp.int32),
                     jnp.full((N,), max_out, jnp.int32),
                     (comp[:, 0] * 131 + 7)])
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((N, MOP), jnp.int32),
                   jax.ShapeDtypeStruct((2, N), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((N, SP), jnp.int32),
                        pltpu.VMEM((N, WP), jnp.int32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(aux, comp)  # comp arrives already as packed words (N, MIW)


def main():
    iters = 16384
    rng = np.random.default_rng(0)
    for n in (32, 128):
        base = rng.integers(0, 255, (n, 2048), dtype=np.int32)
        for variant in ("full", "noarena", "noinput", "nowin", "noring",
                        "notrans", "noflush"):
            try:
                times = []
                for trial in range(4):
                    comp = jnp.asarray(base + trial)
                    t0 = time.perf_counter()
                    out = ablate(comp, 1 << 12, 0, 1 << 14, iters, variant,
                                 2048 * 4)
                    jax.block_until_ready(out)
                    times.append(time.perf_counter() - t0)
                dt = sorted(times[1:])[1]  # median of the 3 warm repeats
                print(f"{variant:8s} n={n:3d}: {dt/iters*1e9:7.1f} ns/iter "
                      f"(spread {min(times[1:])*1e3:.0f}-{max(times[1:])*1e3:.0f} ms)")
            except Exception as e:
                print(f"{variant:8s} n={n:3d}: FAIL {type(e).__name__} {str(e)[:90]}")


if __name__ == "__main__":
    print("jax", jax.__version__, jax.devices())
    main()
