"""Probe 5: ablate the real ring-decoder kernel to find what costs
~1-3us/iter when equivalent masked-op structures cost ~20ns (probe 3/4).
Runs the genuine decode_pallas_ring body with components selectively
stubbed; timing only (output garbage when stubbed)."""
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
    PH_DONE, PH_ERROR, _bit_decode, _ctx_index, _state_struct, _transition,
    _I32, _U32)
from lzma_tpu.ops.pallas_decoder import _gather_cols, _mask2d, _round_up

F_STEP = 512


@partial(jax.jit, static_argnames=("dict_size", "lc", "lp", "pb", "max_out",
                                   "iters", "variant", "max_in"))
def ablate(comp, dict_size, lc, lp, pb, max_out, iters, variant, max_in,
           comp_lens=None, out_sizes=None):
    real = variant.startswith("realrow")
    layout = ProbLayout(lc, lp, pb)
    N = comp.shape[0]
    S = _round_up(layout.size, 128)
    W = 1 << (max(min(int(dict_size), max_out), F_STEP + 2, 1024)
              - 1).bit_length()
    MO = _round_up(max_out, W)
    n_outer = iters // F_STEP + 1

    def kernel(aux_ref, comp_in, out_ref, ok_ref, probs, win):
        if variant == "rowaux" or real:
            lens = aux_ref[0, :]
            sizes = aux_ref[1, :]
        else:
            lens = jnp.full((N,), max_in, jnp.int32)
            sizes = jnp.full((N,), max_out, jnp.int32)
        probs[:] = jnp.full_like(probs, 1024)
        win[:] = jnp.zeros_like(win)
        out_ref[:] = jnp.zeros_like(out_ref)
        out_cols = jax.lax.broadcasted_iota(jnp.int32, (N, MO), 1)
        win_cols = jax.lax.broadcasted_iota(jnp.int32, (N, W), 1)

        if variant == "rowaux" or real:
            code0 = aux_ref[2, :].astype(_U32)
        else:
            code0 = jnp.full((N,), 0xDEADBEEF, dtype=_U32)
        rng0 = jnp.full((N,), 0xFFFFFFFF, dtype=_U32)
        st0 = _state_struct(N)
        prev0 = jnp.zeros((N,), dtype=_I32)

        def fsm_step(carry):
            if variant == "realrow_gocur":
                t, st, rng, code, prev, cur = carry
            else:
                t, st, rng, code, prev = carry
            out_pos = st["out_pos"]
            if variant == "realrow_gocur":
                go = ~((st["in_pos"] >= (cur + 1) * 999999) & (st["in_pos"] < lens))
            if variant in ("noctx", "barebit"):
                idx = (out_pos * 7 + t) % layout.size
                is_adaptive = jnp.ones((N,), jnp.bool_)
                is_direct = jnp.zeros((N,), jnp.bool_)
                consumes_bit = is_adaptive
            else:
                idx, is_adaptive, is_direct, consumes_bit = _ctx_index(
                    st, layout, pb, 0)
            safe_idx = jnp.where(is_adaptive, idx, 0)
            if variant == "noarena":
                prob, new_prob = jnp.full((N,), 1024, _I32), jnp.full((N,), 1024, _I32)
                bit, new_rng, new_code, _ = _bit_decode(
                    rng, code, prob, is_adaptive, is_direct)
            else:
                prob = _gather_cols(probs[:], safe_idx)
                bit, new_rng, new_code, new_prob = _bit_decode(
                    rng, code, prob, is_adaptive, is_direct)
                arena_cols = jax.lax.broadcasted_iota(jnp.int32, (N, S), 1)
                upd = (arena_cols == safe_idx[:, None]) & _mask2d(is_adaptive)
                probs[:] = jnp.where(upd, new_prob[:, None], probs[:])

            need = (new_rng < (1 << 24)) & consumes_bit
            in_pos = st["in_pos"]
            if variant == "noinput":
                next_byte = jnp.zeros((N,), _I32)
            else:
                nb = _gather_cols(comp_in[:], jnp.minimum(in_pos, max_in - 1))
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
                winv = win[:]
                back_byte = _gather_cols(
                    winv, (out_pos - st1["rep0"] - 1) & (W - 1))
            if variant in ("notrans", "barebit"):
                st2 = dict(st1, out_pos=out_pos + 1)
                emit = jnp.ones((N,), jnp.bool_)
                emit_byte = back_byte + bit
            else:
                st2, emit, emit_byte = _transition(
                    st1, bit, prev, back_byte, sizes, max(int(dict_size), 1),
                    layout, lc, lp, pb, 0)
                if not real:
                    # keep lanes alive for the full iteration budget
                    st2 = dict(st2, phase=jnp.where(
                        st2["phase"] >= PH_DONE, 0, st2["phase"]),
                        out_pos=jnp.minimum(st2["out_pos"], max_out - 2))
                if variant == "realrow_gocur":
                    st2 = {k: jnp.where(go, st2[k], st[k]) for k in st2}
            if variant != "nowin":
                wmask = (win_cols == (out_pos & (W - 1))[:, None]) & _mask2d(emit)
                win[:] = jnp.where(wmask, emit_byte[:, None], win[:])
            prev2 = jnp.where(emit, emit_byte, prev)
            if variant == "realrow_gocur":
                return (t + 1, st2, new_rng, new_code, prev2, cur)
            return (t + 1, st2, new_rng, new_code, prev2)

        def fsm_cond(carry):
            return carry[0] < F_STEP

        def body(carry):
            st, rng, code, prev, outer = carry
            if variant == "realrow_gocur":
                _, st, rng, code, prev, _cur = jax.lax.while_loop(
                    fsm_cond, fsm_step,
                    (jnp.int32(0), st, rng, code, prev, jnp.int32(0)))
            else:
                t, st, rng, code, prev = jax.lax.while_loop(
                    fsm_cond, fsm_step, (jnp.int32(0), st, rng, code, prev))[0:5]
            if variant != "noflush":
                pos = st["out_pos"]
                m = (out_cols < pos[:, None])
                out_ref[:] = jnp.where(m, jnp.tile(win[:], (1, MO // W)),
                                       out_ref[:])
            return (st, rng, code, prev, outer + 1)

        def cond(carry):
            return carry[4] < n_outer

        st, rng, code, prev, outer = jax.lax.while_loop(
            cond, body, (st0, rng0, code0, prev0, jnp.int32(0)))
        ok_ref[:, 0] = st["out_pos"]
        ok_ref[:, 1] = jnp.full((N,), outer, _I32)

    if real:
        code0x = jnp.zeros((N,), jnp.uint32)
        for i in range(5):
            b = jnp.where(i < comp_lens, comp[:, i], 0)
            code0x = (code0x << 8) | b.astype(jnp.uint32)
        aux = jnp.stack([comp_lens.astype(jnp.int32),
                         out_sizes.astype(jnp.int32),
                         code0x.astype(jnp.int32)])
    else:
        aux = jnp.stack([jnp.full((N,), max_in, jnp.int32),
                         jnp.full((N,), max_out, jnp.int32),
                         jnp.full((N,), 0x1234ABCD, jnp.int32)])
    out, okv = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((N, MO), jnp.int32),
                   jax.ShapeDtypeStruct((N, 2), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((N, S), jnp.int32),
                        pltpu.VMEM((N, W), jnp.int32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(aux, comp)
    return out, okv


def main():
    iters = 16384
    for variant in ("full", "noctx", "noarena", "noinput", "nowin",
                    "notrans", "noflush", "barebit", "rowaux"):
        for n in (32,):
            comp = jnp.zeros((n, 4096), jnp.int32)
            try:
                f = lambda: jax.block_until_ready(ablate(
                    comp, 1 << 12, 0, 0, 2, 1 << 14, iters, variant, 4096))
                f()
                t0 = time.perf_counter()
                f()
                dt = time.perf_counter() - t0
                print(f"{variant:8s} n={n:3d}: {dt/iters*1e9:7.1f} ns/iter")
            except Exception as e:
                print(f"{variant:8s} n={n:3d}: FAIL {type(e).__name__} {str(e)[:110]}")


if __name__ == "__main__":
    print("jax", jax.__version__, jax.devices())
    main()


def main_real():
    import time
    from lzma_tpu.bench.datagen import generate_bench_data
    from lzma_tpu.runtime import native
    from lzma_tpu.format.properties import LzmaParams
    bs, dict_size, n, lc = 1 << 14, 1 << 12, 32, 0
    data = generate_bench_data(bs * n)
    p = LzmaParams(dict_size=dict_size, fast_bytes=8, match_finder="fast4", lc=lc)
    streams = [native.encode_stream(bytes(data[i*bs:(i+1)*bs]), p, optimal=False)
               for i in range(n)]
    max_in = 1 << (max(len(s) for s in streams) - 1).bit_length()
    comp = np.zeros((n, max_in), dtype=np.int32)
    lens = np.zeros(n, dtype=np.int32)
    for i, s in enumerate(streams):
        comp[i, :len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    cj, lj = jnp.asarray(comp), jnp.asarray(lens)
    sizes = jnp.full((n,), bs, jnp.int32)
    iters = 172 * 512
    for variant in ("realrow", "realrow_gocur"):
        def run():
            out, okv = ablate(cj, dict_size, lc, 0, 2, bs, iters, variant,
                              max_in, comp_lens=lj, out_sizes=sizes)
            jax.block_until_ready(out)
            return out, okv
        try:
            out, okv = run()
            t0 = time.perf_counter(); run(); dt = time.perf_counter() - t0
            # verify decode correctness
            o = np.asarray(out)[:, :bs].astype(np.uint8)
            want = np.frombuffer(bytes(data[:n*bs]), np.uint8).reshape(n, bs)
            okdec = np.array_equal(o, want)
            it = int(np.asarray(okv)[:, 1].max()) * 1  # outer count
            print(f"{variant:15s}: {n*bs/dt/1e6:6.2f} MB/s  "
                  f"{dt/(it*512)*1e9:7.1f} ns/iter (outer={it}) decoded-ok={okdec}")
        except Exception as e:
            print(f"{variant:15s}: FAIL {type(e).__name__} {str(e)[:110]}")
