"""Pallas range-decoder kernel: the LZMA decode FSM in VMEM.

The decode counterpart of `ops/pallas_serializer.py`, completing the
north-star requirement that the adaptive range coder's rc_encode AND
rc_decode bit-serial loops run as on-device kernels.  The FSM itself
(context select, bit decode, transition network) is shared code —
`device_decoder._ctx_index/_bit_decode/_transition` — so the subtle
reference semantics (Decoder.java:205-301) exist in exactly one place;
this module only supplies the Pallas memory model:

  probs (N, S)   int32 VMEM scratch — adaptive probability arena,
                 full-shape dynamic gathers + one-hot masked updates
                 (Mosaic lowers no per-row scatter; the masked form stays
                 in VMEM instead of XLA's full-buffer loop-carry copy)
  outb  (N, MO)  int32 VMEM scratch — the decoded window; the decoder's
                 per-lane random reads of its own output (match copies,
                 matched-literal predictor byte) become full-shape gathers
  comp  (N, MI)  int32 VMEM input — compressed streams, byte-gathered at
                 renormalization time

One FSM iteration decodes one adaptive/direct bit (or copies one match
byte) for every lane in lock-step, exactly like the XLA while_loop
backend — bit-exact against it and the scalar oracle
(tests/test_pallas_decoder.py).

Throughput note (DESIGN-NOTES.md): each iteration's O(N·MO) gathers bound
this kernel well below the native block decoder; it is the
demonstration-grade on-device path, ~an order of magnitude faster than
the XLA FSM whose arena scatter re-copies the loop carry every bit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format.properties import LzmaParams
from ..core.layout import ProbLayout
from .device_decoder import (
    PH_DONE,
    PH_ERROR,
    _bit_decode,
    _ctx_index,
    _state_struct,
    _transition,
    _I32,
    _U32,
)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _mask2d(m):
    """(N,) bool -> (N,1) bool; Mosaic only lowers minor-dim insertion for
    32-bit types, so the reshape routes through int32."""
    return m.astype(jnp.int32)[:, None] != 0


def _gather_cols(arr, idx):
    """arr[(N, K)] gathered at per-row column idx[(N,)] -> (N,).

    Mosaic's tpu.dynamic_gather spans at most one vreg (128 lanes) along
    the gathered axis, so wide arrays use a one-hot masked reduction — the
    in-VMEM formulation that always lowers.
    """
    n, k = arr.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, k), 1)
    return jnp.sum(jnp.where(cols == idx[:, None], arr, 0), axis=1)


@partial(jax.jit, static_argnames=(
    "dict_size", "lc", "lp", "pb", "max_out", "max_iters", "interpret"))
def decode_pallas(comp, comp_lens, out_sizes, dict_size: int, lc: int, lp: int,
                  pb: int, max_out: int, max_iters: int = 0,
                  interpret: bool = False, preset=None):
    """Decode N padded streams in one Pallas kernel.

    comp: (N, max_in) int32 (byte values).  `preset` ((P,) int32 or None)
    primes every lane's VMEM window with a shared dictionary (LZTB v2):
    out_sizes must then be ABSOLUTE end positions (P + coded size) and
    the payload sits at out[:, P:].  Returns (out u8 (N, max_out),
    ok bool (N,), iters int32 (N,)).
    """
    layout = ProbLayout(lc, lp, pb, pos_bits=pb)
    N, max_in = comp.shape
    S = _round_up(layout.size, 128)
    MO = _round_up(max_out, 128)
    pos_base = 0 if preset is None else preset.shape[0]
    if pos_base:
        # padded to the window width so the kernel primes with one
        # sublane-broadcast masked select
        preset_row = jnp.zeros((1, MO), dtype=jnp.int32).at[0, :pos_base].set(
            preset.astype(jnp.int32))
    if not max_iters:
        # Iterations are bounded by decoded BITS, not input bytes — on
        # highly compressible data many bits decode per input byte.  Worst
        # case per output byte: a literal is 9 bit-iterations + 1 emit; a
        # len-2 match is <=51 bit-iterations (isMatch+isRep*4+2 choice+8
        # len tree+6 slot+26 direct+4 align) + 2 copies => <28/byte.  Valid
        # streams exit early via `any(active)`; corrupt ones die on the
        # overrun check long before this cap.
        max_iters = 28 * MO + 8 * max_in + 256
    dict_check = max(int(dict_size), 1)

    def kernel(comp_ref, aux_ref, *rest):
        if pos_base:
            preset_ref, out_ref, ok_ref, probs, outb = rest
        else:
            out_ref, ok_ref, probs, outb = rest
        probs[:] = jnp.full_like(probs, 1024)
        out_cols = jax.lax.broadcasted_iota(jnp.int32, (N, MO), 1)
        if pos_base:
            outb[:] = jnp.where(out_cols < pos_base,
                                jnp.broadcast_to(preset_ref[:], (N, MO)), 0)
        else:
            outb[:] = jnp.zeros_like(outb)
        comp_v = comp_ref[:]
        # Per-lane scalars as ROWS of one (3, N) aux array — a column
        # slice would drag a sublane layout through the loop carry (~20%
        # relayout tax, MEASUREMENTS.md).  The 5-byte code preload is
        # precomputed in XLA for the same reason.
        lens = aux_ref[0, :]
        sizes = aux_ref[1, :]
        code0 = aux_ref[2, :].astype(_U32)
        rng0 = jnp.full((N,), 0xFFFFFFFF, dtype=_U32)

        st0 = _state_struct(N)
        if pos_base:
            st0["out_pos"] = jnp.full((N,), pos_base, dtype=_I32)
            # literal context starts from the LAST preset byte (§1.1)
            prev0 = jnp.full((N,), 1, dtype=_I32) * preset_ref[0, pos_base - 1]
        else:
            prev0 = jnp.zeros((N,), dtype=_I32)

        # Liveness (jnp.any over lanes + scalar readback) is only checked
        # once per F_CHECK iterations; the inner loop is a while_loop with
        # a scalar-only condition (MEASUREMENTS.md round-2 entry).
        F_CHECK = 256

        def cond(carry):
            st, rng, code, iters, prev = carry
            active = (st["phase"] != PH_DONE) & (st["phase"] != PH_ERROR)
            return jnp.any(active) & (iters < max_iters)

        def body(carry):
            st, rng, code, iters, prev = carry
            out_pos = st["out_pos"]

            idx, is_adaptive, is_direct, consumes_bit = _ctx_index(
                st, layout, pb, pos_base)
            safe_idx = jnp.where(is_adaptive, idx, 0)
            prob = _gather_cols(probs[:], safe_idx)
            bit, new_rng, new_code, new_prob = _bit_decode(
                rng, code, prob, is_adaptive, is_direct)
            arena_cols = jax.lax.broadcasted_iota(jnp.int32, (N, S), 1)
            upd = (arena_cols == safe_idx[:, None]) & _mask2d(is_adaptive)
            probs[:] = jnp.where(upd, new_prob[:, None], probs[:])

            # renormalize from the input stream
            need = (new_rng < (1 << 24)) & consumes_bit
            in_pos = st["in_pos"]
            safe_ip = jnp.minimum(in_pos, max_in - 1)
            next_byte = jnp.where(in_pos < lens, _gather_cols(comp_v, safe_ip), 0)
            overrun = st["overrun"] + jnp.where(need & (in_pos >= lens), 1, 0)
            new_rng = jnp.where(need, new_rng << 8, new_rng)
            new_code = jnp.where(need, (new_code << 8) | next_byte.astype(_U32),
                                 new_code)
            in_pos = jnp.where(need, in_pos + 1, in_pos)
            st = dict(st, in_pos=in_pos, overrun=overrun)

            # transition + output byte.  The literal-context "previous
            # byte" is always the last byte written (match copies emit one
            # byte per iteration too), so it rides as a loop-carried
            # register instead of an O(N*MO) window gather per bit.
            outv = outb[:]
            back_byte = _gather_cols(
                outv, jnp.clip(out_pos - st["rep0"] - 1, 0, MO - 1))
            st2, emit, emit_byte = _transition(
                st, bit, prev, back_byte, sizes, dict_check,
                layout, lc, lp, pb, pos_base)
            widx = jnp.minimum(out_pos, MO - 1)
            wmask = (out_cols == widx[:, None]) & _mask2d(emit)
            outb[:] = jnp.where(wmask, emit_byte[:, None], outv)
            prev2 = jnp.where(emit, emit_byte, prev)
            return (st2, new_rng, new_code, iters + 1, prev2)

        def interval(c):
            t, c = jax.lax.while_loop(
                lambda tc: tc[0] < F_CHECK,
                lambda tc: (tc[0] + 1, body(tc[1])),
                (jnp.int32(0), c))
            return c

        st, rng, code, iters, _prev = jax.lax.while_loop(
            cond, interval, (st0, rng0, code0, jnp.int32(0), prev0))
        out_ref[:] = outb[:]
        ok_ref[0, :] = (st["phase"] == PH_DONE).astype(_I32)
        ok_ref[1, :] = jnp.full((N,), iters, dtype=_I32)

    code_init = jnp.zeros((N,), dtype=_U32)
    for i in range(5):
        byte = jnp.where(i < comp_lens, comp[:, i], 0)
        code_init = (code_init << 8) | byte.astype(_U32)
    aux = jnp.stack([comp_lens.astype(jnp.int32),
                     out_sizes.astype(jnp.int32),
                     code_init.astype(jnp.int32)])
    operands = [comp, aux]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),          # comp
        pl.BlockSpec(memory_space=pltpu.VMEM),          # aux rows
    ]
    if pos_base:
        operands.append(preset_row)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # preset
    out, okv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N, MO), jnp.int32),
            jax.ShapeDtypeStruct((2, N), jnp.int32),
        ),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, S), jnp.int32),              # prob arena
            pltpu.VMEM((N, MO), jnp.int32),             # decoded window
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*operands)
    return (out[:, :max_out].astype(jnp.uint8), okv[0, :] == 1, okv[1, :])


#: soft VMEM budget for one kernel invocation (bytes): the residents are
#: the decoded window twice (outb scratch + out_ref), the compressed
#: input and the prob arena, all (N, ·) int32.  32x16 KB windows compile
#: and run on a real v5e (~8.3 MB by this accounting, comp included);
#: 64x16 KB does not (MEASUREMENTS.md) — so batches are chunked into
#: lane groups under this budget instead of failing at compile time.
VMEM_BUDGET = 9 << 20


def _lane_group(mo: int, arena: int, max_in: int = 0, max_group=None) -> int:
    per_lane = 4 * (3 * mo + arena + max_in)
    g = max(8, (VMEM_BUDGET // max(per_lane, 1)) // 8 * 8)
    if max_group:
        g = min(g, max_group)
    return g


def batched_decode(streams, params: LzmaParams, out_sizes, *, max_out,
                   fallback, preset, group_of, run_kernel, in_pad=1,
                   recurse=None):
    """Shared batch driver for the Pallas decode kernels.

    Handles lane-group chunking (balanced — a trailing sliver pays full
    fixed cost), sublane padding, array packing, the
    compile-failure/incomplete-lane fallback to the XLA FSM, and result
    slicing.  `group_of(mo_all, in_all) -> int` supplies the kernel's
    VMEM-budget group size; `run_kernel(comp, lens, sizes, mo, preset)`
    runs one group; `recurse` re-enters the caller for sub-groups (so
    per-group shapes stay as tight as a direct call would make them).
    """
    n = len(streams)
    if n == 0:
        return []
    plen = len(preset)
    mo_all = int(max_out if max_out is not None else max(out_sizes)) + plen
    mo_all = 1 << (max(mo_all, 128) - 1).bit_length()  # pow2: stable jit shapes
    in_all = 1 << (max(max(len(s) for s in streams), 16) - 1).bit_length()
    in_all = _round_up(in_all, in_pad)
    group = group_of(mo_all, in_all)
    if n > group:
        # balance the chunks (64 lanes with a 56-lane cap should run
        # 32+32, not 56+8)
        group = max(8, _round_up(-(-n // -(-n // group)), 8))
        results = []
        for lo in range(0, n, group):
            results.extend(recurse(
                streams[lo : lo + group], out_sizes[lo : lo + group]))
        return results

    n_pad = _round_up(n, 8)  # sublane-align the lane axis for Mosaic
    comp = np.zeros((n_pad, in_all), dtype=np.int32)
    lens = np.zeros(n_pad, dtype=np.int32)
    for i, s in enumerate(streams):
        comp[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i] = len(s)
    sizes = np.zeros(n_pad, dtype=np.int32)
    sizes[:n] = np.asarray(out_sizes, dtype=np.int32) + plen
    preset_arr = (jnp.asarray(np.frombuffer(preset, dtype=np.uint8))
                  if plen else None)
    try:
        out, ok, _ = run_kernel(jnp.asarray(comp), jnp.asarray(lens),
                                jnp.asarray(sizes), mo_all, preset_arr)
        out = np.asarray(out)
        ok = np.asarray(ok)
    except Exception:
        # Mosaic lowering / VMEM-exhaustion failures surface at compile
        # time; degrade to the XLA FSM rather than erroring
        if not fallback:
            raise
        out = None
        ok = np.zeros(n_pad, dtype=bool)
    results = []
    retry = [i for i in range(n) if not ok[i]]
    if retry:
        if not fallback:
            raise ValueError(f"pallas decode failed for lanes {retry}")
        from .device_decoder import decode_batch

        redone = decode_batch([streams[i] for i in retry], params,
                              [out_sizes[i] for i in retry], preset=preset)
        redo = dict(zip(retry, redone))
    else:
        redo = {}
    for i in range(n):
        results.append(redo[i] if i in redo
                       else out[i, plen : plen + out_sizes[i]].tobytes())
    return results


def decode_batch_pallas(streams, params: LzmaParams, out_sizes, max_out=None,
                        fallback: bool = True, preset: bytes = b"",
                        max_group=None):
    """Decode raw LZMA streams via the Pallas kernel (same contract as
    device_decoder.decode_batch, including the shared `preset`
    dictionary).  Batches are chunked into lane groups sized to the VMEM
    budget; lanes the kernel cannot finish — or a whole group whose
    shape fails to compile — reroute to the XLA FSM when fallback=True,
    so correctness never depends on the kernel envelope."""
    arena = _round_up(ProbLayout(params.lc, params.lp, params.pb, pos_bits=params.pb).size, 128)
    interpret = jax.default_backend() != "tpu"

    def run_kernel(comp, lens, sizes, mo, preset_arr):
        return decode_pallas(
            comp, lens, sizes, min(int(params.dict_size), 2**31 - 1),
            params.lc, params.lp, params.pb, mo, interpret=interpret,
            preset=preset_arr)

    return batched_decode(
        streams, params, out_sizes, max_out=max_out, fallback=fallback,
        preset=preset,
        group_of=lambda mo, mi: _lane_group(mo, arena, mi, max_group),
        run_kernel=run_kernel,
        recurse=lambda s, o: decode_batch_pallas(
            s, params, o, max_out=max_out, fallback=fallback, preset=preset,
            max_group=max_group))
