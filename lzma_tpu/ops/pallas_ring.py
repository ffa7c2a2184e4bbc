"""Ring-window Pallas decoder: O(dict) VMEM per lane instead of O(block).

The second-generation on-device decode kernel (DESIGN-NOTES round-2 plan
item 4).  `ops/pallas_decoder.py` keeps the whole decoded block resident
in VMEM and pays two O(lanes x block) masked ops per decoded bit (the
back-reference gather and the output write) plus an O(lanes x comp)
gather per renormalization byte.  This kernel is the OutWindow design
(reference OutWindow.java:41-67: a circular dictionary buffer flushed to
the output stream on wrap) mapped onto the Pallas memory model:

  win   (N, W)   int32 VMEM scratch — circular window, W = pow2 >= dict+2;
                 absolute position p lives at slot p & (W-1).  Per-bit
                 masked ops shrink from O(N x block) to O(N x W).
  out   (N, MO)  int32 VMEM output — written only by the amortized flush:
                 every F_STEP iterations the span [flush_base, out_pos)
                 is materialized with ONE masked select over (N, MO)
                 against jnp.tile(win, MO/W) (ring slots are absolute
                 positions mod W, so no gather is needed — the same
                 staging trick the Pallas serializer uses for its output
                 ring).  Amortized cost O(N x MO / F_STEP) per iteration.
  comp  (N, MI)  int32 HBM input — renormalization bytes are read from a
                 (N, C_IN) VMEM staging tile holding the GLOBAL input
                 window [cur*C_IN, (cur+1)*C_IN) of every stream.  Mosaic
                 lowers only full-batch DMAs (per-lane row slices crash
                 the backend compiler — tools/probe_dma2.py), so the
                 window is shared: a lane whose in_pos runs past the
                 current window STALLS (its FSM step becomes a no-op) and
                 the window advances when every live lane is stalled.
                 Lock-step lanes consume input at nearly the same rate on
                 uniform blocks, so stall waste is boundary-only.

Loop structure: outer lax.while_loop (any lane active) whose body runs
F_STEP lock-step FSM iterations (inner fori), flushes the ring span into
`out`, and advances/refetches the input window when all live lanes have
drained it.  Between services each lane emits <= F_STEP bytes, so
F_STEP <= W - 1 makes ring reuse safe by construction.

The FSM itself is the shared select network of `ops/device_decoder`
(`_ctx_index` / `_bit_decode` / `_transition`) — bit-exact with the XLA
backend and the scalar oracle by sharing the semantics in one place
(reference decode loop: Decoder.java:205-301).
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
from .pallas_decoder import _gather_cols, _mask2d, _round_up

F_STEP = 512   # FSM iterations between flush services (must be < W)
C_IN = 1024    # staged input window width (bytes, as i32 lanes)


@partial(jax.jit, static_argnames=(
    "dict_size", "lc", "lp", "pb", "max_out", "max_iters", "interpret",
    "stage_input"))
def decode_pallas_ring(comp, comp_lens, out_sizes, dict_size: int, lc: int,
                       lp: int, pb: int, max_out: int, max_iters: int = 0,
                       interpret: bool = False, preset=None,
                       stage_input: bool = True):
    """Decode N padded streams with an O(dict) ring window per lane.

    Same contract as pallas_decoder.decode_pallas: comp (N, max_in) int32
    byte values; `preset` ((P,) int32 or None) primes every lane's window
    (LZTB v2/v3) — out_sizes are then ABSOLUTE end positions and the
    payload sits at out[:, P:].  Returns (out u8 (N, max_out), ok (N,),
    iters (N,)).
    """
    layout = ProbLayout(lc, lp, pb)
    N, max_in = comp.shape
    S = _round_up(layout.size, 128)
    pos_base = 0 if preset is None else preset.shape[0]

    # ring window: pow2 >= dict (distances are <= dict and the back-read
    # happens before the write, so slot reuse at exactly W=dict is safe),
    # > F_STEP (emissions between flushes), capped at the output's pow2
    # (a dictionary wider than the block buys nothing)
    W = 1 << (max(min(int(dict_size), max_out), F_STEP + 2, 1024)
              - 1).bit_length()
    MO = _round_up(max_out, W)
    assert MO % W == 0 and F_STEP < W

    stage_in = bool(stage_input)
    if stage_in:
        assert max_in % C_IN == 0, "pad comp to a C_IN multiple for staging"
    num_chunks = max_in // C_IN if stage_in else 1

    if pos_base:
        # primed ring row: absolute position p at slot p & (W-1), for the
        # last min(W, pos_base) preset bytes (any deeper is out of reach)
        lo = max(0, pos_base - W)
        slots = np.arange(lo, pos_base) & (W - 1)
        ring_row = jnp.zeros((1, W), dtype=jnp.int32).at[0, slots].set(
            preset[lo:pos_base].astype(jnp.int32))
    if not max_iters:
        # decoded-bits bound, same accounting as pallas_decoder
        max_iters = 28 * max_out + 8 * max_in + 256
    # Outer-loop backstop.  Without staging all live lanes progress in
    # lock-step, so max_iters (a PER-LANE bound) caps the real work.
    # With the shared input window, stalls can serialize lanes in the
    # worst case (one lane grinding while the rest wait), so the sound
    # bound is the SUM of per-lane budgets; real streams exit via
    # all-done (or per-lane overrun/size checks) long before either.
    per_lane = -(-max_iters // F_STEP)
    n_outer = (N * per_lane if stage_in else per_lane) + num_chunks + 1
    dict_check = max(int(dict_size), 1)

    def kernel(lens_ref, sizes_ref, *rest):
        rest = list(rest)
        preset_ref = rest.pop(0) if pos_base else None
        comp_in = rest.pop(0)                      # HBM when staging, VMEM else
        out_ref, ok_ref, probs, win = rest[0], rest[1], rest[2], rest[3]
        if stage_in:
            instage, insem = rest[4], rest[5]

        probs[:] = jnp.full_like(probs, 1024)
        if pos_base:
            win[:] = jnp.broadcast_to(preset_ref[:], (N, W))
        else:
            win[:] = jnp.zeros_like(win)
        out_ref[:] = jnp.zeros_like(out_ref)
        out_cols = jax.lax.broadcasted_iota(jnp.int32, (N, MO), 1)
        win_cols = jax.lax.broadcasted_iota(jnp.int32, (N, W), 1)
        lens = lens_ref[:, 0]
        sizes = sizes_ref[:, 0]

        if stage_in:
            cp = pltpu.make_async_copy(
                comp_in.at[:, pl.ds(0, C_IN)], instage, insem.at[0])
            cp.start()
            cp.wait()
            head = instage
        else:
            head = comp_in

        # range decoder init: code = 5 big-endian header bytes
        code0 = jnp.zeros((N,), dtype=_U32)
        for i in range(5):
            byte = jnp.where(i < lens, head[:, i], 0)
            code0 = (code0 << 8) | byte.astype(_U32)
        rng0 = jnp.full((N,), 0xFFFFFFFF, dtype=_U32)

        st0 = _state_struct(N)
        if pos_base:
            st0["out_pos"] = jnp.full((N,), pos_base, dtype=_I32)
            prev0 = jnp.full((N,), 1, dtype=_I32) * preset_ref[0, (pos_base - 1) & (W - 1)]
        else:
            prev0 = jnp.zeros((N,), dtype=_I32)

        def stalled_of(st, cur):
            # a live lane whose next input byte lies past the staged
            # window pauses until the window advances; lanes already past
            # their own stream read zeros (masked below) and never stall
            if not stage_in:
                return jnp.zeros((N,), dtype=jnp.bool_)
            in_pos = st["in_pos"]
            return (in_pos >= (cur + 1) * C_IN) & (in_pos < lens)

        def fsm_step(carry):
            t, st, rng, code, prev, cur = carry
            out_pos = st["out_pos"]
            go = ~stalled_of(st, cur)

            idx, is_adaptive, is_direct, consumes_bit = _ctx_index(
                st, layout, pb, pos_base)
            is_adaptive &= go
            is_direct &= go
            consumes_bit &= go
            safe_idx = jnp.where(is_adaptive, idx, 0)
            prob = _gather_cols(probs[:], safe_idx)
            bit, new_rng, new_code, new_prob = _bit_decode(
                rng, code, prob, is_adaptive, is_direct)
            arena_cols = jax.lax.broadcasted_iota(jnp.int32, (N, S), 1)
            upd = (arena_cols == safe_idx[:, None]) & _mask2d(is_adaptive)
            probs[:] = jnp.where(upd, new_prob[:, None], probs[:])

            # renormalize from the staged input window
            need = (new_rng < (1 << 24)) & consumes_bit
            in_pos = st["in_pos"]
            if stage_in:
                rel = jnp.clip(in_pos - cur * C_IN, 0, C_IN - 1)
                nb = _gather_cols(instage[:], rel)
            else:
                nb = _gather_cols(comp_in[:], jnp.minimum(in_pos, max_in - 1))
            next_byte = jnp.where(in_pos < lens, nb, 0)
            overrun = st["overrun"] + jnp.where(need & (in_pos >= lens), 1, 0)
            new_rng = jnp.where(need, new_rng << 8, new_rng)
            new_code = jnp.where(need, (new_code << 8) | next_byte.astype(_U32),
                                 new_code)
            in_pos = jnp.where(need, in_pos + 1, in_pos)
            st1 = dict(st, in_pos=in_pos, overrun=overrun)

            # transition + output byte; the window is the ring
            winv = win[:]
            back_byte = _gather_cols(
                winv, (out_pos - st1["rep0"] - 1) & (W - 1))
            st2, emit, emit_byte = _transition(
                st1, bit, prev, back_byte, sizes, dict_check,
                layout, lc, lp, pb, pos_base)
            # stalled lanes: this iteration never happened
            st2 = {k: jnp.where(go, st2[k], st[k]) for k in st2}
            emit &= go
            wmask = (win_cols == (out_pos & (W - 1))[:, None]) & _mask2d(emit)
            win[:] = jnp.where(wmask, emit_byte[:, None], winv)
            prev2 = jnp.where(emit, emit_byte, prev)
            return (t + 1, st2, new_rng, new_code, prev2, cur)

        def fsm_cond(carry):
            # exit the service interval early once every lane is done,
            # errored, or stalled on the staged input window
            t, st = carry[0], carry[1]
            live = (st["phase"] != PH_DONE) & (st["phase"] != PH_ERROR)
            return jnp.any(live & ~stalled_of(st, carry[5])) & (t < F_STEP)

        def flush(st, fb):
            # ring slots are absolute positions mod W: one masked select
            # materializes the whole unflushed span, no gather
            pos = st["out_pos"]
            m = (out_cols >= fb[:, None]) & (out_cols < pos[:, None])
            out_ref[:] = jnp.where(m, jnp.tile(win[:], (1, MO // W)), out_ref[:])
            return pos

        def cond(carry):
            st = carry[0]
            active = (st["phase"] != PH_DONE) & (st["phase"] != PH_ERROR)
            return jnp.any(active) & (carry[5] < n_outer)

        def body(carry):
            st, rng, code, prev, cur, outer, fb = carry
            _, st, rng, code, prev, cur = jax.lax.while_loop(
                fsm_cond, fsm_step, (jnp.int32(0), st, rng, code, prev, cur))
            fb = flush(st, fb)
            if stage_in:
                active = (st["phase"] != PH_DONE) & (st["phase"] != PH_ERROR)
                adv = (~jnp.any(active & ~stalled_of(st, cur))).astype(_I32)
                # every live lane drained the window: advance + refetch.
                # The copy is unconditional (a redundant refetch of the
                # same window is harmless and cheap) — Mosaic lowers the
                # full-batch form with a traced offset, not @pl.when DMA.
                ncur = jnp.minimum(cur + adv, num_chunks - 1)
                cp = pltpu.make_async_copy(
                    comp_in.at[:, pl.ds(ncur * C_IN, C_IN)], instage,
                    insem.at[0])
                cp.start()
                cp.wait()
                cur = ncur
            return (st, rng, code, prev, cur, outer + 1, fb)

        fb0 = jnp.full((N,), pos_base, dtype=_I32)
        st, rng, code, prev, cur, outer, fb = jax.lax.while_loop(
            cond, body,
            (st0, rng0, code0, prev0, jnp.int32(0), jnp.int32(0), fb0))
        flush(st, fb)
        ok_ref[:, 0] = (st["phase"] == PH_DONE).astype(_I32)
        ok_ref[:, 1] = jnp.full((N,), outer * F_STEP, dtype=_I32)

    operands = [comp_lens.reshape(-1, 1), out_sizes.reshape(-1, 1)]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),          # lens
        pl.BlockSpec(memory_space=pltpu.VMEM),          # sizes
    ]
    if pos_base:
        operands.append(ring_row)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    operands.append(comp)
    in_specs.append(pl.BlockSpec(
        memory_space=pl.ANY if stage_in else pltpu.VMEM))
    scratch = [
        pltpu.VMEM((N, S), jnp.int32),                  # prob arena
        pltpu.VMEM((N, W), jnp.int32),                  # ring window
    ]
    if stage_in:
        scratch += [pltpu.VMEM((N, C_IN), jnp.int32),   # input window
                    pltpu.SemaphoreType.DMA((1,))]
    out, okv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N, MO), jnp.int32),
            jax.ShapeDtypeStruct((N, 2), jnp.int32),
        ),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*operands)
    return (out[:, :max_out].astype(jnp.uint8), okv[:, 0] == 1, okv[:, 1])


#: VMEM accounting for one invocation: out + probs + ring window + input
#: staging, (N, ·) int32 (the compressed input stays in HBM when staging
#: is on; the flush's masked tile is fused by Mosaic — 64x16 KB with a
#: 4 KB ring compiles AND runs on the real v5e under this accounting,
#: MEASUREMENTS.md)
VMEM_BUDGET = 9 << 20


def _lane_group(mo, arena, w, fin, max_group=None):
    per_lane = 4 * (mo + arena + w + fin)
    g = max(8, (VMEM_BUDGET // max(per_lane, 1)) // 8 * 8)
    if max_group:
        g = min(g, max_group)
    return g


def decode_batch_ring(streams, params: LzmaParams, out_sizes, max_out=None,
                      fallback: bool = True, preset: bytes = b"",
                      max_group=None, stage_input: bool = False):
    """Decode raw LZMA streams via the ring kernel (same contract as
    pallas_decoder.decode_batch_pallas).  Lanes the kernel cannot finish —
    or a whole group whose shape fails to compile — reroute to the XLA FSM
    when fallback=True.  stage_input keeps the compressed streams in HBM
    behind a shared staged window (chip-measured neutral-to-slightly-
    slower than the VMEM-resident gather up to 64 KB blocks, so off by
    default).  The valve opens automatically: a group whose unstaged
    shape fails to compile (compressed input too large for VMEM) retries
    once with stage_input=True before falling back to the XLA FSM."""
    from .pallas_decoder import batched_decode

    arena = _round_up(ProbLayout(params.lc, params.lp, params.pb).size, 128)
    w_raw = 1 << (max(int(params.dict_size), F_STEP + 2, 1024) - 1).bit_length()
    interpret = jax.default_backend() != "tpu"

    def run_kernel(comp, lens, sizes, mo, preset_arr):
        try:
            return decode_pallas_ring(
                comp, lens, sizes, min(int(params.dict_size), 2**31 - 1),
                params.lc, params.lp, params.pb, mo, interpret=interpret,
                preset=preset_arr, stage_input=stage_input)
        except Exception:
            if stage_input:
                raise
            # VMEM relief valve: a shape that fails to compile with the
            # compressed input resident (long streams) gets ONE retry with
            # the input staged from HBM before degrading to the XLA FSM
            pad = -comp.shape[1] % C_IN
            if pad:
                comp = jnp.pad(comp, ((0, 0), (0, pad)))
            return decode_pallas_ring(
                comp, lens, sizes, min(int(params.dict_size), 2**31 - 1),
                params.lc, params.lp, params.pb, mo, interpret=interpret,
                preset=preset_arr, stage_input=True)

    def group_of(mo, mi):
        return _lane_group(mo, arena, min(w_raw, mo),
                           C_IN if stage_input else mi, max_group)

    return batched_decode(
        streams, params, out_sizes, max_out=max_out, fallback=fallback,
        preset=preset, group_of=group_of, run_kernel=run_kernel,
        in_pad=C_IN if stage_input else 1,
        recurse=lambda s, o: decode_batch_ring(
            s, params, o, max_out=max_out, fallback=fallback, preset=preset,
            max_group=max_group, stage_input=stage_input))
