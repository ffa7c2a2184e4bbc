"""Ring-window Pallas decoder: O(dict) VMEM per lane, PACKED memory plan.

Third-generation on-device decode kernel (round-2 ceiling work — VERDICT
r1 item 1).  The FSM is VPU-THROUGHPUT-bound: per-iteration cost is
proportional to the total width of the one-hot masked ops
(MEASUREMENTS.md round-2 methodology entry), so v3 shrinks every masked
operand:

  probs (N, SP)  int32 VMEM scratch — TWO 11-bit adaptive probabilities
                 per word (prob[2w] in bits 0..15, prob[2w+1] in bits
                 16..31): the per-bit gather + RMW update run over S/2
                 words instead of S cells.
  win   (N, WP)  int32 VMEM scratch — circular window, FOUR bytes per
                 word; absolute byte p lives in word (p>>2) & (WP-1) at
                 byte lane p&3.  Back-references gather ONE word and
                 shift-extract.  Writes go through a per-lane register
                 accumulator (`wacc`) flushed one masked pass per FOUR
                 emitted bytes — the per-bit window cost drops ~6x.
  out   (N, MOP) int32 VMEM output — packed words, materialized from the
                 ring by the amortized flush (complete words only; the
                 trailing partial word lands in the post-loop flush);
                 unpacked to bytes by the XLA wrapper.
  comp           packed to words by the wrapper; renormalization gathers
                 one word per input byte (unstaged: (N, MI/4) VMEM;
                 staged: (N, C_IN/4) VMEM tile DMA'd from HBM behind the
                 same all-live-lanes-stalled advance protocol as v2).

Loop structure: outer lax.while_loop (any lane active, checked once per
interval) whose body runs F_STEP FSM iterations under a scalar-condition
while_loop, then flushes the ring span.  Between services each lane
emits <= F_STEP bytes, so F_STEP <= W - 4 keeps ring reuse safe.

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
    PH_COPY,
    PH_DONE,
    PH_ERROR,
    PH_ISMATCH,
    _bit_decode,
    _ctx_index,
    _state_struct,
    _transition,
    _I32,
    _U32,
)
from .pallas_decoder import _gather_cols, _mask2d, _round_up

F_STEP = 512   # FSM iterations between flush services (must be <= W - 4)
C_IN = 1024    # staged input window width (bytes; words on the wire)


def _pack_words(rows):
    """(N, 4k) byte-valued i32 -> (N, k) packed little-endian words."""
    return (rows[:, 0::4]
            | (rows[:, 1::4] << 8)
            | (rows[:, 2::4] << 16)
            | (rows[:, 3::4] << 24))


def _unpack_words(words, n_bytes):
    """(N, k) packed words -> (N, n_bytes) u8."""
    n = words.shape[0]
    b = jnp.stack(
        [(words >> (8 * i)) & 0xFF for i in range(4)], axis=2
    ).reshape(n, -1)
    return b[:, :n_bytes].astype(jnp.uint8)


@partial(jax.jit, static_argnames=(
    "dict_size", "lc", "lp", "pb", "max_out", "max_iters", "interpret",
    "stage_input", "copy4", "unroll"))
def decode_pallas_ring(comp, comp_lens, out_sizes, dict_size: int, lc: int,
                       lp: int, pb: int, max_out: int, max_iters: int = 0,
                       interpret: bool = False, preset=None,
                       stage_input: bool = True, copy4: bool = True,
                       unroll: int = 1):
    """Decode N padded streams with an O(dict) packed ring window per lane.

    comp: (N, max_in) int32 byte values (max_in % 4 == 0); `preset`
    ((P,) int32 or None) primes every lane's window (LZTB v2/v3) —
    out_sizes are then ABSOLUTE end positions and the payload sits at
    out[:, P:].  Returns (out u8 (N, max_out), ok (N,), iters (N,)).
    """
    layout = ProbLayout(lc, lp, pb, pos_bits=pb)
    N, max_in = comp.shape
    assert max_in % 4 == 0, "pad comp to a word multiple"
    S = layout.size
    SP = _round_up((S + 1) // 2, 128)
    pos_base = 0 if preset is None else preset.shape[0]

    # ring window: pow2 >= dict (distances are <= dict and the back-read
    # happens before the write), > F_STEP + 4 (emissions between flushes
    # plus the word-granular write lag), capped at the output's pow2
    W = 1 << (max(min(int(dict_size), max_out), F_STEP + 4, 1024)
              - 1).bit_length()
    WP = W // 4
    MO = _round_up(max_out, W)
    MOP = MO // 4
    # ring-reuse safety: a lane emits at most (4 if copy4 else 1) bytes
    # per iteration, and the span written between flush services plus the
    # open word must fit the ring
    f_step = min(F_STEP, (W - 8) // 4) if copy4 else F_STEP
    # with unroll, one while iteration can overshoot f_step by unroll-1
    # sub-steps; keep the per-interval emission bound intact
    f_step -= (unroll - 1) * 1
    assert f_step >= 1, (
        f"unroll={unroll} leaves no flush-interval budget at W={W} "
        f"(f_step={f_step}); lower unroll or grow the ring")
    assert MO % W == 0 and \
        (f_step + unroll - 1) * (4 if copy4 else 1) <= W - 4

    stage_in = bool(stage_input)
    if stage_in:
        assert max_in % C_IN == 0, "pad comp to a C_IN multiple for staging"
    C_INW = C_IN // 4
    num_chunks = max_in // C_IN if stage_in else 1

    if not max_iters:
        # decoded-bits bound, same accounting as pallas_decoder
        max_iters = 28 * max_out + 8 * max_in + 256
    # Outer-loop backstop.  Without staging all live lanes progress in
    # lock-step, so max_iters (a PER-LANE bound) caps the real work.
    # With the shared input window, stalls can serialize lanes in the
    # worst case, so the sound bound is the SUM of per-lane budgets;
    # real streams exit via all-done long before either.
    per_lane = -(-max_iters // f_step)
    n_outer = (N * per_lane if stage_in else per_lane) + num_chunks + 1
    dict_check = max(int(dict_size), 1)

    def kernel(aux_ref, *rest):
        rest = list(rest)
        preset_ref = rest.pop(0) if pos_base else None  # (1, WP) packed
        comp_in = rest.pop(0)                      # packed words
        out_ref, ok_ref, probs, win = rest[0], rest[1], rest[2], rest[3]
        if stage_in:
            instage, insem = rest[4], rest[5]

        probs[:] = jnp.full_like(probs, 1024 | (1024 << 16))
        if pos_base:
            win[:] = jnp.broadcast_to(preset_ref[:], (N, WP))
        else:
            win[:] = jnp.zeros_like(win)
        out_ref[:] = jnp.zeros_like(out_ref)
        out_cols = jax.lax.broadcasted_iota(jnp.int32, (N, MOP), 1)
        win_cols = jax.lax.broadcasted_iota(jnp.int32, (N, WP), 1)
        arena_cols = jax.lax.broadcasted_iota(jnp.int32, (N, SP), 1)
        # Per-lane scalars arrive as ROWS of one (4, N) aux array: a
        # column slice (`ref[:, 0]`) would hand the value — and everything
        # derived from it through the loop carry — a sublane layout that
        # costs ~20% per iteration in relayouts (MEASUREMENTS.md).
        lens = aux_ref[0, :]
        sizes = aux_ref[1, :]
        code0 = aux_ref[2, :].astype(_U32)  # precomputed 5-byte header init
        wacc0 = aux_ref[3, :]               # preset tail bytes of the open word

        if stage_in:
            cp = pltpu.make_async_copy(
                comp_in.at[:, pl.ds(0, C_INW)], instage, insem.at[0])
            cp.start()
            cp.wait()
        rng0 = jnp.full((N,), 0xFFFFFFFF, dtype=_U32)

        st0 = _state_struct(N)
        if pos_base:
            st0["out_pos"] = jnp.full((N,), pos_base, dtype=_I32)
            last_w = preset_ref[0, ((pos_base - 1) >> 2) & (WP - 1)]
            prev0 = jnp.full((N,), 1, dtype=_I32) * (
                (last_w >> (8 * ((pos_base - 1) & 3))) & 0xFF)
        else:
            prev0 = jnp.zeros((N,), dtype=_I32)

        def stalled_of(st, cur):
            if not stage_in:
                return jnp.zeros((N,), dtype=jnp.bool_)
            in_pos = st["in_pos"]
            return (in_pos >= (cur + 1) * C_IN) & (in_pos < lens)

        def fsm_step(carry):
            # The stall machinery (go masking + the `cur` window cursor
            # in the carry) exists ONLY for staged-input mode, so the two
            # modes trace structurally different loop bodies.
            if stage_in:
                t, st, rng, code, prev, wacc, cur = carry
            else:
                t, st, rng, code, prev, wacc = carry
                cur = None
            out_pos = st["out_pos"]

            idx, is_adaptive, is_direct, consumes_bit = _ctx_index(
                st, layout, pb, pos_base)
            if stage_in:
                go = ~stalled_of(st, cur)
                is_adaptive &= go
                is_direct &= go
                consumes_bit &= go
            safe_idx = jnp.where(is_adaptive, idx, 0)
            # packed-pair arena: gather ONE word, extract the half, update
            # it in-register, scatter the word back with the same mask
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

            # renormalize: gather one packed input word, extract the byte
            need = (new_rng < (1 << 24)) & consumes_bit
            in_pos = st["in_pos"]
            if stage_in:
                rel = jnp.clip(in_pos - cur * C_IN, 0, C_IN - 1)
                iw = _gather_cols(instage[:], rel >> 2)
                nb = (iw >> (8 * (rel & 3))) & 0xFF
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

            # back-reference byte: one packed-word gather + shift extract;
            # a read landing in the CURRENT open word comes from the
            # register accumulator instead (it is not in VMEM yet)
            q = out_pos - st1["rep0"] - 1
            gw = _gather_cols(win[:], (q >> 2) & (WP - 1))
            in_acc = (q >> 2) == (out_pos >> 2)
            src_w = jnp.where(in_acc, wacc, gw)
            back_byte = (src_w >> (8 * (q & 3))) & 0xFF
            if copy4:
                # multi-byte copy needs the NEXT window word too: bytes
                # q+1..q+3 span at most words {q>>2, q>>2+1}
                gw2 = _gather_cols(win[:], ((q >> 2) + 1) & (WP - 1))

            st2, emit, emit_byte = _transition(
                st1, bit, prev, back_byte, sizes, dict_check,
                layout, lc, lp, pb, pos_base)
            if stage_in:
                # stalled lanes: this iteration never happened
                st2 = {k: jnp.where(go, st2[k], st[k]) for k in st2}
                emit &= go
            # accumulate the emitted byte; flush the word to the ring when
            # its 4th byte lands (one masked pass per four bytes)
            nwacc = jnp.where(emit, wacc | (emit_byte << (8 * (out_pos & 3))),
                              wacc)
            closes = emit & ((out_pos & 3) == 3)
            prev2 = jnp.where(emit, emit_byte, prev)

            if not copy4:
                wmask = (win_cols == ((out_pos >> 2) & (WP - 1))[:, None]) \
                    & _mask2d(closes)
                win[:] = jnp.where(wmask, nwacc[:, None], win[:])
                nwacc = jnp.where(closes, 0, nwacc)
                if stage_in:
                    return (t + 1, st2, new_rng, new_code, prev2, nwacc, cur)
                return (t + 1, st2, new_rng, new_code, prev2, nwacc)

            # ---- multi-byte match copy (VERDICT r1 item 1 follow-up) ----
            # A lane still in PH_COPY after the generic 1-byte emit extends
            # the copy by up to 3 more bytes this iteration, bounded by the
            # remaining length, the match distance (no self-overlap except
            # the dist==1 RLE special case, which replicates the byte just
            # emitted), and the open destination word (so the whole
            # extension rides the register accumulator and the SAME single
            # masked ring write as the generic byte).  Cost: gw2 above plus
            # ~25 per-lane vector ops; payoff: match bytes move 4-per-
            # iteration instead of 1 (Decoder.java:288-294 semantics).
            out_pos1 = st2["out_pos"]
            ext = (st["phase"] == PH_COPY) & (st2["phase"] == PH_COPY)
            if stage_in:
                ext &= go
            dist = st2["rep0"] + 1
            destcap = 4 - (out_pos1 & 3)
            e = jnp.minimum(
                jnp.minimum(3, st2["length"]),
                jnp.minimum(destcap, jnp.where(dist == 1, 3, dist)))
            e = jnp.where(ext, e, 0)
            q1 = out_pos1 - dist
            # source words, with open-word reads served from the merged
            # accumulator (word out_pos>>2 is not in VMEM yet — or was
            # closed THIS iteration and its write is folded in below)
            wA = jnp.where((q1 >> 2) == (q >> 2), gw, gw2)
            wA = jnp.where((q1 >> 2) == (out_pos >> 2), nwacc, wA)
            uB = jnp.where(((q1 >> 2) + 1) == (out_pos >> 2),
                           nwacc, gw2).astype(_U32)
            uA = wA.astype(_U32)
            sh = (8 * (q1 & 3)).astype(_U32)
            funnel = (uA >> sh) | jnp.where(
                sh == 0, 0, uB << ((32 - sh) & 31))
            src = jnp.where(dist == 1, emit_byte * 0x01010101,
                            funnel.astype(_I32))
            emask = jnp.where(e == 3, 0xFFFFFF,
                              jnp.where(e == 2, 0xFFFF,
                                        jnp.where(e == 1, 0xFF, 0)))
            frag = src & emask
            nwacc_res = jnp.where(closes, 0, nwacc)
            nwacc2 = nwacc_res | (frag << (8 * (out_pos1 & 3)))
            closes2 = (e > 0) & (((out_pos1 & 3) + e) == 4)
            # one merged ring write: closes and closes2 are mutually
            # exclusive and target the same word index (out_pos>>2)
            fire = closes | closes2
            wval = jnp.where(closes2, nwacc2, nwacc)
            wmask = (win_cols == ((out_pos >> 2) & (WP - 1))[:, None]) \
                & _mask2d(fire)
            win[:] = jnp.where(wmask, wval[:, None], win[:])
            nwacc3 = jnp.where(closes2, 0, nwacc2)
            prev2 = jnp.where(e > 0,
                              (frag >> (8 * jnp.maximum(e - 1, 0))) & 0xFF,
                              prev2)
            # advance the register file past the extension, mirroring
            # _transition's completion/overrun checks
            out_pos2 = out_pos1 + e
            length2 = st2["length"] - e
            ph2 = jnp.where((e > 0) & (length2 == 0), PH_ISMATCH,
                            st2["phase"])
            eos_l = sizes < 0
            bound = jnp.abs(sizes)
            ph2 = jnp.where((e > 0) & (out_pos2 > bound), PH_ERROR, ph2)
            ph2 = jnp.where(~eos_l & (out_pos2 >= bound) & (ph2 == PH_ISMATCH)
                            & (e > 0), PH_DONE, ph2)
            st3 = dict(st2, out_pos=out_pos2, length=length2, phase=ph2)
            if stage_in:
                return (t + 1, st3, new_rng, new_code, prev2, nwacc3, cur)
            return (t + 1, st3, new_rng, new_code, prev2, nwacc3)

        # The service interval runs a FIXED F_STEP iterations under a
        # while_loop with a SCALAR-ONLY condition: the per-bit liveness
        # check (a cross-lane jnp.any + scalar readback) moves to the
        # outer cond, running once per interval.  Done / stalled lanes
        # spin as no-ops (MEASUREMENTS.md round-2 methodology entry).
        def fsm_cond(carry):
            return carry[0] < f_step

        def fsm_multi(carry):
            # `unroll` full FSM steps per while iteration (A/B probe for
            # the multi-bit-per-iteration lever; see MEASUREMENTS.md)
            for _ in range(unroll):
                carry = fsm_step(carry)
            return carry

        def flush(st, fbw, partial):
            # ring word slots are absolute word positions mod WP: one
            # masked select materializes the whole unflushed span.
            # `partial` extends the flush through the open word (post-loop
            # only, after wacc lands in the ring).
            posw = (st["out_pos"] + (3 if partial else 0)) >> 2
            m = (out_cols >= fbw[:, None]) & (out_cols < posw[:, None])
            out_ref[:] = jnp.where(m, jnp.tile(win[:], (1, MOP // WP)),
                                   out_ref[:])
            return posw

        def cond(carry):
            st = carry[0]
            active = (st["phase"] != PH_DONE) & (st["phase"] != PH_ERROR)
            return jnp.any(active) & (carry[6] < n_outer)

        def body(carry):
            st, rng, code, prev, wacc, cur, outer, fbw = carry
            if stage_in:
                _, st, rng, code, prev, wacc, cur = jax.lax.while_loop(
                    fsm_cond, fsm_multi,
                    (jnp.int32(0), st, rng, code, prev, wacc, cur))
            else:
                _, st, rng, code, prev, wacc = jax.lax.while_loop(
                    fsm_cond, fsm_multi,
                    (jnp.int32(0), st, rng, code, prev, wacc))
            fbw = flush(st, fbw, partial=False)
            if stage_in:
                active = (st["phase"] != PH_DONE) & (st["phase"] != PH_ERROR)
                adv = (~jnp.any(active & ~stalled_of(st, cur))).astype(_I32)
                # every live lane drained the window: advance + refetch.
                # The copy is unconditional (a redundant refetch of the
                # same window is harmless and cheap) — Mosaic lowers the
                # full-batch form with a traced offset, not @pl.when DMA.
                ncur = jnp.minimum(cur + adv, num_chunks - 1)
                cp = pltpu.make_async_copy(
                    comp_in.at[:, pl.ds(ncur * C_INW, C_INW)], instage,
                    insem.at[0])
                cp.start()
                cp.wait()
                cur = ncur
            return (st, rng, code, prev, wacc, cur, outer + 1, fbw)

        fbw0 = jnp.full((N,), pos_base >> 2, dtype=_I32)
        st, rng, code, prev, wacc, cur, outer, fbw = jax.lax.while_loop(
            cond, body,
            (st0, rng0, code0, prev0, wacc0, jnp.int32(0), jnp.int32(0),
             fbw0))
        # land any open partial word in the ring, then flush through it
        open_w = (st["out_pos"] & 3) != 0
        wmask = (win_cols == ((st["out_pos"] >> 2) & (WP - 1))[:, None]) \
            & _mask2d(open_w)
        win[:] = jnp.where(wmask, wacc[:, None], win[:])
        flush(st, fbw, partial=True)
        # row writes for the same layout reason as the row reads above
        ok_ref[0, :] = (st["phase"] == PH_DONE).astype(_I32)
        ok_ref[1, :] = jnp.full((N,), outer * f_step, dtype=_I32)

    # 5-byte big-endian code preload (RangeDecoder.Init) computed in XLA:
    # doing it in-kernel needs per-byte column slices of comp (sublane
    # relayout tax — see the aux comment in the kernel)
    code0 = jnp.zeros((N,), dtype=_U32)
    for i in range(5):
        byte = jnp.where(i < comp_lens, comp[:, i], 0)
        code0 = (code0 << 8) | byte.astype(_U32)
    # preset tail bytes of the first open word (pos_base % 4 != 0): they
    # must sit in the write accumulator so in-word back-reads and the
    # word-close flush see them
    if pos_base:
        wacc0 = jnp.zeros((), jnp.int32)
        for q in range(pos_base & ~3, pos_base):
            wacc0 = wacc0 | (preset[q].astype(jnp.int32) << (8 * (q & 3)))
        wacc0 = jnp.broadcast_to(wacc0, (N,))
    else:
        wacc0 = jnp.zeros((N,), jnp.int32)
    aux = jnp.stack([comp_lens.astype(jnp.int32),
                     out_sizes.astype(jnp.int32),
                     code0.astype(jnp.int32),
                     wacc0])
    operands = [aux]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),          # aux rows
    ]
    if pos_base:
        # primed ring row: absolute byte p at slot p & (W-1), packed to
        # words, for the last min(W, pos_base) preset bytes
        lo = max(0, pos_base - W)
        slots = np.arange(lo, pos_base) & (W - 1)
        ring_row = jnp.zeros((1, W), dtype=jnp.int32).at[0, slots].set(
            preset[lo:pos_base].astype(jnp.int32))
        operands.append(_pack_words(ring_row))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    operands.append(_pack_words(comp))
    in_specs.append(pl.BlockSpec(
        memory_space=pl.ANY if stage_in else pltpu.VMEM))
    scratch = [
        pltpu.VMEM((N, SP), jnp.int32),                 # packed prob pairs
        pltpu.VMEM((N, WP), jnp.int32),                 # packed ring window
    ]
    if stage_in:
        scratch += [pltpu.VMEM((N, C_INW), jnp.int32),  # packed input window
                    pltpu.SemaphoreType.DMA((1,))]
    out, okv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N, MOP), jnp.int32),
            jax.ShapeDtypeStruct((2, N), jnp.int32),
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
    return (_unpack_words(out, max_out), okv[0, :] == 1, okv[1, :])


#: VMEM accounting for one invocation (bytes per lane): packed out (MO) +
#: packed prob pairs (~S*2) + packed ring (W) + packed input (MI or C_IN)
VMEM_BUDGET = 9 << 20


def _lane_group(mo, arena, w, fin, max_group=None):
    per_lane = mo + 2 * arena + w + fin
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
    behind a shared staged window; off by default (the packed unstaged
    gather is cheap and stall-free).  The valve opens automatically: a
    group whose unstaged shape fails to compile (compressed input too
    large for VMEM) retries once with stage_input=True before falling
    back to the XLA FSM."""
    from .pallas_decoder import batched_decode

    arena = ProbLayout(params.lc, params.lp, params.pb, pos_bits=params.pb).size
    w_raw = 1 << (max(int(params.dict_size), F_STEP + 4, 1024) - 1).bit_length()
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
        return _lane_group(mo, arena, min(w_raw, 1 << (max(mo, 1024) - 1).bit_length()),
                           C_IN if stage_input else mi, max_group)

    return batched_decode(
        streams, params, out_sizes, max_out=max_out, fallback=fallback,
        preset=preset, group_of=group_of, run_kernel=run_kernel,
        in_pad=C_IN if stage_input else 4,
        recurse=lambda s, o: decode_batch_ring(
            s, params, o, max_out=max_out, fallback=fallback, preset=preset,
            max_group=max_group, stage_input=stage_input))
