"""Pallas range-coder serializer: the adaptive bit-serial coder in VMEM.

The on-device counterpart of `ops/device_encoder.serialize`: consumes the
precomputed per-lane (ctx, bit) streams and produces LZMA bytes, with the
probability arena resident in VMEM for the kernel's whole lifetime — the
formulation XLA cannot express (its scatter into a loop carry copies the
arena every iteration; see DESIGN-NOTES.md).

Memory plan (N lanes, arena S, max_bits B):
  probs   (N, S/2) int32 VMEM scratch   — adaptive model, TWO 11-bit
                                          probabilities per word (the
                                          ring decoder's packed-pair
                                          plan, round 3): the per-bit
                                          gather + RMW update — the
                                          dominant masked-op width at
                                          lc3 — runs over S/2 words
  out     (N, max_out) int32 VMEM out   — compressed bytes (as i32)
  ring    (N, RING) int32 VMEM scratch  — staged bytes between out flushes
  packed  (N, B) int32 HBM input        — (ctx, bit) pairs packed into one
                                          word each, DMA'd in (N, CHUNK)
                                          tiles, double-buffered (one
                                          masked tile gather per step
                                          instead of two)
Per-lane coder registers (low/carry/range/cache/...) live as loop-carried
vectors.  One (ctx, bit) is consumed per inner step, exactly mirroring the
XLA serializer's semantics (bit-exact, asserted in tests).  The per-chunk
inner loop exits as soon as no lane has work left in the chunk (coding,
draining a carry run, or the 5-byte final flush); the fixed 1.5x step
slack is only a cap for pathological drain runs, whose overflow reroutes
to the XLA serializer via the `consumed` check.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RING = 256
CHUNK = 512  # (ctx,bit) entries DMA'd per tile


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _mask2d(m):
    """(N,) bool -> (N,1) bool; Mosaic only lowers minor-dim insertion for
    32-bit types, so the reshape routes through int32."""
    return m.astype(jnp.int32)[:, None] != 0


@partial(jax.jit, static_argnames=("arena_size", "max_out", "interpret",
                                   "unroll"))
def serialize_pallas(ctx, bits, totals, arena_size: int, max_out: int,
                     interpret: bool = False, unroll: int = 1):
    """Drop-in replacement for device_encoder.serialize (same contract).

    `unroll` = (ctx, bit) entries processed per inner-loop iteration —
    an EXACT unroll (the bit stream is known in advance), kept for
    A/B probes but default 1: chip-measured 4-15% SLOWER at 2/4
    (MEASUREMENTS.md round 3 — the per-sub-step cost is a serial
    dependency chain, which unrolling cannot amortize; what does help
    is lane count, which the packed-pair arena's VMEM savings unlocks:
    256 lanes now compile and set the 7.21 MB/s record)."""
    n_real, B = ctx.shape
    # Mosaic tiles the lane axis in sublanes of 8: unaligned lane counts
    # fail to lower on real hardware (memref_slice of a 12-row tile), so
    # pad with idle lanes (totals=0) and slice them back off below
    N = _round_up(n_real, 8)
    if N != n_real:
        rows = ((0, N - n_real), (0, 0))
        ctx = jnp.pad(ctx, rows, constant_values=-3)
        bits = jnp.pad(bits, rows)
        totals = jnp.pad(totals, (0, N - n_real))
    SP = _round_up((arena_size + 1) // 2, 128)  # packed prob pairs
    B_pad = _round_up(B, CHUNK)
    if B_pad != B:
        pad = ((0, 0), (0, B_pad - B))
        ctx = jnp.pad(ctx, pad, constant_values=-3)
        bits = jnp.pad(bits, pad)
    # one packed word per (ctx, bit): ctx >= -3, so (ctx+4)*2+bit >= 2
    packed = ((ctx + 4) << 1) | bits
    max_out_pad = _round_up(max_out, RING)
    num_chunks = B_pad // CHUNK
    step_cap = CHUNK + CHUNK // 2 + 16

    def kernel(totals_ref, pk_hbm, out_ref, lens_ref,
               probs, ring, pk_tile, sems):
        # lens_ref row 0 = emitted bytes; row 1 = consumed bits or -1 on
        # staging-ring overflow — the wrapper falls back to the XLA
        # serializer unless row 1 == totals for every lane.  Aux values
        # travel as ROWS ((1,N)/(2,N)): column slices poison the
        # loop-carry layout (tools/probe_ring_ablate.py `rowaux`).
        out_ref[:] = jnp.zeros_like(out_ref)
        probs[:] = jnp.full_like(probs, 1024 | (1024 << 16))
        ring[:] = jnp.zeros_like(ring)
        arena_cols = jax.lax.broadcasted_iota(jnp.int32, (N, SP), 1)
        ring_cols = jax.lax.broadcasted_iota(jnp.int32, (N, RING), 1)
        out_cols = jax.lax.broadcasted_iota(jnp.int32, (N, max_out_pad), 1)
        tile_cols = jax.lax.broadcasted_iota(jnp.int32, (N, CHUNK), 1)
        tot = totals_ref[0, :]

        def copy_chunk(slot, chunk_idx):
            return pltpu.make_async_copy(
                pk_hbm.at[:, pl.ds(chunk_idx * CHUNK, CHUNK)],
                pk_tile.at[slot], sems.at[slot])

        copy_chunk(0, 0).start()

        def flush(out_vals, ring_vals, flush_base, out_pos):
            # ring is indexed by absolute position mod RING, so the staged
            # byte for output column j is ring[:, j % RING] — a static tile,
            # not a gather (Mosaic supports only full-shape dynamic gathers)
            m = (out_cols >= flush_base[:, None]) & (out_cols < out_pos[:, None])
            vals = jnp.tile(ring_vals, (1, max_out_pad // RING))
            return jnp.where(m, vals, out_vals)

        # global registers
        def chunk_body(chunk_idx, carry):
            (low, carry_f, rng, cache, pending, drain, drain_byte,
             bit_pos, out_pos, flush_i, flush_base, err) = carry
            slot = chunk_idx % 2

            @pl.when(chunk_idx + 1 < num_chunks)
            def _():
                copy_chunk((chunk_idx + 1) % 2, chunk_idx + 1).start()

            copy_chunk(slot, chunk_idx).wait()
            last_chunk = chunk_idx == num_chunks - 1

            def bit_body(inner):
                (t, low, carry_f, rng, cache, pending, drain, drain_byte,
                 bit_pos, out_pos, flush_i, err) = inner
                draining = drain > 0
                in_chunk = (bit_pos >= chunk_idx * CHUNK) & (
                    bit_pos < (chunk_idx + 1) * CHUNK)
                has_bits = (bit_pos < tot) & in_chunk
                flushing = (~draining) & (bit_pos >= tot) & (flush_i < 5) & (
                    last_chunk)
                coding = (~draining) & has_bits

                local = jnp.clip(bit_pos - chunk_idx * CHUNK, 0, CHUNK - 1)
                # tpu.dynamic_gather spans one vreg only; use a masked sum
                # over the packed (ctx,bit) tile — one pass, not two
                sel = tile_cols == local[:, None]
                pk = jnp.sum(jnp.where(sel, pk_tile[slot], 0), axis=1)
                cx = (pk >> 1) - 4
                bt = pk & 1
                adaptive = coding & (cx >= 0)
                direct = coding & (cx == -1)

                # packed-pair arena: gather ONE word, extract the half,
                # update in-register, scatter the word back (same mask)
                safe_cx = jnp.where(adaptive, cx, 0)
                wi = safe_cx >> 1
                hi = safe_cx & 1
                mask = (arena_cols == wi[:, None]) & _mask2d(adaptive)
                word = jnp.sum(jnp.where(mask, probs[:], 0), axis=1)
                prob = jnp.where(hi == 1, word >> 16, word) & 0xFFFF
                bound = (rng >> 11) * prob.astype(jnp.uint32)
                new_prob = jnp.where(
                    bt == 0, prob + ((2048 - prob) >> 5), prob - (prob >> 5))
                nword = jnp.where(hi == 1,
                                  (word & 0xFFFF) | (new_prob << 16),
                                  (word - (word & 0xFFFF)) | new_prob)
                probs[:] = jnp.where(mask, nword[:, None], probs[:])

                low_add_a = jnp.where(bt == 1, bound, jnp.uint32(0))
                rng_a = jnp.where(bt == 0, bound, rng - bound)
                rng_d = rng >> 1
                low_add_d = jnp.where(bt == 1, rng_d, jnp.uint32(0))
                rng1 = jnp.where(adaptive, rng_a, jnp.where(direct, rng_d, rng))
                low_add = jnp.where(
                    adaptive, low_add_a, jnp.where(direct, low_add_d, jnp.uint32(0)))
                new_low = low + low_add
                new_carry = carry_f | (new_low < low).astype(jnp.int32)

                need_shift = (coding & (rng1 < (1 << 24))) | flushing
                rng2 = jnp.where(coding & (rng1 < (1 << 24)), rng1 << 8, rng1)
                fire = need_shift & (
                    (new_carry == 1) | (new_low < jnp.uint32(0xFF000000)))
                stall = need_shift & ~fire
                emit_byte = (cache + new_carry) & 0xFF
                filler = (0xFF + new_carry) & 0xFF

                wflag = draining | fire
                wbyte = jnp.where(draining, drain_byte, emit_byte)
                # err is i32 0/1: Mosaic cannot legalize i1 loop carries.
                # After err latches, the lane keeps writing wrapped ring
                # slots and advancing out_pos — its flushed bytes are
                # garbage from that point.  Correctness depends on the
                # whole-batch fallback invariant: serialize_with_fallback
                # reroutes the ENTIRE batch to the XLA serializer when any
                # lane reports consumed != totals (err forces consumed=-1
                # via `complete` below), so a latched lane's output is
                # never consumed.
                err = err | (wflag & (out_pos - flush_base >= RING)).astype(jnp.int32)
                rslot = out_pos & (RING - 1)
                ring[:] = jnp.where(
                    (ring_cols == rslot[:, None]) & _mask2d(wflag),
                    wbyte[:, None], ring[:])

                out_pos = out_pos + jnp.where(wflag, 1, 0)
                drain = jnp.where(
                    draining, drain - 1, jnp.where(fire, pending, drain))
                drain_byte = jnp.where(fire, filler, drain_byte)
                pending = jnp.where(
                    fire, 0, jnp.where(stall, pending + 1, pending))
                cache = jnp.where(
                    fire, (new_low >> 24).astype(jnp.int32) & 0xFF, cache)
                low2 = jnp.where(need_shift, (new_low & 0xFFFFFF) << 8, new_low)
                carry2 = jnp.where(need_shift, 0, new_carry)
                bit_pos = bit_pos + jnp.where(coding, 1, 0)
                flush_i = flush_i + jnp.where(flushing, 1, 0)
                return (t + 1, low2, carry2, rng2, cache, pending, drain,
                        drain_byte, bit_pos, out_pos, flush_i, err)

            def bit_cond(inner):
                (t, low, carry_f, rng, cache, pending, drain, drain_byte,
                 bit_pos, out_pos, flush_i, err) = inner
                # a lane has work while it drains a carry run, has bits
                # left inside this chunk, or still owes final-flush bytes
                work = (drain > 0) | (
                    (bit_pos < tot)
                    & (bit_pos >= chunk_idx * CHUNK)
                    & (bit_pos < (chunk_idx + 1) * CHUNK))
                if isinstance(last_chunk, bool):
                    lc = jnp.bool_(last_chunk)
                else:
                    lc = last_chunk
                work = work | (lc & (bit_pos >= tot) & (flush_i < 5))
                return jnp.any(work) & (t < step_cap)

            # the work check (a cross-lane any() + scalar readback) runs
            # once per INNER_CHECK iterations, not per coded bit; the
            # inner loop keeps a scalar-only while condition
            # (MEASUREMENTS.md round-2 methodology entry).  Each while
            # iteration applies `unroll` full sub-steps — the exact
            # multi-entry unroll (bits are known in advance)
            INNER_CHECK = 64

            def multi_step(c):
                for _ in range(unroll):
                    c = bit_body(c)
                return c

            def burst(c):
                t, c = jax.lax.while_loop(
                    lambda tc: tc[0] < INNER_CHECK,
                    lambda tc: (tc[0] + 1, multi_step(tc[1])),
                    (jnp.int32(0), c))
                return c

            inner = (jnp.int32(0), low, carry_f, rng, cache, pending, drain,
                     drain_byte, bit_pos, out_pos, flush_i, err)
            inner = jax.lax.while_loop(bit_cond, burst, inner)
            (_, low, carry_f, rng, cache, pending, drain, drain_byte,
             bit_pos, out_pos, flush_i, err) = inner

            # flush staged ring into out
            out_ref[:] = flush(out_ref[:], ring[:], flush_base, out_pos)
            flush_base = out_pos
            return (low, carry_f, rng, cache, pending, drain, drain_byte,
                    bit_pos, out_pos, flush_i, flush_base, err)

        z = jnp.zeros((N,), dtype=jnp.int32)
        err0 = z
        init = (jnp.zeros((N,), jnp.uint32), z,
                jnp.full((N,), 0xFFFFFFFF, jnp.uint32), z, z, z, z, z, z, z, z,
                err0)
        final = jax.lax.fori_loop(0, num_chunks, chunk_body, init)
        lens_ref[0, :] = final[8]
        # a lane only counts as done when the 5-byte flush ran AND its
        # pending-0xFF drain emptied — bits alone can be consumed with the
        # tail un-emitted if the iteration budget ran out mid-drain
        complete = (final[9] == 5) & (final[5] == 0) & (final[11] == 0)
        lens_ref[1, :] = jnp.where(complete, final[7], -1)

    out, lens = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N, max_out_pad), jnp.int32),
            jax.ShapeDtypeStruct((2, N), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # totals
            pl.BlockSpec(memory_space=pl.ANY),          # packed ctx|bit (HBM)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, SP), jnp.int32),             # packed prob pairs
            pltpu.VMEM((N, RING), jnp.int32),           # ring
            pltpu.VMEM((2, N, CHUNK), jnp.int32),       # packed tiles
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(totals.reshape(1, -1), packed)
    return (out[:n_real, :max_out].astype(jnp.uint8),
            lens[0, :n_real], lens[1, :n_real])


def serialize_with_fallback(ctx, bits, totals, arena_size: int, max_out: int):
    """Pallas fast path with a guaranteed-correct XLA fallback.

    The kernel's staging envelope (per-chunk step cap, RING-byte flush
    windows) covers all realistic streams; `consumed` reports whether every
    lane finished inside it, and any shortfall reroutes the whole batch to
    the XLA serializer.
    """
    from .device_encoder import serialize

    import jax as _jax

    interpret = _jax.default_backend() != "tpu"
    try:
        out, lens, consumed = serialize_pallas(
            ctx, bits, totals, arena_size, max_out, interpret=interpret
        )
    except Exception:
        # Mosaic lowering / VMEM-exhaustion failures surface at compile
        # time; degrade to the XLA serializer rather than erroring
        return serialize(ctx, bits, totals, arena_size, max_out)
    if bool(jnp.all(consumed == totals)):
        return out, lens
    return serialize(ctx, bits, totals, arena_size, max_out)
