"""Pallas range-coder serializer: the adaptive bit-serial coder in VMEM.

The on-device counterpart of `ops/device_encoder.serialize`: consumes the
precomputed per-lane (ctx, bit) streams and produces LZMA bytes, with the
probability arena resident in VMEM for the kernel's whole lifetime — the
formulation XLA cannot express (its scatter into a loop carry copies the
arena every iteration; see DESIGN-NOTES.md).

Round-2 architecture (VERDICT r1 item 2) — LOCK-STEP and PACKED:

  lock-step — every lane consumes exactly ONE (ctx, bit) per iteration
      (bit_pos == the global step counter until the lane's total), so the
      token fetch is a dynamic ROW read of a transposed (CHUNK, N) tile —
      no per-lane gather at all.  Carry runs no longer stall consumption:
      a fired shiftLow emits its cache byte AND the whole pending-0xFF
      run in the same iteration via ONE range-masked ring write
      (reference semantics: RangeEncoder.java:73-87 — the run bytes are
      all (0xFF + carry) & 0xFF).
  probs (N, SP) int32 VMEM — TWO 11-bit probabilities per word
      (ops/pallas_ring.py's packing): gather + in-register half update +
      same-mask scatter over S/2 words.
  ring  (N, RING) int32 VMEM — staged bytes, absolute position mod RING;
      flushed into the PACKED output (N, MOP) as words once per chunk
      (the boundary word is rewritten whole — its earlier bytes are
      still live in the ring because per-chunk emissions are bounded by
      RING - 4, enforced by the `err` check whose overflow falls back to
      the XLA serializer).

Bit-exact with the XLA serializer and the scalar oracle
(tests/test_pallas_serializer.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RING = 512   # staged bytes between flushes (bounds per-chunk emissions)
CHUNK = 512  # (ctx,bit) entries DMA'd per tile


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _mask2d(m):
    """(N,) bool -> (N,1) bool; Mosaic only lowers minor-dim insertion for
    32-bit types, so the reshape routes through int32."""
    return m.astype(jnp.int32)[:, None] != 0


@partial(jax.jit, static_argnames=("arena_size", "max_out", "interpret"))
def serialize_pallas(ctx, bits, totals, arena_size: int, max_out: int,
                     interpret: bool = False):
    """Drop-in replacement for device_encoder.serialize (same contract)."""
    n_real, B = ctx.shape
    # Mosaic tiles the lane axis in sublanes of 8: unaligned lane counts
    # fail to lower on real hardware, so pad with idle lanes (totals=0)
    # and slice them back off below
    N = _round_up(n_real, 8)
    if N != n_real:
        rows = ((0, N - n_real), (0, 0))
        ctx = jnp.pad(ctx, rows, constant_values=-3)
        bits = jnp.pad(bits, rows)
        totals = jnp.pad(totals, (0, N - n_real))
    SP = _round_up((arena_size + 1) // 2, 128)
    B_pad = _round_up(B, CHUNK)
    if B_pad != B:
        pad = ((0, 0), (0, B_pad - B))
        ctx = jnp.pad(ctx, pad, constant_values=-3)
        bits = jnp.pad(bits, pad)
    # one packed word per (ctx, bit)
    packed = ((ctx + 4) << 1) | bits
    max_out_pad = _round_up(max_out, RING)
    num_chunks = B_pad // CHUNK
    # post-last-chunk tail: 5 final shiftLows (flush) + slack
    TAIL = 8

    def kernel(totals_ref, pk_hbm, out_ref, lens_ref,
               probs, ring, pk_tile, sems):
        # lens_ref row 0 = emitted bytes; row 1 = consumed bits or -1 on
        # staging-ring overflow — the wrapper falls back to the XLA
        # serializer unless row 1 == totals for every lane.  Aux values
        # travel as ROWS: column slices tax the loop-carry layout
        # (MEASUREMENTS.md).
        out_ref[:] = jnp.zeros_like(out_ref)
        probs[:] = jnp.full_like(probs, 1024 | (1024 << 16))
        ring[:] = jnp.zeros_like(ring)
        arena_cols = jax.lax.broadcasted_iota(jnp.int32, (N, SP), 1)
        ring_cols = jax.lax.broadcasted_iota(jnp.int32, (N, RING), 1)
        out_cols = jax.lax.broadcasted_iota(jnp.int32, (N, max_out_pad), 1)
        tot = totals_ref[0, :]

        tile_cols = jax.lax.broadcasted_iota(jnp.int32, (N, CHUNK), 1)

        def copy_chunk(slot, chunk_idx):
            return pltpu.make_async_copy(
                pk_hbm.at[:, pl.ds(chunk_idx * CHUNK, CHUNK)],
                pk_tile.at[slot], sems.at[slot])

        copy_chunk(0, 0).start()

        def flush(out_vals, ring_vals, flush_base, out_pos):
            # ring positions are absolute mod RING, so output byte j maps
            # to ring column j % RING and the select needs no gather.
            # (A packed-word flush would shrink this pass 4x, but Mosaic
            # rejects the stride-4 byte-combine slices it needs.)
            m = (out_cols >= flush_base[:, None]) & (out_cols < out_pos[:, None])
            vals = jnp.tile(ring_vals, (1, max_out_pad // RING))
            return jnp.where(m, vals, out_vals)

        def make_step(chunk_idx, slot, last):
            def step(carry):
                (t, low, carry_f, rng, cache, pending, out_pos, flush_i,
                 flush_base, err) = carry
                gpos = chunk_idx * CHUNK + t
                coding = gpos < tot
                flushing = (~coding) & (flush_i < 5) & last

                # lock-step token fetch: every coding lane reads COLUMN t
                # of the tile — a masked sum against a SCALAR index (the
                # old per-lane gather needed per-lane indices; lock-step
                # makes it uniform, and Mosaic rejects both value-level
                # dynamic_slice and unaligned pl.ds row reads)
                sel = tile_cols == t
                pk = jnp.sum(jnp.where(sel, pk_tile[slot], 0), axis=1)
                cx = (pk >> 1) - 4
                bt = pk & 1
                adaptive = coding & (cx >= 0)
                direct = coding & (cx == -1)

                # packed-pair arena RMW (see ops/pallas_ring.py)
                safe_cx = jnp.where(adaptive, cx, 0)
                wi = safe_cx >> 1
                hi = safe_cx & 1
                amask = (arena_cols == wi[:, None]) & _mask2d(adaptive)
                word = jnp.sum(jnp.where(amask, probs[:], 0), axis=1)
                prob = jnp.where(hi == 1, word >> 16, word) & 0xFFFF
                new_prob = jnp.where(
                    bt == 0, prob + ((2048 - prob) >> 5), prob - (prob >> 5))
                nword = jnp.where(hi == 1,
                                  (word & 0xFFFF) | (new_prob << 16),
                                  (word - (word & 0xFFFF)) | new_prob)
                probs[:] = jnp.where(amask, nword[:, None], probs[:])

                bound = (rng >> 11) * prob.astype(jnp.uint32)
                low_add_a = jnp.where(bt == 1, bound, jnp.uint32(0))
                rng_a = jnp.where(bt == 0, bound, rng - bound)
                rng_d = rng >> 1
                low_add_d = jnp.where(bt == 1, rng_d, jnp.uint32(0))
                rng1 = jnp.where(adaptive, rng_a,
                                 jnp.where(direct, rng_d, rng))
                low_add = jnp.where(
                    adaptive, low_add_a,
                    jnp.where(direct, low_add_d, jnp.uint32(0)))
                new_low = low + low_add
                new_carry = carry_f | (new_low < low).astype(jnp.int32)

                need_shift = (coding & (rng1 < (1 << 24))) | flushing
                rng2 = jnp.where(coding & (rng1 < (1 << 24)), rng1 << 8, rng1)
                fire = need_shift & (
                    (new_carry == 1) | (new_low < jnp.uint32(0xFF000000)))
                stall = need_shift & ~fire
                emit_byte = (cache + new_carry) & 0xFF
                filler = (0xFF + new_carry) & 0xFF

                # inline emission: the cache byte plus the WHOLE pending
                # run land this iteration.  err latches when an emission
                # would overrun the unflushed ring span; err lanes stop
                # writing (they re-encode on the XLA fallback).
                n_emit = jnp.where(fire, 1 + pending, 0)
                err = err | (fire & (
                    out_pos + n_emit - flush_base > RING - 4)).astype(
                        jnp.int32)
                ok_w = fire & (err == 0)
                # ring slot of the cache byte, then `pending` fillers
                rel = (ring_cols - (out_pos & (RING - 1))[:, None]) \
                    & (RING - 1)
                head_m = (rel == 0) & _mask2d(ok_w)
                run_m = (rel >= 1) & (rel <= pending[:, None]) & _mask2d(ok_w)
                ring[:] = jnp.where(
                    head_m, emit_byte[:, None],
                    jnp.where(run_m, filler[:, None], ring[:]))

                out_pos = out_pos + jnp.where(ok_w, n_emit, 0)
                pending = jnp.where(fire, 0,
                                    jnp.where(stall, pending + 1, pending))
                cache = jnp.where(
                    fire, (new_low >> 24).astype(jnp.int32) & 0xFF, cache)
                low2 = jnp.where(need_shift, (new_low & 0xFFFFFF) << 8,
                                 new_low)
                carry2 = jnp.where(need_shift, 0, new_carry)
                flush_i = flush_i + jnp.where(flushing, 1, 0)
                return (t + 1, low2, carry2, rng2, cache, pending,
                        out_pos, flush_i, flush_base, err)
            return step

        def run_chunk(chunk_idx, carry, last_static):
            (low, carry_f, rng, cache, pending, out_pos, flush_i,
             flush_base, err) = carry
            slot = chunk_idx % 2

            @pl.when(chunk_idx + 1 < num_chunks)
            def _():
                copy_chunk((chunk_idx + 1) % 2, chunk_idx + 1).start()

            copy_chunk(slot, chunk_idx).wait()
            last = jnp.bool_(True) if last_static else (
                chunk_idx == num_chunks - 1)
            step = make_step(chunk_idx, slot, last)
            trip = CHUNK + (TAIL if last_static else 0)
            inner = (jnp.int32(0), low, carry_f, rng, cache, pending,
                     out_pos, flush_i, flush_base, err)
            inner = jax.lax.while_loop(lambda c: c[0] < trip, step, inner)
            (_, low, carry_f, rng, cache, pending, out_pos, flush_i,
             flush_base, err) = inner

            out_ref[:] = flush(out_ref[:], ring[:], flush_base, out_pos)
            flush_base = out_pos
            return (low, carry_f, rng, cache, pending, out_pos, flush_i,
                    flush_base, err)

        z = jnp.zeros((N,), dtype=jnp.int32)
        init = (jnp.zeros((N,), jnp.uint32), z,
                jnp.full((N,), 0xFFFFFFFF, jnp.uint32), z, z, z, z, z, z)
        if num_chunks > 1:
            init = jax.lax.fori_loop(
                0, num_chunks - 1,
                lambda i, c: run_chunk(i, c, last_static=False), init)
        final = run_chunk(num_chunks - 1, init, last_static=True)
        (low, carry_f, rng, cache, pending, out_pos, flush_i, flush_base,
         err) = final
        lens_ref[0, :] = out_pos
        # a lane only counts as done when the 5-byte flush ran AND its
        # pending-0xFF run emptied AND no ring overflow was latched
        complete = (flush_i == 5) & (pending == 0) & (err == 0)
        lens_ref[1, :] = jnp.where(complete, tot, -1)

    out, lens = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N, max_out_pad), jnp.int32),
            jax.ShapeDtypeStruct((2, N), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # totals (1, N)
            pl.BlockSpec(memory_space=pl.ANY),          # packed tokens (HBM)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, SP), jnp.int32),             # packed prob pairs
            pltpu.VMEM((N, RING), jnp.int32),           # byte ring
            pltpu.VMEM((2, N, CHUNK), jnp.int32),       # token tiles
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(totals.reshape(1, -1), packed)
    return (out[:n_real, :max_out].astype(jnp.uint8),
            lens[0, :n_real], lens[1, :n_real])


def serialize_with_fallback(ctx, bits, totals, arena_size: int, max_out: int):
    """Pallas fast path with a guaranteed-correct XLA fallback.

    The kernel's staging envelope (RING-byte flush windows) covers all
    realistic streams; `consumed` reports whether every lane finished
    inside it, and any shortfall reroutes the whole batch to the XLA
    serializer.
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
