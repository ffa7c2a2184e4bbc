"""Real-TPU validation matrix for the Pallas/device kernels.

CPU tests run the Pallas kernels in interpret mode, which accepts
shapes Mosaic later rejects on hardware (a 12-lane batch exposed a
sublane-alignment lowering failure found only on chip).  This script
drives the device paths on the REAL backend across the shape/param
matrix that has bitten before, plus rate spot-checks.  Run under axon:

    python tools/chip_check.py

Exits nonzero on any failure.  Safe to re-run: compiles land in the
persistent cache (.jax_cache/).  NB: after kernel-code changes the
first run re-compiles every executable through this rig's
remote-compile relay (~20-30 min total); cached runs take ~2 min.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lzma_tpu.bench.datagen import generate_bench_data  # noqa: E402
from lzma_tpu.format.properties import LzmaParams  # noqa: E402
from lzma_tpu.runtime import native  # noqa: E402
from lzma_tpu.ops import api as dev  # noqa: E402


def corpus(n, seed=11):
    import random

    rng = random.Random(seed)
    words = [bytes(rng.randrange(256) for _ in range(rng.randrange(5, 25)))
             for _ in range(40)]
    b = bytearray()
    while len(b) < n:
        b += words[rng.randrange(40)]
    return bytes(b[:n])


def main():
    backend = jax.default_backend()
    print(f"backend: {backend} devices={jax.devices()}")
    if backend != "tpu":
        print("WARNING: not on TPU — Mosaic lowering is NOT exercised")

    # shape/param matrix: ragged tails, unaligned lane counts, lc/lp/pb
    # variants, v2 prefix presets, v3 stored dictionaries
    cases = [
        (3 * 4096 + 123, 4096, 3, 0, 2, 0, 0),
        (5 * 8192, 8192, 0, 2, 0, 2048, 0),
        (7 * 2048, 2048, 4, 1, 1, 0, 512),
        (1 * 1024 + 17, 1024, 3, 0, 2, 0, 0),
        (12 * 4096, 4096, 3, 0, 2, 0, 1024),  # the 12-lane regression
    ]
    for total, bs, lc, lp, pb, ps, dl in cases:
        data = corpus(total)
        p = LzmaParams(lc=lc, lp=lp, pb=pb, dict_size=1 << 14, fast_bytes=16)
        kw = {}
        if ps:
            kw["preset_len"] = ps
        if dl:
            kw["dictionary"] = corpus(dl, seed=dl)
        blob = dev.encode_blocks(data, p, block_size=bs, use_pallas=True, **kw)
        assert native.decode_blocks(blob) == data, (total, bs, lc, lp, pb)
        assert dev.decode_blocks(blob, use_pallas=True) == data, (total, bs)
        print(f"OK total={total} bs={bs} lc{lc}lp{lp}pb{pb} v2={ps} v3={dl}")

    # 64x16 KB: beyond the single-group VMEM envelope — must run via
    # lane groups, not fail at compile time
    from lzma_tpu.ops.pallas_decoder import decode_batch_pallas

    p = LzmaParams(dict_size=1 << 14, fast_bytes=16)
    payloads = [corpus(16000 + i, seed=i) for i in range(64)]
    streams = [native.encode_stream(x, p) for x in payloads]
    outs = decode_batch_pallas(streams, p, [len(x) for x in payloads],
                               fallback=False)
    assert outs == payloads
    print("OK 64x16KB via lane groups")

    # ring-window decoder: dict < block (the ring regime), both staging
    # modes, and the v2-preset priming path
    from lzma_tpu.ops.pallas_ring import decode_batch_ring

    pr = LzmaParams(dict_size=1 << 12, fast_bytes=16)
    payloads = [corpus(16000 + 13 * i, seed=50 + i) for i in range(16)]
    streams = [native.encode_stream(x, pr) for x in payloads]
    sizes = [len(x) for x in payloads]
    for stage in (False, True):
        outs = decode_batch_ring(streams, pr, sizes, fallback=False,
                                 stage_input=stage)
        assert outs == payloads, f"ring stage={stage}"
        print(f"OK ring decode 16x16KB dict=4KB stage={stage}")
    pre = corpus(2048, seed=99)
    streams = [native.encode_stream(x, pr, preset=pre) for x in payloads[:8]]
    outs = decode_batch_ring(streams, pr, sizes[:8], fallback=False,
                             preset=pre)
    assert outs == payloads[:8]
    print("OK ring decode primed window (v2 preset)")

    # per-shard Pallas mesh decode (single-device TPU mesh), fallback off
    from lzma_tpu.parallel import mesh as M

    msh = M.make_mesh(jax.devices()[:1])
    data = corpus(128 << 10, seed=7)
    blob = M.encode_blocks_mesh(data, pr, block_size=1 << 14, mesh=msh,
                                dictionary=data[:1024])
    step_xla = M._decode_step, M._decode_step_preset

    def _boom(*a, **k):
        raise AssertionError("XLA fallback used")

    M._decode_step = M._decode_step_preset = _boom
    try:
        assert M.decode_blocks_mesh(blob, mesh=msh, use_pallas=True) == data
    finally:
        M._decode_step, M._decode_step_preset = step_xla
    print("OK mesh pallas decode (v3 dictionary broadcast)")

    # rate spot-checks (recorded envelopes in MEASUREMENTS.md)
    from lzma_tpu.ops.hybrid import _tokenize_lanes

    bs, lanes = 1 << 16, 32
    data = generate_bench_data(bs * lanes)
    arr = np.frombuffer(data, np.uint8).reshape(lanes, bs)
    dj = jnp.asarray(arr)
    lens = jnp.full((lanes,), bs, jnp.int32)
    best = float("inf")
    for _ in range(4):  # first iteration may hit a (re)compile
        t0 = time.perf_counter()
        outs = _tokenize_lanes(dj, lens, jnp.int32(bs), 32, 4)
        jax.block_until_ready(outs)
        best = min(best, time.perf_counter() - t0)
    print(f"tokenize 32x64KB: {bs * lanes / best / 1e9:.2f} GB/s")

    payloads = [data[i * 16384 : (i + 1) * 16384] for i in range(32)]
    streams = [native.encode_stream(x, p) for x in payloads]
    sizes = [len(x) for x in payloads]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = decode_batch_pallas(streams, p, sizes, fallback=False)
        best = min(best, time.perf_counter() - t0)
    assert outs == payloads
    print(f"pallas decode 32x16KB: {sum(sizes) / best / 1e6:.2f} MB/s")

    # EOS grow-on-overflow (VERDICT r3 item 6): a high-expansion
    # unknown-size stream must decode through api.decode_alone's cap
    # doubling on the device FSM (no native fallback)
    import lzma as _lzma

    from lzma_tpu.ops import api as dev_api

    eos_data = b"grow" * 60000 + bytes(range(200))
    eos_blob = _lzma.compress(eos_data, format=_lzma.FORMAT_ALONE, preset=1)
    assert dev_api.decode_alone(eos_blob) == eos_data
    print("device EOS grow-on-overflow: OK")

    # optimal-parse DP tokens on-chip: Mosaic kernel vs host coder
    from lzma_tpu.ops.device_encoder import encode_batch as _enc_batch

    dp_payloads = [corpus(6000, seed=31 + i) for i in range(3)]
    p_dp = LzmaParams(dict_size=1 << 13, fast_bytes=32)
    dp_streams = _enc_batch(dp_payloads, p_dp, parse="optimal")
    for d, s in zip(dp_payloads, dp_streams):
        blob = p_dp.encode_props() + len(d).to_bytes(8, "little") + s
        assert _lzma.decompress(blob, format=_lzma.FORMAT_ALONE) == d
    print("device optimal-parse DP on-chip: OK")
    print("CHIP-CHECK-OK")


if __name__ == "__main__":
    main()
