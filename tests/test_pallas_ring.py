"""Ring-window Pallas decoder: bit-exact vs the scalar oracle.

CPU runs exercise the kernel in interpret mode (Mosaic lowering is
validated on hardware by tools/ring_chip.py / tools/chip_check.py).
"""

import numpy as np
import pytest

from lzma_tpu.codec.encoder import encode_stream
from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.ops.pallas_ring import decode_batch_ring


def _corpus(rng, n):
    words = [rng.integers(0, 256, int(k), dtype=np.uint8).tobytes()
             for k in rng.integers(4, 24, 24)]
    b = bytearray()
    while len(b) < n:
        b += words[int(rng.integers(0, len(words)))]
    return bytes(b[:n])


@pytest.mark.parametrize("stage_input", [True, False])
def test_ring_decode_small_dict(stage_input):
    # dict << block: the configuration the ring window exists for
    rng = np.random.default_rng(5)
    params = LzmaParams(dict_size=1 << 11, fast_bytes=16)
    payloads = [_corpus(rng, 5000 - 321 * i) for i in range(3)]
    # an incompressible lane exercises the input-window stall path
    payloads.append(rng.integers(0, 256, 2500, dtype=np.uint8).tobytes())
    streams = [encode_stream(p, params, mode="greedy") for p in payloads]
    outs = decode_batch_ring(streams, params, [len(p) for p in payloads],
                             fallback=False, stage_input=stage_input)
    assert outs == payloads


def test_ring_decode_dict_covers_block():
    # dict >= block: ring degenerates to the whole-block window
    rng = np.random.default_rng(6)
    params = LzmaParams(dict_size=1 << 16, fast_bytes=16)
    payloads = [_corpus(rng, 1800), b"a" * 700]
    streams = [encode_stream(p, params, mode="greedy") for p in payloads]
    outs = decode_batch_ring(streams, params, [len(p) for p in payloads],
                             fallback=False)
    assert outs == payloads


@pytest.mark.parametrize("lc,lp,pb", [(0, 0, 2), (1, 2, 1)])
def test_ring_decode_param_combos(lc, lp, pb):
    rng = np.random.default_rng(7 + lc * 9 + lp * 3 + pb)
    params = LzmaParams(lc=lc, lp=lp, pb=pb, dict_size=1 << 10, fast_bytes=16)
    payload = _corpus(rng, 2600)
    stream = encode_stream(payload, params, mode="greedy")
    (out,) = decode_batch_ring([stream], params, [len(payload)],
                               fallback=False)
    assert out == payload


def test_ring_decode_preset():
    # LZTB v2/v3 priming: window pre-filled, contexts shifted
    rng = np.random.default_rng(8)
    params = LzmaParams(dict_size=1 << 12, fast_bytes=16)
    preset = _corpus(rng, 3000)
    payloads = [_corpus(rng, 2000), _corpus(rng, 1500)]
    streams = [encode_stream(p, params, preset=preset, mode="greedy")
               for p in payloads]
    outs = decode_batch_ring(streams, params, [len(p) for p in payloads],
                             fallback=False, preset=preset)
    assert outs == payloads


def test_ring_unstaged_failure_retries_staged(monkeypatch):
    """A group whose unstaged shape fails to compile (VMEM exhaustion on
    hardware) must retry with the input staged from HBM — NOT degrade
    straight to the XLA FSM."""
    import lzma_tpu.ops.pallas_ring as ring

    rng = np.random.default_rng(11)
    params = LzmaParams(dict_size=1 << 11, fast_bytes=16)
    payloads = [_corpus(rng, 4000), _corpus(rng, 2100)]
    streams = [encode_stream(p, params, mode="greedy") for p in payloads]

    real = ring.decode_pallas_ring
    calls = []

    def fake(*args, **kw):
        calls.append(kw.get("stage_input"))
        if not kw.get("stage_input"):
            raise RuntimeError("simulated Mosaic VMEM exhaustion")
        return real(*args, **kw)

    monkeypatch.setattr(ring, "decode_pallas_ring", fake)
    # fallback=False: if the retry did NOT happen, the raise would escape
    outs = ring.decode_batch_ring(streams, params,
                                  [len(p) for p in payloads],
                                  fallback=False, stage_input=False)
    assert outs == payloads
    assert calls == [False, True]


def test_ring_decode_corrupt_falls_back():
    rng = np.random.default_rng(9)
    params = LzmaParams(dict_size=1 << 11, fast_bytes=16)
    payload = _corpus(rng, 1200)
    stream = bytearray(encode_stream(payload, params, mode="greedy"))
    stream[8] ^= 0xFF  # corrupt mid-stream
    with pytest.raises(ValueError):
        decode_batch_ring([bytes(stream)], params, [len(payload)],
                          fallback=False)


@pytest.mark.parametrize("copy4", [True, False])
@pytest.mark.parametrize("stage_input", [False, True])
def test_ring_decode_copy4_modes(copy4, stage_input):
    """Multi-byte match copy (copy4) is byte-exact vs the 1-byte path,
    including dist==1 RLE runs, dist 2/3 overlapped copies and ragged
    tails (Decoder.java:288-294 semantics).  Parametrized over staged
    input too: copy4+staged is the production/bench champion config and
    its stall-revert interaction (st2 reverted for stalled lanes while
    extension state advances) is the trickiest path in the kernel."""
    import jax.numpy as jnp
    from lzma_tpu.ops.pallas_ring import C_IN, decode_pallas_ring

    rng = np.random.default_rng(9)
    params = LzmaParams(dict_size=1 << 11, fast_bytes=64)
    payloads = [_corpus(rng, 4000)]
    payloads.append(bytes([5]) * 3000)                     # dist==1 RLE
    payloads.append(bytes([1, 2]) * 1500)                  # dist==2
    payloads.append(bytes([1, 2, 3]) * 1000 + b"xy")       # dist==3
    streams = [encode_stream(p, params, mode="optimal") for p in payloads]
    align = C_IN if stage_input else 4
    mi = -(-max(len(s) for s in streams) // align) * align
    comp = np.zeros((len(payloads), mi), np.int32)
    lens = np.zeros(len(payloads), np.int32)
    for i, s in enumerate(streams):
        comp[i, :len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    mo = max(len(p) for p in payloads)
    out, ok, _ = decode_pallas_ring(
        jnp.asarray(comp), jnp.asarray(lens),
        jnp.asarray(np.array([len(p) for p in payloads], np.int32)),
        1 << 11, params.lc, params.lp, params.pb, mo,
        interpret=True, stage_input=stage_input, copy4=copy4)
    assert bool(jnp.all(ok))
    for i, p in enumerate(payloads):
        assert np.asarray(out[i, :len(p)]).tobytes() == p
