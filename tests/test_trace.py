"""Tracing / progress / profiling observability hooks."""

import io
import logging

from lzma_tpu.codec.encoder import LzmaEncoder
from lzma_tpu.codec.decoder import decode_stream
from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.utils.trace import CodecTrace, RateLimitedProgress, trace_formatter
from lzma_tpu.utils.profiling import PhaseTimer


def test_encoder_symbol_trace():
    log = logging.getLogger("test.codec.trace")
    log.setLevel(logging.DEBUG)
    stream = io.StringIO()
    h = logging.StreamHandler(stream)
    h.setFormatter(trace_formatter())
    log.addHandler(h)
    try:
        p = LzmaParams(dict_size=1 << 12, fast_bytes=8)
        data = b"abcabcabcabc123123123"
        enc = LzmaEncoder(p, trace=CodecTrace(log))
        comp = enc.encode(data)
        assert decode_stream(comp, p, out_size=len(data)) == data
    finally:
        log.removeHandler(h)
    text = stream.getvalue()
    assert "literal" in text
    assert "match" in text or "rep" in text
    assert "matches=" in text


def test_trace_disabled_is_free():
    p = LzmaParams(dict_size=1 << 12, fast_bytes=8)
    data = b"no trace overhead " * 20
    quiet = logging.getLogger("test.codec.quiet")
    quiet.setLevel(logging.WARNING)
    a = LzmaEncoder(p).encode(data)
    b = LzmaEncoder(p, trace=CodecTrace(quiet)).encode(data)
    assert a == b


def test_progress_callback_cadence():
    calls = []
    p = LzmaParams(dict_size=1 << 14, fast_bytes=16)
    data = (b"progress reporting block " * 2000)[:40_000]
    LzmaEncoder(p).encode(data, progress=lambda i, o: calls.append((i, o)))
    assert calls, "progress should fire on >=4096-byte cadence"
    ins = [c[0] for c in calls]
    assert ins == sorted(ins)
    assert all(o > 0 for _, o in calls)


def test_rate_limited_progress():
    seen = []
    rp = RateLimitedProgress(lambda i, o: seen.append(i), interval=100)
    for i in range(0, 1000, 10):
        rp(i, i // 2)
    assert len(seen) <= 10


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert set(t.totals) == {"a", "b"}
    assert "a" in t.report()


def test_enable_trace_attaches_handler():
    import logging

    from lzma_tpu.utils.trace import enable_trace, logger

    h = enable_trace(io.StringIO())
    try:
        assert h in logger.handlers
        assert logger.isEnabledFor(logging.DEBUG)
    finally:
        logger.removeHandler(h)
