"""AsyncDataStream / tokenizer tests (reference behavior:
chitu/async_response.py:34-87 — U+FFFD buffering, reasoning split)."""

import asyncio

from chitu_tpu.async_response import AsyncDataStream
from chitu_tpu.tokenizer import ByteTokenizer


def collect(stream):
    async def run():
        out = []
        async for piece, is_reasoning in stream:
            out.append((piece, is_reasoning))
        return out

    return asyncio.run(run())


def test_byte_tokenizer_roundtrip():
    tk = ByteTokenizer()
    s = "héllo wörld — ✓"
    assert tk.decode(tk.encode(s)) == s
    ids = tk.encode(s, bos=True, eos=True)
    assert ids[0] == tk.bos_id and ids[-1] == tk.eos_id


def test_incremental_utf8_buffering():
    """A multi-byte codepoint split across tokens must not emit U+FFFD."""
    tk = ByteTokenizer()
    stream = AsyncDataStream(tk)
    text = "héllo ✓"
    for b in text.encode("utf-8"):
        stream.add_data(b)
    stream.finish()
    pieces = collect(stream)
    joined = "".join(p for p, _ in pieces)
    assert joined == text
    assert "�" not in joined


def test_reasoning_split():
    tk = ByteTokenizer()
    RS, RE = 300, 301
    stream = AsyncDataStream(tk, rs_token_id=RS, re_token_id=RE)
    for t in [ord("a"), RS, ord("b"), ord("c"), RE, ord("d")]:
        stream.add_data(t)
    stream.finish()
    pieces = collect(stream)
    content = "".join(p for p, r in pieces if not r)
    reasoning = "".join(p for p, r in pieces if r)
    assert content == "ad"
    assert reasoning == "bc"


def test_full_seq_decode_mode():
    tk = ByteTokenizer()
    stream = AsyncDataStream(tk, force_full_seq_decode=True)
    text = "hello"
    for b in text.encode("utf-8"):
        stream.add_data(b)
    stream.finish()
    assert "".join(p for p, _ in collect(stream)) == text


def test_invalid_bytes_stream_incrementally():
    """Genuinely invalid bytes (e.g. random weights under the byte
    tokenizer) must not stall the stream until finish(): the U+FFFD
    holdback is bounded, so pieces flow while the request is live."""
    tk = ByteTokenizer()
    stream = AsyncDataStream(tk)
    for _ in range(16):
        stream.add_data(0xFF)  # never a valid UTF-8 sequence
    # a consumer draining mid-stream (what the SSE iterator does) gets
    # text BEFORE finish(): the U+FFFD holdback must not stall it
    content, _ = stream.full_text()
    assert len(content) >= 13  # at most 3 tail tokens held back
    stream.finish()
    pieces = collect(stream)
    joined = "".join(p for p, _ in pieces)
    assert len(joined) == 16  # every byte surfaced (as replacement chars)
