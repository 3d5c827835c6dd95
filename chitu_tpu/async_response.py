"""Streaming response plumbing.

Capability parity with the reference's async_response module
(reference: chitu/async_response.py:1-167):

- `AsyncDataStream`: thread-safe incremental token->text decoding with
  U+FFFD (incomplete UTF-8 sequence) buffering, optional full-sequence
  re-decode mode, and `<think>`-style reasoning-token splitting.
- `AsyncResponse`: OpenAI-style chat completion responses — SSE stream
  chunks carrying `content` / `reasoning_content` deltas plus a final
  usage block, or a single full JSON body.
"""

from __future__ import annotations

import asyncio
import json
import threading
import time
import uuid
from typing import AsyncIterator, List, Optional, Tuple


class AsyncDataStream:
    """Incremental detokenizer + async iterator over produced text pieces.

    Tokens are appended from the engine worker thread; text is consumed from
    the asyncio event loop thread (reference: async_response.py:14-87).
    """

    def __init__(
        self,
        tokenizer,
        rs_token_id: Optional[int] = None,
        re_token_id: Optional[int] = None,
        force_full_seq_decode: bool = False,
    ):
        self.tokenizer = tokenizer
        self.rs_token_id = rs_token_id
        self.re_token_id = re_token_id
        self.force_full_seq_decode = force_full_seq_decode

        self.tokens: List[int] = []
        # (text, is_reasoning) pieces ready for the consumer
        self.strs: List[Tuple[str, bool]] = []
        self.lock = threading.Lock()
        self.loop: Optional[asyncio.AbstractEventLoop] = None
        self.event: Optional[asyncio.Event] = None
        self.finished = False
        self.in_reasoning = False

        # decode state: tokens[decoded_upto:] have not yet produced stable text
        self._decoded_upto = 0
        self._emitted_chars = 0  # only for full-seq mode

    def _bind_loop(self):
        if self.event is None:
            self.loop = asyncio.get_running_loop()
            self.event = asyncio.Event()

    def _notify(self):
        if self.event is not None and self.loop is not None:
            self.loop.call_soon_threadsafe(self.event.set)

    def add_data(self, token_id: int):
        """Append one generated token (engine thread)."""
        with self.lock:
            if self.rs_token_id is not None and token_id == self.rs_token_id:
                self.in_reasoning = True
                self._decoded_upto = len(self.tokens) + 1
                self.tokens.append(token_id)
                self._notify()
                return
            if self.re_token_id is not None and token_id == self.re_token_id:
                self.in_reasoning = False
                self._decoded_upto = len(self.tokens) + 1
                self.tokens.append(token_id)
                self._notify()
                return
            self.tokens.append(token_id)
            if self.force_full_seq_decode:
                # sentencepiece-style: re-decode whole sequence, emit the diff
                # (reference: async_response.py force_full_seq_decode)
                text = self.tokenizer.decode(self.tokens)
                if not text.endswith("�") and len(text) > self._emitted_chars:
                    piece = text[self._emitted_chars :]
                    self._emitted_chars = len(text)
                    self.strs.append((piece, self.in_reasoning))
            else:
                pending = self.tokens[self._decoded_upto :]
                text = self.tokenizer.decode(pending)
                # U+FFFD means the byte sequence is incomplete: hold tokens
                # back until the next token completes the codepoint
                # (reference: async_response.py:34-50). An incomplete UTF-8
                # tail is at most a few tokens, so a long-pending U+FFFD
                # means genuinely invalid bytes (e.g. random weights under a
                # byte tokenizer) — emit rather than stalling the stream
                # until finish().
                if text and (not text.endswith("�") or len(pending) >= 4):
                    self.strs.append((text, self.in_reasoning))
                    self._decoded_upto = len(self.tokens)
        self._notify()

    def finish(self):
        with self.lock:
            if not self.force_full_seq_decode:
                pending = self.tokens[self._decoded_upto :]
                if pending:
                    text = self.tokenizer.decode(pending)
                    if text:
                        self.strs.append((text, self.in_reasoning))
                    self._decoded_upto = len(self.tokens)
            self.finished = True
        self._notify()

    async def __aiter__(self) -> AsyncIterator[Tuple[str, bool]]:
        self._bind_loop()
        emitted = 0
        while True:
            with self.lock:
                chunk = self.strs[emitted:]
                done = self.finished
            for piece in chunk:
                yield piece
            emitted += len(chunk)
            if done and emitted >= len(self.strs):
                return
            self.event.clear()
            with self.lock:
                if self.finished or len(self.strs) > emitted:
                    continue
            await self.event.wait()

    @property
    def num_tokens(self) -> int:
        with self.lock:
            return len(self.tokens)

    def full_text(self) -> Tuple[str, str]:
        """(content, reasoning_content) over the whole stream."""
        with self.lock:
            content = "".join(s for s, r in self.strs if not r)
            reasoning = "".join(s for s, r in self.strs if r)
        return content, reasoning


class AsyncResponse:
    """OpenAI-style response formatter (reference: async_response.py:90-167)."""

    def __init__(self, req):
        self.req = req
        self.id = f"chatcmpl-{uuid.uuid4().hex[:24]}"
        self.created = int(time.time())
        self.model = req.model

    async def stream_generator(self) -> AsyncIterator[str]:
        """SSE chunks for `stream=true`."""
        first = True
        async for piece, is_reasoning in self.req.async_stream:
            delta = {"role": "assistant"} if first else {}
            first = False
            if is_reasoning:
                delta["reasoning_content"] = piece
            else:
                delta["content"] = piece
            chunk = {
                "id": self.id,
                "object": "chat.completion.chunk",
                "created": self.created,
                "model": self.model,
                "choices": [
                    {"index": 0, "delta": delta, "finish_reason": None}
                ],
            }
            yield f"data: {json.dumps(chunk)}\n\n"
        usage = self._usage()
        final = {
            "id": self.id,
            "object": "chat.completion.chunk",
            "created": self.created,
            "model": self.model,
            "choices": [
                {"index": 0, "delta": {}, "finish_reason": self.req.finish_reason}
            ],
            "usage": usage,
        }
        yield f"data: {json.dumps(final)}\n\n"
        yield "data: [DONE]\n\n"

    async def full_response(self) -> dict:
        """Complete JSON body for `stream=false`."""
        await self.req.completed.wait()
        content, reasoning = self.req.async_stream.full_text()
        message = {"role": "assistant", "content": content}
        if reasoning:
            message["reasoning_content"] = reasoning
        return {
            "id": self.id,
            "object": "chat.completion",
            "created": self.created,
            "model": self.model,
            "choices": [
                {
                    "index": 0,
                    "message": message,
                    "finish_reason": self.req.finish_reason,
                }
            ],
            "usage": self._usage(),
        }

    def _usage(self) -> dict:
        prompt = self.req.prompt_len
        completion = self.req.async_stream.num_tokens
        return {
            "prompt_tokens": prompt,
            "completion_tokens": completion,
            "total_tokens": prompt + completion,
        }
