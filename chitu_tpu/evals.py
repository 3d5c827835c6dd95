"""Perplexity evaluation via teacher-forced prefill logits.

Capability parity with the reference's accuracy harness
(reference: test/test_eval.py:105-194 — wikitext-2 perplexity by
monkey-patching prefill to keep all logits; here `return_all_logits` is a
first-class prefill mode so no patching is needed). Used as the accuracy
gate for the quantization ladder (BASELINE.md: per-bit-width accuracy).
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _bucket_pow2(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def perplexity_from_tokens(
    engine,
    tokens: List[int],
    window: int = 512,
    stride: Optional[int] = None,
) -> float:
    """Sliding-window perplexity of `tokens` under the engine's model.

    Each window is prefilled teacher-forced; the loss counts predictions
    over the non-overlapping tail of each window (standard strided eval).
    """
    model = engine.model
    params = engine.params
    cfg = engine.cfg
    page = cfg.infer.page_size
    stride = stride or window

    from chitu_tpu.kvcache import PagedKVCache

    spec = model.kv_cache_spec()

    total_nll = 0.0
    total_count = 0
    # reuse the executor's jit cache (keyed per bucket) instead of
    # re-jitting per perplexity call
    def jit_prefill(p, c, t, bt, sp, vl):
        T = t.shape[0]
        mp = bt.shape[0]
        fn = engine.executor._prefill_fn(T, mp, all_logits=True)
        return fn(p, c, t, bt, sp, vl)

    start = 0
    prev_end = 0
    while start < len(tokens) - 1:
        end = min(start + window, len(tokens))
        chunk = tokens[start:end]
        n = len(chunk)
        if n < 2:
            break
        T = _bucket_pow2(n)
        cache = PagedKVCache(
            spec["n_layers"],
            T // page + 1,
            page,
            spec["kv_heads"],
            spec["head_dim"],
            kv_dim=spec.get("kv_dim", 0),
            layer_groups=spec.get("layer_groups"),
        )
        bt = jnp.arange(T // page + 1, dtype=jnp.int32)
        tok = jnp.zeros((T,), jnp.int32).at[:n].set(jnp.asarray(chunk))
        logits, _ = jit_prefill(
            params, cache.arrays, tok, bt, jnp.int32(0), jnp.int32(n)
        )
        logp = jax.nn.log_softmax(logits[: n - 1].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(
            logp, jnp.asarray(chunk[1:])[:, None], axis=-1
        )[:, 0]
        # only count fresh positions (beyond the previous window's coverage)
        fresh_from = max(prev_end - start - 1, 0)
        piece = np.asarray(nll)[fresh_from:]
        total_nll += float(piece.sum())
        total_count += len(piece)
        prev_end = end
        start += stride

    return math.exp(total_nll / max(total_count, 1))


def perplexity_from_text(engine, text: str, window: int = 512) -> float:
    tokens = engine.tokenizer.encode(text, bos=True)
    return perplexity_from_tokens(engine, tokens, window=window)
