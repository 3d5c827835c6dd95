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


def _cli(argv: List[str]) -> int:
    """One-command PPL gate (docs/Development.md "Real-checkpoint
    gates"): `python -m chitu_tpu.evals models=<card>
    models.ckpt_dir=... infer.do_load=true eval.text=<file>` — or
    `--hf <ckpt_dir> eval.text=<file>` for the transformers ground
    truth of the same file (CPU)."""
    import json

    text_path = None
    overrides = []
    hf_dir = None
    window = 512
    it = iter(argv)
    for a in it:
        if a == "--hf":
            hf_dir = next(it)
        elif a.startswith("eval.text="):
            text_path = a.split("=", 1)[1]
        elif a.startswith("eval.window="):
            window = int(a.split("=", 1)[1])
        elif "=" in a:
            overrides.append(a)
        else:
            raise SystemExit(f"unknown arg {a!r}")
    if text_path is None:
        raise SystemExit("eval.text=<file> is required")
    with open(text_path) as f:
        text = f.read()

    if hf_dir is not None:
        # ground truth: teacher-forced PPL through transformers on CPU
        import torch
        from transformers import AutoModelForCausalLM, AutoTokenizer

        tok = AutoTokenizer.from_pretrained(hf_dir)
        model = AutoModelForCausalLM.from_pretrained(hf_dir).eval()
        ids = tok(text, return_tensors="pt").input_ids[0]
        nll, count = 0.0, 0
        with torch.no_grad():
            for s in range(0, max(len(ids) - 1, 1), window):
                chunk = ids[s : s + window + 1]
                if len(chunk) < 2:
                    break
                out = model(chunk[None, :-1]).logits[0].float()
                lp = torch.log_softmax(out, -1)
                nll -= lp[range(len(chunk) - 1), chunk[1:]].sum().item()
                count += len(chunk) - 1
        ppl = math.exp(nll / max(count, 1))
        print(json.dumps({"hf_ppl": round(ppl, 4), "tokens": count}))
        return 0

    from chitu_tpu.config import load_config
    from chitu_tpu.engine import Engine

    eng = Engine(load_config(overrides=overrides))
    ppl = perplexity_from_text(eng, text, window=window)
    print(json.dumps({
        "engine_ppl": round(ppl, 4),
        "model": eng.cfg.models.name,
        "quant": eng.cfg.quant.method,
    }))
    return 0


if __name__ == "__main__":
    import sys

    raise SystemExit(_cli(sys.argv[1:]))
