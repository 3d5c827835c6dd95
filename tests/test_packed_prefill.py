"""Packed varlen prefill: R ragged prompts in one jitted call must match
per-request prefill exactly (reference: chitu/utils.py:84-100 VarLens,
executor.py:118-131 flash_attn_varlen path)."""

import dataclasses as dc

import jax
import pytest

from chitu_tpu.engine import Engine
from chitu_tpu.task import SampleParams

from helpers import tiny_cfg


def _cfg(**kw):
    cfg = tiny_cfg(**kw)
    m = dc.replace(
        cfg.models, n_layers=2, dim=256, n_heads=8, n_kv_heads=4,
        inter_dim=512, vocab_size=512,
    )
    return dc.replace(cfg, models=m)


def _ragged_batch(eng, p):
    prompts = [
        "short",
        "a somewhat longer prompt with more words in it",
        "mid size prompt here",
        "x",
        "another mid one",
    ]
    reqs = [eng.submit(s, p) for s in prompts]
    eng.run_until_complete()
    return [list(r.async_stream.tokens) for r in reqs]


def test_packed_prefill_matches_sequential():
    p = SampleParams(temperature=0.0, max_new_tokens=5)
    packed = Engine(_cfg())
    got = _ragged_batch(packed, p)

    # oracle: one request at a time goes through the single-request
    # prefill path (no packing possible)
    seq = Engine(_cfg())
    want = [
        seq.generate(s, p)
        for s in [
            "short",
            "a somewhat longer prompt with more words in it",
            "mid size prompt here",
            "x",
            "another mid one",
        ]
    ]
    assert got == want


def test_packed_prefill_single_and_burst_mix():
    """Mixed burst: some long (chunked path) + many short (packed)."""
    cfg = _cfg(**{"infer.prefill_chunk": 32})
    eng = Engine(cfg)
    p = SampleParams(temperature=0.0, max_new_tokens=4)
    long_prompt = "w " * 40  # > chunk cap -> chunked per-request path
    reqs = [eng.submit(long_prompt, p)] + [
        eng.submit(f"prompt {i}", p) for i in range(4)
    ]
    eng.run_until_complete()
    assert all(len(r.async_stream.tokens) == 4 for r in reqs)
