"""Perplexity harness tests (reference intent: test/test_eval.py)."""

import dataclasses

import pytest

from chitu_tpu.engine import Engine
from chitu_tpu.evals import perplexity_from_text, perplexity_from_tokens

from helpers import tiny_cfg


@pytest.fixture(scope="module")
def engine():
    return Engine(tiny_cfg())


def test_perplexity_finite(engine):
    text = "the quick brown fox jumps over the lazy dog. " * 8
    ppl = perplexity_from_text(engine, text, window=64)
    assert 1.0 < ppl < engine.cfg.models.vocab_size * 2


def test_perplexity_deterministic(engine):
    toks = list(range(40, 140))
    p1 = perplexity_from_tokens(engine, toks, window=64)
    p2 = perplexity_from_tokens(engine, toks, window=64)
    assert p1 == p2


def test_quantized_ppl_close_to_bf16(engine):
    """Accuracy gate: soft-fp8 perplexity within a few percent of bf16
    (BASELINE.md per-bit-width accuracy)."""
    cfg = tiny_cfg()
    qcfg = dataclasses.replace(
        cfg,
        quant=dataclasses.replace(
            cfg.quant, method="soft_fp8", quant_on_load=True
        ),
    )
    qeng = Engine(qcfg)
    toks = list(range(40, 168))
    base = perplexity_from_tokens(engine, toks, window=64)
    quant = perplexity_from_tokens(qeng, toks, window=64)
    assert abs(quant - base) / base < 0.05


def test_requantized_fp8_ppl_close(engine):
    """The v5e int8-storage fast path stays within the accuracy gate too."""
    import dataclasses
    from chitu_tpu.quantize import requantize_fp8_storage
    from chitu_tpu.engine import Engine

    cfg = tiny_cfg()
    qcfg = dataclasses.replace(
        cfg,
        quant=dataclasses.replace(
            cfg.quant, method="soft_fp8", quant_on_load=True
        ),
    )
    qeng = Engine(qcfg)
    qeng.params = requantize_fp8_storage(qeng.params)
    qeng.executor.params = qeng.params
    toks = list(range(40, 168))
    base = perplexity_from_tokens(engine, toks, window=64)
    quant = perplexity_from_tokens(qeng, toks, window=64)
    assert abs(quant - base) / base < 0.05
