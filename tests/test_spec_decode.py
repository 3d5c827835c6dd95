"""N-gram speculative decoding (infer.spec_decode=ngram).

ADDITIVE over the reference (no speculative decoding there). The
invariant that matters: speculative greedy output is IDENTICAL to plain
greedy output — drafts only change how many tokens one fused forward
yields, never which tokens. Tests pin that equality on repetitive
(high-acceptance) and random (low-acceptance) prompts, EOS/budget
truncation mid-burst, and the proposer itself.
"""

import numpy as np
import pytest

from chitu_tpu.engine import Engine
from chitu_tpu.executor import _ngram_propose
from chitu_tpu.task import SampleParams

from helpers import tiny_cfg


def test_ngram_proposer():
    # trailing bigram (7, 8) occurred earlier; continuation is proposed
    ctx = [1, 7, 8, 9, 10, 11, 2, 3, 7, 8]
    assert _ngram_propose(ctx, 3) == [9, 10, 11]
    # no earlier occurrence: repeat-last fallback
    assert _ngram_propose([1, 2, 3, 4], 2) == [4, 4]
    # short context
    assert _ngram_propose([5], 3) == [5, 5, 5]
    # continuation shorter than k pads with its last token
    ctx2 = [7, 8, 9, 1, 7, 8]
    assert _ngram_propose(ctx2, 4) == [9, 1, 7, 8]


@pytest.fixture(scope="module")
def engines():
    base = tiny_cfg(**{"infer.stop_with_eos": False})
    spec = tiny_cfg(
        **{
            "infer.stop_with_eos": False,
            "infer.spec_decode": "ngram",
            "infer.spec_k": 3,
        }
    )
    return Engine(base), Engine(spec)


def _gen(e, prompt_tokens, n_new, temp=0.0):
    req = e.submit(
        "",
        SampleParams(temperature=temp, max_new_tokens=n_new),
        prompt_tokens=prompt_tokens,
    )
    e.run_until_complete()
    return list(req.async_stream.tokens)


def test_spec_matches_plain_greedy_repetitive(engines):
    base, spec = engines
    # a repeating pattern: greedy decode of a random-weight model loops,
    # so n-gram drafts hit often — the high-acceptance regime
    prompt = ([311, 412, 313, 414] * 6)[:24]
    want = _gen(base, prompt, 16)
    got = _gen(spec, prompt, 16)
    assert got == want
    tok, rounds = spec.executor._spec_stats
    assert rounds > 0
    # acceptance must beat 1 token/round on a looping sequence
    assert tok / rounds > 1.5


def test_spec_matches_plain_greedy_random(engines):
    base, spec = engines
    rng = np.random.default_rng(7)
    prompt = rng.integers(300, 500, 30).tolist()
    assert _gen(spec, prompt, 12) == _gen(base, prompt, 12)


def test_spec_budget_exact(engines):
    _, spec = engines
    prompt = ([321, 422] * 8)[:16]
    out = _gen(spec, prompt, 7)
    assert len(out) == 7  # burst acceptance must not overshoot the budget


def test_spec_eos_truncation():
    base = tiny_cfg(**{"infer.stop_with_eos": True})
    spec = tiny_cfg(
        **{
            "infer.stop_with_eos": True,
            "infer.spec_decode": "ngram",
            "infer.spec_k": 3,
        }
    )
    eb, es = Engine(base), Engine(spec)
    for seed in range(3):
        rng = np.random.default_rng(seed)
        prompt = rng.integers(250, 260, 20).tolist()
        assert _gen(es, prompt, 12) == _gen(eb, prompt, 12)


def test_spec_falls_back_for_sampled(engines):
    _, spec = engines
    # sampled request routes through the windowed path (stats unchanged)
    before = list(spec.executor._spec_stats)
    prompt = [301, 302, 303] * 4
    out = _gen(spec, prompt, 6, temp=0.9)
    assert len(out) == 6
    assert spec.executor._spec_stats == before


def test_spec_concurrent_batch(engines):
    base, spec = engines
    p = SampleParams(temperature=0.0, max_new_tokens=8)
    prompts = [([330 + i, 440 + i] * 10)[:20] for i in range(4)]
    want = [_gen(base, pr, 8) for pr in prompts]
    reqs = [spec.submit("", p, prompt_tokens=pr) for pr in prompts]
    spec.run_until_complete()
    got = [list(r.async_stream.tokens) for r in reqs]
    assert got == want
