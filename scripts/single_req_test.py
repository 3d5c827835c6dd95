"""Integration driver: run the engine end-to-end from the CLI.

Capability parity with the reference's torchrun-launched driver
(reference: test/single_req_test.py:66-159): real chat prompts or
synthetic fixed-length prompts (`request.prompt_tokens_len > 0` with
`infer.stop_with_eos=false` for fixed-shape perf runs,
reference: docs/Development.md:124-137), multiple rounds, timer dump.
The same script scales 1-chip -> TP -> DP purely via config overrides
(no launcher needed: JAX is single-controller).

Usage:
    python scripts/single_req_test.py [key=value ...]
    python scripts/single_req_test.py models=tiny-llama-debug \
        request.prompt_tokens_len=128 request.max_new_tokens=64 \
        infer.stop_with_eos=false rounds=3 reqs=8
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from chitu_tpu.config import load_config
from chitu_tpu.engine import Engine
from chitu_tpu.task import SampleParams
from chitu_tpu.utils import get_logger, get_timers

logger = get_logger()

PROMPTS = [
    "What is the capital of France?",
    "Explain how a jet engine works in two sentences.",
    "Write a haiku about tensor processing units.",
    "List three uses of a paged KV cache.",
]


def gen_reqs_fake(engine, n, prompt_len, max_new):
    """Synthetic fixed-length prompts (reference: single_req_test.py:66-83)."""
    rng = np.random.default_rng(0)
    vocab = engine.cfg.models.vocab_size
    return [
        engine.submit(
            "",
            SampleParams(temperature=0.0, max_new_tokens=max_new),
            prompt_tokens=rng.integers(300, vocab - 1, prompt_len).tolist(),
        )
        for _ in range(n)
    ]


def gen_reqs_real(engine, n, max_new):
    return [
        engine.submit(
            PROMPTS[i % len(PROMPTS)],
            SampleParams(temperature=0.0, max_new_tokens=max_new),
        )
        for i in range(n)
    ]


def main():
    extra = {"rounds": 3, "reqs": 4}
    overrides = []
    for arg in sys.argv[1:]:
        key, _, val = arg.partition("=")
        if key in extra:
            extra[key] = int(val)
        else:
            overrides.append(arg)
    cfg = load_config(overrides=overrides)
    engine = Engine(cfg)
    timers = get_timers()

    for rnd in range(extra["rounds"]):
        timers.reset()
        t0 = time.perf_counter()
        if cfg.request.prompt_tokens_len > 0:
            reqs = gen_reqs_fake(
                engine,
                extra["reqs"],
                cfg.request.prompt_tokens_len,
                cfg.request.max_new_tokens,
            )
        else:
            reqs = gen_reqs_real(engine, extra["reqs"], cfg.request.max_new_tokens)
        engine.run_until_complete()
        wall = time.perf_counter() - t0
        out_tokens = sum(len(r.async_stream.tokens) for r in reqs)
        logger.info(
            "round %d: %d reqs, %d output tokens in %.2fs (%.1f tok/s)",
            rnd,
            len(reqs),
            out_tokens,
            wall,
            out_tokens / wall,
        )
        logger.info(timers.log())
        for r in reqs[:1]:
            content, reasoning = r.async_stream.full_text()
            logger.info("sample output: %r", content[:200])

    engine.terminate()
    assert engine.is_terminated()


if __name__ == "__main__":
    main()
