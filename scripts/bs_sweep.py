"""fp8-vs-bf16 decode across batch sizes (the reference's README table
shape: bs=1..32 — BASELINE.md north star asks >=1.5x output/s per unit
HBM bandwidth for fp8 vs bf16 across that range).

Runs the 3B dense geometry (94% quantizable weights) through the full
engine at each bs; prints one JSON line per batch size.

Usage: python scripts/bs_sweep.py [model_card]
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

MODEL = sys.argv[1] if len(sys.argv) > 1 else "llama-3b-bench"
PROMPT, NEW, ROUNDS = 128, 64, 3
SIZES = (1, 4, 16, 32)


def measure(bs: int, quant: bool) -> float:
    from chitu_tpu.config import load_config
    from chitu_tpu.engine import Engine
    from chitu_tpu.task import SampleParams
    from chitu_tpu.utils import get_timers

    over = [
        f"models={MODEL}",
        "infer.max_seq_len=512",
        "infer.page_size=256",
        f"infer.decode_window={NEW}",
        f"infer.max_reqs={bs}",
        "infer.stop_with_eos=false",
        f"infer.decode_buckets={bs}",
    ]
    if quant:
        over += ["quant.method=soft_fp8", "quant.quant_on_load=true"]
    eng = Engine(load_config(overrides=over))
    rng = np.random.default_rng(0)

    def batch():
        return [
            eng.submit(
                "",
                SampleParams(temperature=0.0, max_new_tokens=NEW),
                prompt_tokens=rng.integers(300, 31999, PROMPT).tolist(),
            )
            for _ in range(bs)
        ]

    batch()
    eng.run_until_complete()  # warmup/compile
    timers = get_timers()
    per_round = []
    for _ in range(ROUNDS):
        timers.reset()
        reqs = batch()
        eng.run_until_complete()
        assert all(len(r.async_stream.tokens) == NEW for r in reqs)
        per_round.append(bs * NEW / timers.timers["decode"].elapsed_)
    per_round.sort()
    return per_round[len(per_round) // 2]


def main():
    import jax

    for bs in SIZES:
        bf16 = measure(bs, quant=False)
        fp8 = measure(bs, quant=True)
        print(
            json.dumps(
                {
                    "metric": f"bs_sweep_{MODEL}_bs{bs}",
                    "value": round(fp8, 2),
                    "unit": "tok/s",
                    "vs_baseline": round(fp8 / bf16, 4),
                    "detail": {
                        "backend": jax.default_backend(),
                        "bf16_tok_per_s": round(bf16, 2),
                        "fp8_tok_per_s": round(fp8, 2),
                        "fp8_vs_bf16": round(fp8 / bf16, 4),
                        "prompt": PROMPT,
                        "new": NEW,
                    },
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
