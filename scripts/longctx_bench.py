"""Long-context decode A/B: bf16 vs fp8 KV cache.

At context ~2k the per-step KV read traffic rivals weight traffic
(TinyLlama geometry, bs=8: ~0.7 GB KV vs 2.2 GB weights), so
infer.kv_dtype=fp8 — which halves KV bytes — shows its real value here,
not at the short-context bench.py workload. Prints one JSON line per
variant. Run on the real chip: python scripts/longctx_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# overridable for smoke runs: longctx_bench.py [BS PROMPT NEW MAX_SEQ]
BS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
PROMPT = int(sys.argv[2]) if len(sys.argv) > 2 else 1792
NEW = int(sys.argv[3]) if len(sys.argv) > 3 else 128
MAX_SEQ = int(sys.argv[4]) if len(sys.argv) > 4 else 2048
MODEL = os.environ.get("CHITU_BENCH_MODEL", "tiny-llama-debug")
ROUNDS = 3


def measure(kv_dtype: str):
    from chitu_tpu.config import load_config
    from chitu_tpu.engine import Engine
    from chitu_tpu.task import SampleParams
    from chitu_tpu.utils import get_timers

    cfg = load_config(
        overrides=[
            f"models={MODEL}",
            f"infer.max_seq_len={MAX_SEQ}",
            f"infer.page_size={min(256, MAX_SEQ // 4)}",
            "infer.decode_window=32",
            f"infer.max_reqs={BS}",
            "infer.stop_with_eos=false",
            f"infer.decode_buckets={BS}",
            f"infer.kv_dtype={kv_dtype}",
        ]
    )
    eng = Engine(cfg)
    rng = np.random.default_rng(0)

    def batch():
        return [
            eng.submit(
                "",
                SampleParams(temperature=0.0, max_new_tokens=NEW),
                prompt_tokens=rng.integers(
                    300, cfg.models.vocab_size - 1, PROMPT
                ).tolist(),
            )
            for _ in range(BS)
        ]

    batch()
    eng.run_until_complete()  # warmup/compile round

    timers = get_timers()
    per_round = []
    for _ in range(ROUNDS):
        timers.reset()
        reqs = batch()
        eng.run_until_complete()
        assert all(len(r.async_stream.tokens) == NEW for r in reqs)
        per_round.append(BS * NEW / timers.timers["decode"].elapsed_)
    per_round.sort()
    return per_round[len(per_round) // 2], per_round


def main():
    import jax

    from chitu_tpu.config import load_config

    bf16, r1 = measure("bf16")
    fp8, r2 = measure("fp8")
    m = load_config(overrides=[f"models={MODEL}"]).models
    m_kv = 2 * m.n_kv_heads * (m.dim // m.n_heads)  # packed K||V minor
    kv_gb = m.n_layers * BS * (PROMPT + NEW / 2) * m_kv * 2 / 1e9
    for name, tok, rounds in (("bf16", bf16, r1), ("fp8", fp8, r2)):
        print(
            json.dumps(
                {
                    "metric": f"longctx_decode_tok_per_s_kv_{name}",
                    "value": round(tok, 2),
                    "unit": "tok/s",
                    "vs_baseline": round(tok / bf16, 4),
                    "detail": {
                        "backend": jax.default_backend(),
                        "bs": BS,
                        "prompt": PROMPT,
                        "new": NEW,
                        "rounds": [round(r, 1) for r in rounds],
                        "kv_read_gb_per_step_bf16": round(kv_gb, 3),
                    },
                }
            )
        )


if __name__ == "__main__":
    main()
