"""Prefill MFU measurement (VERDICT r3 next-8: prefill efficiency was
never examined; all perf rounds targeted decode).

Measures packed-prefill throughput at the bench geometries and reports
MFU = 2 * params * tok_per_s / peak_flops (bf16 MXU peak 197 TFLOP/s on
v5e). Sweeps prompt length (the causal-block waste and slab padding
scale with it) and batch (the packing efficiency lever).

Usage: python scripts/prefill_bench.py [model_card]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

MODEL = sys.argv[1] if len(sys.argv) > 1 else "llama-3b-bench"
ROUNDS = 3
PEAK = 197e12  # v5e bf16 MXU peak


def model_params(m) -> int:
    """ACTIVE params per token (the MFU denominator): MoE counts the
    shared expert + the k activated routed experts only, MLA counts the
    lora/absorb projections — total params would overstate per-token
    FLOPs ~6x at the deepseek-mini geometry."""
    d, L, H, KV, Dh, F, V = (
        m.dim, m.n_layers, m.n_heads, m.n_kv_heads, m.head_dim_(),
        m.inter_dim, m.vocab_size,
    )
    ml, mo = m.mla, m.moe
    if ml is not None:
        qk = ml.qk_nope_head_dim + ml.qk_rope_head_dim
        attn = (
            (d * ml.q_lora_rank + ml.q_lora_rank * H * qk)
            if ml.q_lora_rank
            else d * H * qk
        )
        attn += d * (ml.kv_lora_rank + ml.qk_rope_head_dim)
        attn += ml.kv_lora_rank * H * (ml.qk_nope_head_dim + ml.v_head_dim)
        attn += H * ml.v_head_dim * d
    else:
        attn = d * H * Dh + 2 * d * KV * Dh + H * Dh * d
    if mo is not None:
        Ld = mo.n_dense_layers
        Lm = L - Ld
        dense_ffn = 3 * d * F
        act_ffn = 3 * d * mo.moe_inter_dim * (
            max(mo.n_shared_experts, 1) + mo.n_activated_experts
        )
        layers = L * attn + Ld * dense_ffn + Lm * act_ffn
    else:
        layers = L * (attn + 3 * d * F)
    return V * d + layers + d * V


def measure(bs: int, prompt: int):
    from chitu_tpu.config import load_config
    from chitu_tpu.engine import Engine
    from chitu_tpu.task import SampleParams
    from chitu_tpu.utils import get_timers

    max_seq = 1 << (prompt + 64).bit_length()
    cfg = load_config(
        overrides=[
            f"models={MODEL}",
            f"infer.max_seq_len={max_seq}",
            "infer.page_size=256",
            "infer.decode_window=4",
            f"infer.max_reqs={bs}",
            "infer.stop_with_eos=false",
            f"infer.decode_buckets={bs}",
        ]
    )
    eng = Engine(cfg)
    rng = np.random.default_rng(0)

    def batch():
        return [
            eng.submit(
                "",
                SampleParams(temperature=0.0, max_new_tokens=2),
                prompt_tokens=rng.integers(
                    300, cfg.models.vocab_size - 1, prompt
                ).tolist(),
            )
            for _ in range(bs)
        ]

    batch()
    eng.run_until_complete()
    timers = get_timers()
    per_round = []
    for _ in range(ROUNDS):
        timers.reset()
        batch()
        eng.run_until_complete()
        per_round.append(bs * prompt / timers.timers["prefill"].elapsed_)
    per_round.sort()
    tok_s = per_round[len(per_round) // 2]
    flops = 2.0 * model_params(cfg.models) * tok_s
    return tok_s, flops / PEAK


def main():
    import jax

    for bs, prompt in ((16, 128), (16, 256), (8, 512), (4, 1024)):
        tok_s, mfu = measure(bs, prompt)
        print(
            json.dumps(
                {
                    "metric": f"prefill_{MODEL}_bs{bs}_p{prompt}",
                    "value": round(tok_s, 1),
                    "unit": "tok/s",
                    "vs_baseline": round(mfu, 4),
                    "detail": {
                        "backend": jax.default_backend(),
                        "mfu": round(mfu, 4),
                        "bs": bs,
                        "prompt": prompt,
                    },
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
