"""MLA decode-step time attribution at the deepseek-mini-bench geometry.

Measures engine decode tok/s with pieces of the step stubbed out, so the
per-step time splits into weights / attention / routed-expert / glue
shares (VERDICT r4 next-1 asks for a profile-backed attribution of the
MLA decode envelope).

Variants (each runs in a fresh process — jit caches must not mix):
  full       the production step
  no_attn    attend_decode returns zeros, append_decode skips the scatter
             (isolates the attention kernel + cache-append cost)
  no_routed  routed-expert MoE returns zeros (isolates the grouped-GEMM
             dispatch cost; shared expert + attention stay)
  no_moe_all shared + routed both skipped

Usage: python scripts/mla_ablate.py <variant> [fp8] [bs]
       python scripts/mla_ablate.py all [bs]   # orchestrates subprocesses
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

MODEL = os.environ.get("MLA_ABLATE_MODEL", "deepseek-mini-bench")
PROMPT, NEW, ROUNDS = 128, 64, 3


def _patch(variant: str):
    import jax.numpy as jnp

    if variant == "no_attn":
        from chitu_tpu.ops import attention as attn_ops

        def attend_decode(q, pool, layer, block_tables, seq_lens, page_size,
                          kv_heads, head_dim, **kw):
            return jnp.zeros(q.shape[:-1] + (head_dim,), q.dtype)

        def append_decode(pool, layer, k, v, *a, **kw):
            return pool

        attn_ops.attend_decode = attend_decode
        attn_ops.append_decode = append_decode
    elif variant in ("no_routed", "no_moe_all"):
        from chitu_tpu.models import deepseek_v3 as ds

        def moe_ffn_auto(x, *a, **kw):
            return jnp.zeros_like(x)

        ds.moe_ffn_auto = moe_ffn_auto
        if variant == "no_moe_all":
            orig = ds.DeepSeekV3ForCausalLM._moe_ffn
            ds.DeepSeekV3ForCausalLM._moe_ffn = (
                lambda self, x, layers, layer, mesh=None, tp_axis="":
                jnp.zeros_like(x)
            )
    elif variant != "full":
        raise SystemExit(f"unknown variant {variant}")


def measure(variant: str, quant: bool, bs: int) -> float:
    _patch(variant)
    import numpy as np

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
    extra = os.environ.get("MLA_ABLATE_EXTRA", "")
    if extra:
        over += [o for o in extra.split(",") if o]
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
    eng.run_until_complete()
    timers = get_timers()
    per_round = []
    for _ in range(ROUNDS):
        timers.reset()
        reqs = batch()
        eng.run_until_complete()
        per_round.append(bs * NEW / timers.timers["decode"].elapsed_)
    per_round.sort()
    return per_round[len(per_round) // 2]


def main():
    if sys.argv[1] == "all":
        bs = sys.argv[2] if len(sys.argv) > 2 else "16"
        out = {}
        for variant in ("full", "no_attn", "no_routed", "no_moe_all"):
            for q in ("bf16", "fp8"):
                args = [sys.executable, __file__, variant]
                if q == "fp8":
                    args.append("fp8")
                args.append(bs)
                r = subprocess.run(args, capture_output=True, text=True)
                line = [l for l in r.stdout.splitlines() if l.startswith("{")]
                if not line:
                    print(f"{variant}/{q} FAILED:\n{r.stderr[-2000:]}")
                    continue
                d = json.loads(line[-1])
                out[f"{variant}_{q}"] = d["tok_per_s"]
                print(json.dumps(d), flush=True)
        if "full_bf16" in out:
            print(json.dumps({"summary": out, "bs": int(bs)}))
        return

    variant = sys.argv[1]
    quant = len(sys.argv) > 2 and sys.argv[2] == "fp8"
    bs = int(sys.argv[3]) if len(sys.argv) > 3 else (
        int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2] != "fp8" else 16
    )
    tok = measure(variant, quant, bs)
    ms = bs * 1000.0 / tok
    print(json.dumps({
        "variant": variant, "quant": "fp8" if quant else "bf16",
        "bs": bs, "tok_per_s": round(tok, 2), "step_ms": round(ms, 3),
    }))


if __name__ == "__main__":
    main()
