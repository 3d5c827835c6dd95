"""Device-side op attribution of one MLA decode window (xplane trace).

VERDICT r4 next-3/-4: the engine-level envelope ratios (fp8 0.85, bs=1
ratio 1.34) needed a device-time decomposition. The grouped-GEMM
micro-trace (scripts/moe_gemm_bench.py + /tmp probes, r5) showed the
kernel itself streams at ~727 GB/s for BOTH int8 and bf16 — so the gap
lives in the rest of the step. This runs the real engine at the
deepseek-mini-bench geometry, captures a jax.profiler trace of a decode
window, and buckets XLA-op device time by category.

Usage: python scripts/mla_step_trace.py [bs] [fp8|bf16]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

os.environ.setdefault(
    "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python"
)

CATS = (
    ("moe_gemm", ("_grouped_gemm",)),
    ("attn_kernel", ("_decode_kernel", "attend", "_fused", "decode_fused")),
    ("quant_gemm", ("_quant_gemm", "quant_gemm")),
    ("sort_dispatch", ("sort", "cumsum", "bincount", "iota")),
    ("scatter_append", ("scatter",)),
    ("gather", ("gather",)),
    ("copy", ("copy",)),
    ("fusion", ("fusion",)),
    ("convert", ("convert",)),
    ("dot", ("dot", "convolution")),
)


def categorize(name: str) -> str:
    low = name.lower()
    for cat, pats in CATS:
        if any(p in low for p in pats):
            return cat
    return "other"


def run(bs: int, quant: str):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from chitu_tpu.config import load_config
    from chitu_tpu.engine import Engine
    from chitu_tpu.task import SampleParams

    overrides = [
        "models=deepseek-mini-bench",
        "infer.max_seq_len=512",
        "infer.page_size=256",
        "infer.decode_window=64",
        f"infer.max_reqs={bs}",
        "infer.stop_with_eos=false",
        f"infer.decode_buckets={bs}",
    ]
    if quant == "fp8":
        overrides += ["quant.method=soft_fp8", "quant.quant_on_load=true"]
    cfg = load_config(overrides=overrides)
    eng = Engine(cfg)
    p = SampleParams(temperature=0.0, max_new_tokens=128)

    def burst(n_new):
        reqs = [
            eng.submit(
                f"warm {i} " * 16,
                SampleParams(temperature=0.0, max_new_tokens=n_new),
            )
            for i in range(bs)
        ]
        eng.run_until_complete()
        return reqs

    burst(80)  # compile + warm every program

    outdir = "/tmp/mla_step_trace"
    os.system(f"rm -rf {outdir}")
    jax.profiler.start_trace(outdir)
    burst(128)
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    f = sorted(glob.glob(outdir + "/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())
    cat_ms = defaultdict(float)
    cat_cnt = defaultdict(int)
    top = defaultdict(float)
    total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            # EXCLUSIVE self time: XLA Op events nest (while/call wrap
            # their bodies); subtract each event's children so loop
            # wrappers don't double-count their contents
            evs = sorted(
                line.events, key=lambda e: (e.offset_ps, -e.duration_ps)
            )
            child_sum = {}  # id(ev) -> accumulated direct-child ps
            stack = []  # (end_ps, ev_id)
            for ev in evs:
                start, dur = ev.offset_ps, ev.duration_ps
                while stack and start >= stack[-1][0]:
                    stack.pop()
                if stack:
                    child_sum[stack[-1][1]] = (
                        child_sum.get(stack[-1][1], 0) + dur
                    )
                stack.append((start + dur, id(ev)))
            for ev in evs:
                name = plane.event_metadata[ev.metadata_id].name
                ms = (
                    ev.duration_ps - child_sum.get(id(ev), 0)
                ) / 1e9
                if ms < 0:
                    ms = 0.0
                c = categorize(name)
                cat_ms[c] += ms
                cat_cnt[c] += 1
                top[name.split(" = ")[0]] += ms
                total += ms
    print(f"== decode-window device time by category (bs={bs} {quant}) ==")
    for c, ms in sorted(cat_ms.items(), key=lambda kv: -kv[1]):
        print(f"{ms:9.2f} ms  {100*ms/total:5.1f}%  x{cat_cnt[c]:6d}  {c}")
    print(f"{total:9.2f} ms  total device op time")
    print("== top 15 ops ==")
    for name, ms in sorted(top.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{ms:9.2f} ms  {name[:90]}")


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    quant = sys.argv[2] if len(sys.argv) > 2 else "fp8"
    run(bs, quant)
