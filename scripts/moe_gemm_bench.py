"""Grouped-MoE GEMM micro-benchmark at the flagship decode shapes.

VERDICT r4 next-3: the fp8 MLA decode sits at 0.85 of its envelope and
the attribution points at the grouped kernel's in-K-loop dequant
(~490 GB/s effective vs 590 for the bf16 stacks). This isolates the
kernel at the exact deepseek-mini-bench decode shapes so variants can be
A/B'd directly: effective GB/s = live expert bytes / wall.

Usage: python scripts/moe_gemm_bench.py [bs]
Env:   CHITU_TPU_MOE_WBUDGET — the kernel's DMA chunk budget (bytes)
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np


def run(bs: int = 16):
    from chitu_tpu.models.moe import dispatch_geometry, sorted_dispatch
    from chitu_tpu.ops.pallas_moe_gemm import grouped_matmul
    from chitu_tpu.ops.qtensor import QTensor, QuantKind

    # L=2 keeps the synthetic stacks (+ int32 randint transients) inside
    # HBM; the kernel reads ONE layer's slice per call, so per-call
    # traffic matches the 12-layer engine exactly
    L, E, D, F, k = 2, 32, 2048, 1024, 4
    key = jax.random.PRNGKey(0)
    interp = jax.default_backend() != "tpu"

    shapes = {
        # merged gate|up: [L, E, D, 2F]; down: [L, E, F, D]
        "gu": (L, E, D, 2 * F),
        "down": (L, E, F, D),
    }
    sel = jax.random.randint(jax.random.fold_in(key, 9), (bs, k), 0, E)
    bm, NB = dispatch_geometry(bs, k, E)
    row_assign, block_expert = sorted_dispatch(sel, E, bm)
    live = int(np.sum(np.asarray(block_expert) >= 0))
    print(f"bs={bs} bm={bm} NB={NB} live_blocks={live}")

    results = {}
    for name, (l, e, K, N) in shapes.items():
        xs = jax.random.normal(
            jax.random.fold_in(key, 1), (NB * bm, K), jnp.bfloat16
        )
        data8 = jax.random.randint(
            jax.random.fold_in(key, 2), (l, e, K, N), -127, 127, jnp.int8
        )
        nq = K // 128
        nqp = -(-nq // 8) * 8
        scale = jnp.abs(
            jax.random.normal(
                jax.random.fold_in(key, 3), (l, e, nqp, N), jnp.float32
            )
        ) * 0.01
        qt = QTensor(
            data=data8, scale=scale, kind=QuantKind.SOFT_FP8, block=128
        )
        datab = data8.astype(jnp.bfloat16) * 0.01

        CHAIN = 10

        def many(xs, w, be):
            # serialize CHAIN kernel calls via a data dependency so the
            # per-dispatch tunnel latency (~1 ms) amortizes away and XLA
            # cannot CSE the repeats
            x = xs
            acc = jnp.float32(0)
            for _ in range(CHAIN):
                o = grouped_matmul(x, w, 1, be, bm, interp)
                x = xs + (o[:1, :1].sum() * 0).astype(xs.dtype)
                acc = acc + o[0, 0].astype(jnp.float32)
            return acc

        for tag, w in (("int8", qt), ("bf16", datab)):
            # w as an ARGUMENT: a closed-over array inlines as an HLO
            # constant (the tunnel's remote-compile rejects >100MB bodies)
            fn = jax.jit(many)
            out = fn(xs, w, block_expert)
            jax.block_until_ready(out)
            reps = 5
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(xs, w, block_expert)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / (reps * CHAIN)
            item = 1 if tag == "int8" else 2
            bytes_live = live * K * N * item
            gbs = bytes_live / dt / 1e9
            results[f"{name}_{tag}"] = (dt * 1e3, gbs)
            print(
                f"{name:5s} {tag}: {dt*1e3:7.3f} ms  "
                f"{gbs:6.1f} GB/s effective (live bytes)"
            )
    return results


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    run(bs)
