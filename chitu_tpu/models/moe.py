"""Mixture-of-experts: routing + capacity-based expert dispatch.

Capability parity with the reference's MoE stack
(reference: chitu/models/model_deepseek_v3.py:774-1061 MoEDeepSeekV3 gate +
fused experts, chitu/fused_moe.py vLLM-derived token-sorted kernels,
chitu/models/model_hf_mixtral.py:51-96 dense expert loop), re-designed
TPU-first:

- Routing covers both gate flavors: softmax top-k with renormalization
  (Mixtral) and sigmoid + bias-corrected, group-limited top-k with
  route_scale (DeepSeek-V3; reference: model_deepseek_v3.py:774-842).
- Dispatch is the einsum/capacity formulation instead of the reference's
  CUDA `moe_align_block_size` + token-sorted GEMM: a static-shape
  dispatch tensor routes tokens to per-expert slots, expert FFNs run as
  one batched einsum on the MXU, and the combine einsum applies routing
  weights. Static shapes keep XLA happy; experts shard over the mesh's
  'tp' axis, which *is* expert parallelism (the reference only stubbed EP,
  SURVEY.md §2.7) — XLA inserts the all-to-all/all-reduce.
- Overflow policy (SURVEY.md §7 hard parts): tokens beyond an expert's
  capacity drop that expert's contribution; capacity_factor sizes slots
  (decode batches use full capacity, so serving decode is always exact).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from chitu_tpu.ops.linear import linear


def route(
    x: jnp.ndarray,  # [T, D]
    gate_w: jnp.ndarray,  # [D, E]
    moe,  # MoEArgs
    gate_bias: Optional[jnp.ndarray] = None,  # [E] score correction bias
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (weights [T, k] f32, selected experts [T, k] i32)."""
    logits = linear(x, gate_w, out_dtype=jnp.float32)  # [T, E]
    E = logits.shape[-1]
    k = moe.n_activated_experts

    if moe.score_func == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)

    # selection scores may carry a correction bias (DeepSeek;
    # reference: model_deepseek_v3.py:800-812) — weights use raw scores
    sel_scores = scores + gate_bias[None, :] if gate_bias is not None else scores

    if moe.n_expert_groups > 1:
        # group-limited routing (reference: model_deepseek_v3.py:813-831):
        # keep only the top `n_limited_groups` groups, score a group by the
        # sum of its top-2 experts
        G = moe.n_expert_groups
        per = E // G
        grouped = sel_scores.reshape(-1, G, per)
        top2 = jax.lax.top_k(grouped, min(2, per))[0].sum(axis=-1)  # [T, G]
        _, top_groups = jax.lax.top_k(top2, moe.n_limited_groups)
        group_mask = jnp.zeros_like(top2, dtype=bool)
        group_mask = group_mask.at[
            jnp.arange(top2.shape[0])[:, None], top_groups
        ].set(True)
        sel_scores = jnp.where(
            jnp.repeat(group_mask, per, axis=-1), sel_scores, -jnp.inf
        )

    _, sel = jax.lax.top_k(sel_scores, k)  # [T, k]
    weights = jnp.take_along_axis(scores, sel, axis=-1)  # [T, k]

    if moe.norm_topk_prob:
        weights = weights / jnp.maximum(
            weights.sum(axis=-1, keepdims=True), 1e-20
        )
    weights = weights * moe.route_scale
    return weights.astype(jnp.float32), sel.astype(jnp.int32)


def expert_capacity(T: int, E: int, k: int, factor: float = 2.0) -> int:
    """Static per-expert slot count; decode-sized batches get exact
    capacity so no routed token is ever dropped in the serving hot loop."""
    if T <= 64:
        return T
    cap = int(math.ceil(T * k / E * factor))
    return max(min(cap, T), 4)


def moe_ffn(
    x: jnp.ndarray,  # [T, D]
    w_gate: jnp.ndarray,  # [E, D, F] (or QTensor with leading E)
    w_up: jnp.ndarray,  # [E, D, F]
    w_down: jnp.ndarray,  # [E, F, D]
    weights: jnp.ndarray,  # [T, k]
    sel: jnp.ndarray,  # [T, k]
    capacity: int,
) -> jnp.ndarray:
    """Capacity-dispatch MoE SwiGLU. Returns [T, D]."""
    T, D = x.shape
    E = w_gate.shape[0]
    k = sel.shape[-1]

    onehot = jax.nn.one_hot(sel, E, dtype=jnp.int32)  # [T, k, E]
    flat = onehot.reshape(T * k, E)
    # slot index = rank of this (token, choice) among the expert's tokens
    pos = jnp.cumsum(flat, axis=0) - flat  # exclusive cumsum [T*k, E]
    pos = (pos * flat).sum(axis=-1).reshape(T, k)  # [T, k]
    in_cap = pos < capacity

    # dispatch [T, k, E, cap] collapsed over k -> [T, E, cap]
    slot_oh = jax.nn.one_hot(
        jnp.where(in_cap, pos, capacity), capacity, dtype=x.dtype
    )  # [T, k, cap] (overflow -> all-zero row)
    disp = jnp.einsum("tke,tkc->tec", onehot.astype(x.dtype), slot_oh)

    expert_in = jnp.einsum("tec,td->ecd", disp, x)  # [E, cap, D]
    gate = _expert_matmul(expert_in, w_gate)  # [E, cap, F]
    up = _expert_matmul(expert_in, w_up)
    hidden = jax.nn.silu(gate) * up
    out_e = _expert_matmul(hidden, w_down)  # [E, cap, D]

    comb = jnp.einsum(
        "tke,tkc,tk->tec",
        onehot.astype(jnp.float32),
        slot_oh.astype(jnp.float32),
        weights,
    ).astype(x.dtype)
    return jnp.einsum("tec,ecd->td", comb, out_e)


def _expert_matmul(x: jnp.ndarray, w) -> jnp.ndarray:
    """[E, cap, D] x [E, D, F] -> [E, cap, F]; handles QTensor experts."""
    from chitu_tpu.ops.qtensor import QTensor

    if isinstance(w, QTensor):
        wd = w.dequantize(x.dtype)
    else:
        wd = w.astype(x.dtype)
    return jnp.einsum("ecd,edf->ecf", x, wd, preferred_element_type=jnp.float32).astype(
        x.dtype
    )


def moe_ffn_ref(
    x: jnp.ndarray,
    w_gate: jnp.ndarray,
    w_up: jnp.ndarray,
    w_down: jnp.ndarray,
    weights: jnp.ndarray,
    sel: jnp.ndarray,
) -> jnp.ndarray:
    """Dense per-expert oracle (the reference Mixtral loop semantics,
    model_hf_mixtral.py:51-96): every expert processes every token, masked
    combine. Exact; used by tests and tiny fallbacks."""
    T, D = x.shape
    E = w_gate.shape[0]
    gate = jnp.einsum("td,edf->etf", x, w_gate.astype(x.dtype))
    up = jnp.einsum("td,edf->etf", x, w_up.astype(x.dtype))
    hid = jax.nn.silu(gate) * up
    out_e = jnp.einsum("etf,efd->etd", hid, w_down.astype(x.dtype))
    onehot = jax.nn.one_hot(sel, E, dtype=jnp.float32)  # [T, k, E]
    w_e = jnp.einsum("tke,tk->te", onehot, weights)  # [T, E]
    return jnp.einsum("te,etd->td", w_e.astype(x.dtype), out_e)
