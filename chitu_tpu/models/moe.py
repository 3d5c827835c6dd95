"""Mixture-of-experts: routing + token-sorted ragged expert dispatch.

Capability parity with the reference's MoE stack
(reference: chitu/models/model_deepseek_v3.py:774-1061 MoEDeepSeekV3 gate +
fused experts, chitu/fused_moe.py vLLM-derived token-sorted kernels,
chitu/models/model_hf_mixtral.py:51-96 dense expert loop), re-designed
TPU-first:

- Routing covers both gate flavors: softmax top-k with renormalization
  (Mixtral) and sigmoid + bias-corrected, group-limited top-k with
  route_scale (DeepSeek-V3; reference: model_deepseek_v3.py:774-842).
- The primary dispatch is **argsort-based and exact** (`sorted_dispatch`):
  (token, choice) assignments are stably sorted by expert and laid out in
  BM-row blocks padded per expert — the static-shape equivalent of the
  reference's `moe_align_block_size` contract (chitu/fused_moe.py:314-610).
  Expert GEMMs then run through the grouped Pallas kernel
  (ops/pallas_moe_gemm.py) which indexes the (layer, expert) weight stack
  in-kernel — quantized experts stay packed in HBM and dequantize inside
  the GEMM, so weight-only fp8 keeps its bandwidth win at MoE scale
  (the reference's in-kernel soft-fp8 dequant, fused_moe.py:195-246).
  No token is ever dropped on this path.
- Under a mesh the expert dim shards over 'tp' — real expert parallelism
  (the reference only stubbed EP, SURVEY.md §2.7) — via a shard_map whose
  shards each dispatch their local experts and psum the combine.
- `moe_ffn` (capacity/einsum formulation) remains as the GSPMD fallback
  for layouts shard_map does not cover (pp>1 meshes); its capacity factor
  is configurable (MoEArgs.capacity_factor) and decode-sized batches get
  exact capacity, so serving decode never drops tokens there either.
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
    capacity so no routed token is ever dropped in the serving hot loop.
    `factor` comes from MoEArgs.capacity_factor — raise it for prefill
    batches with skewed expert load (tokens beyond capacity drop that
    expert's contribution on this fallback path; the sorted path is
    exact)."""
    if T <= 64:
        return T
    cap = int(math.ceil(T * k / E * factor))
    return max(min(cap, T), 4)


# ---------------------------------------------------------------------------
# Token-sorted ragged dispatch (the moe_align_block_size equivalent;
# reference: chitu/fused_moe.py:314-610) — exact, static shapes.
# ---------------------------------------------------------------------------


def dispatch_geometry(T: int, k: int, E: int) -> Tuple[int, int]:
    """(bm, NB): block row count and static block-count bound.

    bm tracks the expected per-expert row count (~2*A/E, clamped to
    [16, 256] powers of two) so that most active experts fit one block —
    each live block DMAs its expert's full weights, so blocks/expert is
    the weight-traffic multiplier. NB covers the worst case: ceil(A/bm)
    full blocks plus one partial block per active expert."""
    A = T * k
    per = max(1, (2 * A) // max(E, 1))
    bm = 16
    while bm < per and bm < 256:
        bm *= 2
    NB = -(-A // bm) + min(E, A)
    return bm, NB


def sorted_dispatch(
    sel: jnp.ndarray,  # [T, k] int32 expert ids in [0, E)
    E: int,
    bm: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort (token, choice) assignments by expert into bm-row blocks.

    Returns (row_assign [NB*bm] int32, block_expert [NB] int32):
    - row_assign[r] = flat assignment index (token*k + choice) occupying
      padded row r, or A (sentinel) for padding rows;
    - block_expert[b] = expert owning block b, or -1 for dead blocks
      (beyond the live blocks; the grouped kernel skips their weight DMA
      and writes zeros).
    Experts appear in ascending order; each expert's rows are contiguous
    and padded to a block multiple, so every live block holds exactly one
    expert's rows — the `moe_align_block_size` contract.

    Decode-sized A uses a COUNTING-sort formulation (one [A, E] one-hot
    cumsum) instead of argsort: the TPU bitonic sort + its companion
    fusions measured ~75 us PER LAYER PER STEP at bs=16 — ~45% on top of
    the expert GEMMs themselves (r5 xplane attribution; the gap behind
    VERDICT r4's fp8-envelope 0.85). Counting sort is stable by
    construction, so the outputs are bit-identical to the argsort path,
    which remains for prefill-sized A where the [A, E] one-hot would be
    quadratic."""
    T, k = sel.shape
    A = T * k
    _, NB = dispatch_geometry(T, k, E)
    e_flat = sel.reshape(A).astype(jnp.int32)
    if A <= 512:
        onehot = (
            e_flat[:, None] == jnp.arange(E, dtype=jnp.int32)[None, :]
        ).astype(jnp.int32)  # [A, E]
        counts = jnp.sum(onehot, axis=0)
        # rank of assignment a within its expert = exclusive cumsum
        pos = jnp.sum(
            (jnp.cumsum(onehot, axis=0) - onehot) * onehot, axis=-1
        )
        blocks_e = (counts + bm - 1) // bm
        row_start = (jnp.cumsum(blocks_e) - blocks_e) * bm
        dest = jnp.take(row_start, e_flat) + pos
        row_assign = (
            jnp.full((NB * bm,), A, jnp.int32)
            .at[dest]
            .set(jnp.arange(A, dtype=jnp.int32), mode="drop")
        )
    else:
        order = jnp.argsort(e_flat, stable=True).astype(jnp.int32)
        e_sorted = jnp.take(e_flat, order)
        counts = jnp.bincount(e_flat, length=E).astype(jnp.int32)
        blocks_e = (counts + bm - 1) // bm
        row_start = (jnp.cumsum(blocks_e) - blocks_e) * bm  # padded starts
        tok_start = jnp.cumsum(counts) - counts
        rank = (
            jnp.arange(A, dtype=jnp.int32) - jnp.take(tok_start, e_sorted)
        )
        dest = jnp.take(row_start, e_sorted) + rank
        row_assign = (
            jnp.full((NB * bm,), A, jnp.int32)
            .at[dest]
            .set(order, mode="drop")
        )
    first = row_assign.reshape(NB, bm)[:, 0]
    safe = jnp.minimum(first, A - 1)
    block_expert = jnp.where(first < A, jnp.take(e_flat, safe), -1)
    return row_assign, block_expert


def sorted_combine(
    out_rows: jnp.ndarray,  # [NB*bm, D]
    row_assign: jnp.ndarray,  # [NB*bm]
    weights: jnp.ndarray,  # [T, k] f32 routing weights
) -> jnp.ndarray:
    """Expert outputs back to tokens, weighted. Returns [T, D].

    Decode-sized T: ONE [T, R] x [R, D] MXU dot against a weighted
    one-hot combine matrix — the XLA scatter-add serializes per index
    (~43 us/layer/step at bs=16, r5 xplane attribution; it was the
    single largest non-GEMM op in the fp8 decode step). Large T keeps
    the scatter (the combine matrix would go quadratic)."""
    T, k = weights.shape
    A = T * k
    valid = row_assign < A
    safe = jnp.minimum(row_assign, A - 1)
    tok = jnp.where(valid, safe // k, T)
    if T <= 128:
        # w_row via one-hot matvec: jnp.take of the [A] weight vector
        # lowers to an A-way scalar select chain (~23 us/layer/step at
        # A=64 — the second-largest glue op in the r5 attribution)
        oh_a = (
            safe[:, None] == jnp.arange(A, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)  # [R, A]
        w_row = (
            jax.lax.dot_general(
                oh_a,
                weights.reshape(A).astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * valid
        )
        comb = jnp.where(
            tok[None, :] == jnp.arange(T, dtype=jnp.int32)[:, None],
            w_row[None, :],
            0.0,
        )  # [T, R] f32
        return jax.lax.dot_general(
            comb,
            out_rows.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    w_row = jnp.take(weights.reshape(A), safe) * valid
    contrib = out_rows.astype(jnp.float32) * w_row[:, None]
    y = jnp.zeros((T, out_rows.shape[-1]), jnp.float32)
    return y.at[tok].add(contrib, mode="drop")


def moe_ffn_sorted(
    x: jnp.ndarray,  # [T, D]
    w_gate,  # [(L,) E, D, F] dense or QTensor; or merged [.., D, 2F]
    w_up,  # None when w_gate holds the merged [gate | up] stack
    w_down,  # [(L,) E, F, D]
    weights: jnp.ndarray,  # [T, k]
    sel: jnp.ndarray,  # [T, k] ids in [0, E_dispatch)
    n_experts: int,  # real experts indexable in the stacks
    layer=None,
    interpret: bool = False,
    e_dispatch: Optional[int] = None,  # ids >= n_experts mark invalid
) -> jnp.ndarray:
    """Exact token-sorted MoE SwiGLU through the grouped Pallas GEMM."""
    from chitu_tpu.ops.pallas_moe_gemm import grouped_matmul

    T, D = x.shape
    k = sel.shape[-1]
    Ed = e_dispatch or n_experts
    bm, _ = dispatch_geometry(T, k, Ed)
    row_assign, block_expert = sorted_dispatch(sel, Ed, bm)
    # blocks of out-of-range experts (EP: owned by another shard) are dead
    block_expert = jnp.where(block_expert >= n_experts, -1, block_expert)

    A = T * k
    valid = row_assign < A
    tok = jnp.where(valid, jnp.minimum(row_assign, A - 1) // k, 0)
    if T <= 128:
        # decode-sized: one-hot MXU dot instead of the row gather (same
        # rationale as sorted_combine — 0/1 x bf16 products are exact)
        sel_oh = (
            tok[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :]
        ).astype(jnp.bfloat16)  # [R, T]
        xs = jax.lax.dot_general(
            sel_oh, x.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    else:
        xs = jnp.take(x, tok, axis=0).astype(jnp.bfloat16)  # [NB*bm, D]

    # quant.fp8_act='e4m3': the expert GEMMs bypass linear(), so the
    # true-fp8 activation rounding must apply here too (reference
    # act_quant feeds fused_moe the same way, chitu/fused_moe.py:613-793)
    from chitu_tpu.ops.linear import maybe_fp8_act

    xs = maybe_fp8_act(xs, w_gate)
    layer = 0 if layer is None else layer
    if w_up is None:
        # merged [gate | up] stack: ONE grouped GEMM, split halves
        gu = grouped_matmul(xs, w_gate, layer, block_expert, bm, interpret)
        F = gu.shape[-1] // 2
        g, u = gu[:, :F], gu[:, F:]
    else:
        g = grouped_matmul(xs, w_gate, layer, block_expert, bm, interpret)
        u = grouped_matmul(xs, w_up, layer, block_expert, bm, interpret)
    h = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(
        jnp.bfloat16
    )
    h = maybe_fp8_act(h, w_down)
    d = grouped_matmul(h, w_down, layer, block_expert, bm, interpret)
    return sorted_combine(d, row_assign, weights).astype(x.dtype)


def _sorted_eligible(ws) -> bool:
    from chitu_tpu.ops.pallas_moe_gemm import kernel_eligible

    return all(kernel_eligible(w) for w in ws if w is not None)


def moe_ffn_manual_ep(
    x: jnp.ndarray,  # [T, D]
    w_gate,  # LOCAL [Ll, El, K, N] stack (dense or QTensor)
    w_up,  # None when w_gate holds merged [gate | up]
    w_down,
    weights: jnp.ndarray,  # [T, k]
    sel: jnp.ndarray,  # [T, k] GLOBAL expert ids
    tp_axis: str,
    layer=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Local-expert sorted MoE INSIDE an enclosing manual shard_map whose
    `tp_axis` shards the expert dim (the pipelined pp x tp dual stack,
    VERDICT r4 next-2): the stacks arriving here are already local
    (layer-chunk x expert-chunk) slices, so this shard dispatches only
    its experts through the grouped kernel and returns its PARTIAL
    combine — the CALLER psums over tp_axis (letting it fold the shared
    expert / attention partials into one collective). Mirrors
    `_moe_ffn_ep.local` outside the pipeline (reference EP contract:
    chitu/fused_moe.py:449-463 expert_map -1 write_zeros)."""
    from chitu_tpu.ops.qtensor import QTensor

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ref = w_gate if w_gate is not None else w_down
    El = (ref.data if isinstance(ref, QTensor) else ref).shape[-3]
    e0 = jax.lax.axis_index(tp_axis) * El
    sl = sel - e0
    sl = jnp.where((sl < 0) | (sl >= El), El, sl)
    return moe_ffn_sorted(
        x, w_gate, w_up, w_down, weights, sl, El,
        layer=layer, interpret=interpret, e_dispatch=El + 1,
    )


_capacity_warned = set()


def _warn_capacity_fallback(T: int, E: int, cap: int):
    """One-time host-side visibility when the capacity-einsum fallback is
    traced (ADVICE r1: drops were silent). Tokens routed beyond an
    expert's static capacity are dropped on this path under skewed
    loads; the sorted paths are exact."""
    key = (T, E, cap)
    if key in _capacity_warned or cap >= T:
        return  # cap == T can never drop (each token appears once/expert)
    _capacity_warned.add(key)
    from chitu_tpu.utils import get_logger

    get_logger().warning(
        "MoE capacity-einsum fallback (pp>1 or experts %% tp != 0): "
        "tokens beyond capacity=%d/expert DROP under skewed load at "
        "T=%d, E=%d — raise models.moe.capacity_factor for long prefill",
        cap, T, E,
    )


def moe_ffn_auto(
    x: jnp.ndarray,
    w_gate,
    w_up,
    w_down,
    weights: jnp.ndarray,
    sel: jnp.ndarray,
    moe,  # MoEArgs
    layer=None,
    mesh=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Pick the MoE execution path:

    - no mesh: exact sorted dispatch + grouped kernel (interpret on CPU);
    - mesh with experts divisible by tp: shard_map EP — each shard
      sorts/dispatches its local experts, psum combine. Composes with
      pp>1 (the flagship DeepSeek layout, reference: chitu/executor.py:179-299
      PP stage relay + fused_moe.py): quantized whole stacks keep their
      'pp' layer-dim sharding inside the shard_map and only the owning
      stage computes a given layer — fp8 experts NEVER dequantize on a
      pp mesh;
    - otherwise: capacity-einsum fallback (GSPMD partitions the einsums;
      quantized experts dequantize — only non-divisible layouts pay this).
    """
    E = moe.n_routed_experts
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    eligible = _sorted_eligible((w_gate, w_up, w_down))
    if mesh is None:
        if eligible:
            return moe_ffn_sorted(
                x, w_gate, w_up, w_down, weights, sel, E,
                layer=layer, interpret=interpret,
            )
    else:
        tp = mesh.shape.get("tp", 1)
        pp = mesh.shape.get("pp", 1)
        if (
            eligible
            and E % tp == 0
            and (pp == 1 or _pp_composable((w_gate, w_up, w_down), pp))
        ):
            return _moe_ffn_ep(
                x, w_gate, w_up, w_down, weights, sel, E, layer, mesh,
                interpret,
            )
    cap = expert_capacity(
        x.shape[0], E, moe.n_activated_experts, moe.capacity_factor
    )
    _warn_capacity_fallback(x.shape[0], E, cap)

    def slice_layer(w):
        # stacked leaves (QTensor or dense) stay whole for the kernel
        # paths; the capacity einsums need this layer's [E, ...] stack
        from chitu_tpu.ops.qtensor import QTensor

        if layer is None:
            return w
        if isinstance(w, QTensor):
            return w[layer] if w.data.ndim == 4 else w
        return w[layer] if w.ndim == 4 else w

    if w_up is None:
        # merged stacks on the capacity fallback: split the halves
        gu = slice_layer(w_gate)
        from chitu_tpu.ops.qtensor import QTensor

        if isinstance(gu, QTensor):
            gu = gu.dequantize(x.dtype)
        F = gu.shape[-1] // 2
        return moe_ffn(
            x, gu[..., :F], gu[..., F:], slice_layer(w_down),
            weights, sel, cap,
        )
    return moe_ffn(
        x, slice_layer(w_gate), slice_layer(w_up), slice_layer(w_down),
        weights, sel, cap,
    )


def _stack_layers(w) -> int:
    """Layer count of a whole stacked leaf ([L, E, K, N]), 0 otherwise."""
    from chitu_tpu.ops.qtensor import QTensor

    nd = w.data.ndim if isinstance(w, QTensor) else w.ndim
    return (w.data if isinstance(w, QTensor) else w).shape[0] if nd == 4 else 0


def _pp_composable(ws, pp: int) -> bool:
    """The EP shard_map can keep 'pp' layer-dim sharding only when every
    whole stacked leaf's layer count divides pp (mirrors how the GSPMD
    specs shard the stack, P('pp', ...))."""
    return all(
        L % pp == 0 for L in (_stack_layers(w) for w in ws if w is not None)
        if L
    )


def _moe_ffn_ep(
    x, w_gate, w_up, w_down, weights, sel, E, layer, mesh, interpret
):
    """Expert-parallel sorted MoE: experts sharded over 'tp', tokens over
    'dp' when present; each shard computes its experts' contributions and
    the combine is a psum over 'tp' (the all-to-all-free EP formulation —
    tokens are small next to expert weights at MoE scale).

    pp>1 composition (the flagship layout): whole stacked leaves keep
    their global P('pp', 'tp', ...) sharding — each pp stage holds L/pp
    layers x E/tp experts. For a given layer only the OWNING stage
    dispatches (other stages mark every assignment invalid, so their
    grouped GEMM blocks are dead: zero weight DMA, zero output) and the
    combine psums over ('tp', 'pp'). Dense scan-sliced [E, K, N] leaves
    are pp-replicated by the scan's layer gather, so pp joins the psum
    only when a stacked leaf is actually stage-gated."""
    from jax.sharding import PartitionSpec as P

    from chitu_tpu.ops.qtensor import QTensor

    tp = mesh.shape.get("tp", 1)
    pp = mesh.shape.get("pp", 1)
    El = E // tp
    # tokens shard over 'dp' only when the count divides; small decode
    # batches (or ring_kv's replicated batch) stay replicated
    dp = mesh.shape.get("dp", 1)
    dp_ax = "dp" if dp > 1 and x.shape[0] % dp == 0 else None

    merged = w_up is None
    wleaves = (w_gate, w_down) if merged else (w_gate, w_up, w_down)
    # stage-gate when pp>1 and any whole stack carries a pp-sharded layer
    # dim (all stacks have the same L by construction)
    L_stack = max((_stack_layers(w) for w in wleaves), default=0)
    pp_gated = pp > 1 and L_stack > 0
    Ll = L_stack // pp if pp_gated else 0

    def leaf_spec(w):
        nd = w.data.ndim if isinstance(w, QTensor) else w.ndim
        if nd == 4:
            return P("pp" if pp_gated else None, "tp")
        return P("tp")

    layer_arr = jnp.reshape(
        jnp.asarray(0 if layer is None else layer, jnp.int32), (1,)
    )

    def local(x_l, weights_l, sel_l, layer_l, *wls):
        wg_l, wu_l, wd_l = (
            (wls[0], None, wls[1]) if merged else wls
        )
        e0 = jax.lax.axis_index("tp") * El
        sl = sel_l - e0
        sl = jnp.where((sl < 0) | (sl >= El), El, sl)
        lidx = layer_l[0]
        if pp_gated:
            stage = jax.lax.axis_index("pp")
            loc = lidx - stage * Ll
            owns = (loc >= 0) & (loc < Ll)
            lidx = jnp.clip(loc, 0, Ll - 1)
            # non-owners invalidate every assignment: all grouped-GEMM
            # blocks dead, zero contribution to the psum
            sl = jnp.where(owns, sl, El)
        y = moe_ffn_sorted(
            x_l, wg_l, wu_l, wd_l, weights_l, sl, El,
            layer=lidx, interpret=interpret, e_dispatch=El + 1,
        )
        return jax.lax.psum(y, ("tp", "pp") if pp_gated else "tp")

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(dp_ax, None),
            P(dp_ax, None),
            P(dp_ax, None),
            P(None),
            *[leaf_spec(w) for w in wleaves],
        ),
        out_specs=P(dp_ax, None),
        check_vma=False,
    )(x, weights, sel, layer_arr, *wleaves)


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
