"""Quantization as parameter-pytree transforms.

Capability parity with the reference's quantization ladder
(reference SURVEY.md §2.6: chitu/quantize/quantizer.py module-tree rewrite,
chitu/quantize/{w8a16,w8a8}.py, chitu/awq/qmodule.py W4A16 group-128,
DeepSeek native FP8 blockwise model_deepseek_v3.py:109-226). The torch
module rewrite becomes a pure function over the parameter tree: eligible
weight leaves are replaced by `QTensor`s and `chitu_tpu.ops.linear`
dispatches to fused dequant+matmul kernels.

Schemes:
- soft_fp8: fp8(e4m3) storage + [in/128, out/128] blockwise f32 scales,
  dequant inside the GEMM (the reference's headline feature,
  docs/en/FAQ.md:3-11)
- fp8: same storage; activations are also quantized at runtime (W8A8-fp8)
- w8a16: int8 weight, per-out-channel scale (reference: quantize/w8a16.py)
- w8a8: int8 weight per-out-channel + dynamic per-token int8 activations
  (reference: quantize/w8a8.py:18-35)
- w4a16: 4-bit weight, group-128 scale+zero along the in dim (AWQ/GPTQ
  checkpoint layout; reference: awq/qmodule.py:123-278)
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Set

import jax
import jax.numpy as jnp

from chitu_tpu.ops.qtensor import QTensor, QuantKind

F8_MAX = 448.0  # float8_e4m3fn max normal
BLOCK = 128


def _block_pad(n: int, b: int) -> int:
    return (n + b - 1) // b * b


@functools.partial(
    jax.jit, static_argnames=("kind", "block"), donate_argnums=(0,)
)
def _quantize_weight_jit(w, kind, block):
    return quantize_weight(w, kind, block)


@functools.partial(
    jax.jit, static_argnames=("kind", "block"), donate_argnums=(0,)
)
def _quantize_stacked_jit(t, kind, block):
    """One cached compile per (shape, kind, block) for stacked leaves;
    donation frees the bf16 input instead of holding it alive next to the
    quantized output (per-leaf lambda-jit shared neither)."""
    return jax.lax.map(lambda w: quantize_weight(w, kind, block), t)


@functools.partial(jax.jit, donate_argnums=(0,))
def _quantize_stacked_llmint8_jit(t):
    return jax.lax.map(quantize_llmint8, t)


def fp8_act_roundtrip(x: jnp.ndarray, block: int = BLOCK) -> jnp.ndarray:
    """Round activations through the fp8-e4m3 grid with dynamic
    per-(row, 128-wide in-block) scales — the reference's runtime
    `act_quant` semantics (reference: chitu/ops.py:329-353: scale =
    absmax/448 per block, values cast to e4m3).

    This is the TRUE-fp8 activation path (quant.fp8_act="e4m3"): the GEMM
    that follows sees exactly the values the reference's fp8xfp8 blockwise
    GEMM would consume, so accuracy matches the reference's fp8 scheme up
    to f32 reassociation. v5e has no fp8 MXU, so the multiply itself runs
    on the bf16/int8 datapath; on fp8-capable TPUs XLA can keep the cast."""
    orig = x.dtype
    *lead, K = x.shape
    kb = _block_pad(K, block) // block
    xf = jnp.pad(
        x.astype(jnp.float32),
        [(0, 0)] * len(lead) + [(0, kb * block - K)],
    ).reshape(*lead, kb, block)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / F8_MAX
    q = (xf / s).astype(jnp.float8_e4m3fn).astype(jnp.float32) * s
    return q.reshape(*lead, kb * block)[..., :K].astype(orig)


def quantize_weight(
    w: jnp.ndarray, kind: QuantKind, block: int = BLOCK
) -> QTensor:
    """Quantize one [..., in, out] weight. Leading dims (stacked layers,
    stacked experts) are treated blockwise-independently."""
    wf = w.astype(jnp.float32)
    *lead, fin, fout = wf.shape

    if kind in (QuantKind.SOFT_FP8, QuantKind.FP8):
        bi = _block_pad(fin, block) // block
        bo = _block_pad(fout, block) // block
        pad = [(0, 0)] * len(lead) + [
            (0, bi * block - fin),
            (0, bo * block - fout),
        ]
        wp = jnp.pad(wf, pad)
        blocks = wp.reshape(*lead, bi, block, bo, block)
        absmax = jnp.max(jnp.abs(blocks), axis=(-3, -1))  # [..., bi, bo]
        scale = jnp.maximum(absmax, 1e-8) / F8_MAX
        q = blocks / scale[..., :, None, :, None]
        q = q.reshape(*lead, bi * block, bo * block)[..., :fin, :fout]
        data = q.astype(jnp.float8_e4m3fn)
        return QTensor(data=data, scale=scale, kind=kind, block=block)

    if kind in (QuantKind.W8A16, QuantKind.W8A8):
        absmax = jnp.max(jnp.abs(wf), axis=-2)  # [..., out]
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(wf / scale[..., None, :]), -127, 127)
        return QTensor(data=q.astype(jnp.int8), scale=scale, kind=kind)

    if kind == QuantKind.W4A16:
        g = block
        ng = _block_pad(fin, g) // g
        pad = [(0, 0)] * len(lead) + [(0, ng * g - fin), (0, 0)]
        wp = jnp.pad(wf, pad).reshape(*lead, ng, g, fout)
        # mask the zero-padded tail rows out of the group statistics,
        # then include 0 in the range EXPLICITLY (standard asymmetric
        # quant: the zero-point must be representable, so all-positive /
        # all-negative groups anchor at 0 rather than clipping)
        real = (
            jnp.arange(ng * g).reshape(ng, g) < fin
        )[..., None]  # [ng, g, 1]
        wmax = jnp.max(jnp.where(real, wp, -jnp.inf), axis=-2)
        wmin = jnp.min(jnp.where(real, wp, jnp.inf), axis=-2)
        wmax = jnp.maximum(wmax, 0.0)  # [..., ng, out]
        wmin = jnp.minimum(wmin, 0.0)
        scale = jnp.maximum(wmax - wmin, 1e-8) / 15.0
        # INTEGER zero-point (AWQ/GPTQ convention): exact round-trip
        # through the packed uint4 checkpoint format (pack_awq)
        zeros = jnp.clip(jnp.round(-wmin / scale), 0, 15)
        q = jnp.clip(
            jnp.round(wp / scale[..., :, None, :] + zeros[..., :, None, :]),
            0,
            15,
        )
        # int8 storage: values 0..15; Mosaic lacks uint8->f32 casts
        data = q.reshape(*lead, ng * g, fout)[..., :fin, :].astype(jnp.int8)
        return QTensor(
            data=data, scale=scale, zeros=zeros, kind=kind, block=g
        )

    raise ValueError(f"unknown quant kind {kind}")


OUTLIER_FRAC = 0.005  # fraction of input channels kept dense (llmint8)


def quantize_llmint8(w: jnp.ndarray, frac: float = OUTLIER_FRAC) -> QTensor:
    """LLM.int8-style quantization: the highest-magnitude input channels
    stay dense in bf16 (outlier decomposition), the rest quantize to
    per-out-channel int8 (reference: bitsandbytes Linear8bitLt threshold
    6.0 decomposes by ACTIVATION magnitude at runtime,
    chitu/quantize/quantizer.py:14-50; the TPU-native variant picks a
    STATIC outlier set by per-channel weight magnitude so shapes stay
    jit-constant — calibration can refine the set offline)."""
    wf = w.astype(jnp.float32)
    *lead, K, N = wf.shape
    k_o = max(8, int(K * frac) // 8 * 8)
    norms = jnp.max(jnp.abs(wf), axis=-1)  # [..., K]
    _, idx = jax.lax.top_k(norms, k_o)  # [..., k_o]
    idx = jnp.sort(idx, axis=-1).astype(jnp.int32)
    oc_w = jnp.take_along_axis(
        wf, idx[..., None], axis=-2
    ).astype(jnp.bfloat16)
    zeroed = jnp.put_along_axis(
        wf, idx[..., None], 0.0, axis=-2, inplace=False
    )
    q = quantize_weight(zeroed, QuantKind.W8A16)
    return QTensor(
        data=q.data, scale=q.scale, kind=QuantKind.W8A16, block=q.block,
        oc_idx=idx, oc_w=oc_w,
    )


def expand_fp8_scales_rowwise(params: Any) -> Any:
    """Blockwise fp8 scales [.., in/B, out/B] -> rowwise [.., in/B, out]
    (storage stays fp8). On TPU `requantize_fp8_storage` does this as
    part of the int8 fast path; CPU/virtual-mesh engines run THIS
    instead so manual-('pp','tp') shard_map eligibility matches the TPU
    layout — a blockwise out/B dim often fails tp divisibility (e.g.
    384/128 = 3 on tiny test geometries) where the rowwise `out` dim
    divides exactly like the weight it scales. The repeat is exact."""

    def walk(tree):
        if isinstance(tree, dict):
            for k in list(tree.keys()):
                tree[k] = walk(tree.pop(k))
            return tree
        if (
            isinstance(tree, QTensor)
            and tree.kind in (QuantKind.SOFT_FP8, QuantKind.FP8)
            and tree.scale.shape[-1] != tree.data.shape[-1]
        ):
            n = tree.data.shape[-1]
            scale = jnp.repeat(tree.scale, tree.block, axis=-1)[
                ..., :n
            ].astype(jnp.float32)
            return QTensor(
                data=tree.data, scale=scale, zeros=tree.zeros,
                kind=tree.kind, block=tree.block, in_perm=tree.in_perm,
                oc_idx=tree.oc_idx, oc_w=tree.oc_w,
            )
        return tree

    return walk(params)


def requantize_fp8_storage(params: Any) -> Any:
    """fp8-e4m3 QTensor storage -> int8 lanes with rescaled block scales.

    TPU v5e has no native fp8 datapath: Mosaic lowers the fp8->f32 cast to
    a many-op VPU sequence that caps the dequant-GEMM at ~40% of the int8
    path's bandwidth. int8 conversion is a single native VPU op, so on
    load we map each fp8 byte value x -> round(x * 127/448) int8 and fold
    448/127 into the blockwise scales. Same bytes moved from HBM, same
    blockwise math; quantization granularity becomes linear-int8 per
    128x128 block (accuracy gated by the perplexity tests).
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def convert(data):
        vals = data.astype(jnp.float32)
        return jnp.clip(
            jnp.round(vals * (127.0 / F8_MAX)), -127, 127
        ).astype(jnp.int8)

    def walk(tree):
        if isinstance(tree, dict):
            for k in list(tree.keys()):
                tree[k] = walk(tree.pop(k))
            return tree
        if (
            isinstance(tree, QTensor)
            and tree.kind in (QuantKind.SOFT_FP8, QuantKind.FP8)
            and tree.data.dtype == jnp.float8_e4m3fn
        ):
            n = tree.data.shape[-1]
            # pre-expand to rowwise [.., in/B, out] so the GEMM never
            # materializes a scale expansion per call
            scale = jnp.repeat(
                tree.scale * (F8_MAX / 127.0), tree.block, axis=-1
            )[..., :n].astype(jnp.float32)
            if tree.data.ndim == 4:
                # expert stacks: the grouped MoE kernel DMAs the whole
                # [in/B, out] scale slab per block — pad the sublane dim
                # to the 8-row tile so the DMA slice is Mosaic-aligned
                nq = scale.shape[-2]
                pad = (-nq) % 8
                if pad:
                    widths = [(0, 0)] * scale.ndim
                    widths[-2] = (0, pad)
                    scale = jnp.pad(scale, widths)
            return QTensor(
                data=convert(tree.data),
                scale=scale,
                zeros=tree.zeros,
                kind=tree.kind,
                block=tree.block,
            )
        return tree

    return walk(params)


PACK_TILE = 512  # GEMM output-tile width the int4 packing is relative to


def pack_int4_storage(params: Any) -> Any:
    """W4A16 nibble-per-byte storage -> 2 nibbles/byte (true 4-bit HBM
    traffic). Packing is tile-relative: within each PACK_TILE-column tile,
    byte column c holds logical column c (low nibble) and column
    c + PACK_TILE/2 (high nibble), so the kernel unpacks with two masks
    and a lane-dim concat — no cross-lane interleave (which relayouts).
    """

    def walk(leaf):
        if (
            isinstance(leaf, QTensor)
            and leaf.kind == QuantKind.W4A16
            and leaf.data.ndim in (2, 3)
            and leaf.data.shape[-1] == leaf.scale.shape[-1]
        ):
            *lead, K, N = leaf.data.shape
            t = PACK_TILE
            if N % t:
                return leaf  # non-tile-multiple out dims stay byte-packed
            tiles = leaf.data.astype(jnp.uint8).reshape(*lead, K, N // t, t)
            lo = tiles[..., : t // 2]
            hi = tiles[..., t // 2 :]
            packed = (lo | (hi << 4)).reshape(*lead, K, N // 2).astype(
                jnp.int8
            )
            return QTensor(
                data=packed,
                scale=leaf.scale,
                zeros=leaf.zeros,
                kind=leaf.kind,
                block=leaf.block,
                in_perm=leaf.in_perm,
            )
        return leaf

    def dwalk(tree):
        if isinstance(tree, dict):
            for k in list(tree.keys()):
                tree[k] = dwalk(tree.pop(k))
            return tree
        return walk(tree)

    return dwalk(params)


def unpack_int4_storage(q: QTensor) -> QTensor:
    """Inverse of pack_int4_storage (for dequantize / XLA fallback);
    handles stacked [L, K, half] storage like the packer does."""
    *lead, K, half = q.data.shape
    t = PACK_TILE
    tiles = q.data.astype(jnp.uint8).reshape(
        *lead, K, half // (t // 2), t // 2
    )
    lo = tiles & 0xF
    hi = (tiles >> 4) & 0xF
    full = jnp.concatenate([lo, hi], axis=-1).reshape(*lead, K, half * 2)
    return QTensor(
        data=full.astype(jnp.int8),
        scale=q.scale,
        zeros=q.zeros,
        kind=q.kind,
        block=q.block,
        in_perm=q.in_perm,
    )


def is_packed_int4(q: QTensor) -> bool:
    return (
        q.kind == QuantKind.W4A16
        and q.scale.shape[-1] == q.data.shape[-1] * 2
    )


_KIND_BY_METHOD = {
    "soft_fp8": QuantKind.SOFT_FP8,
    "fp8": QuantKind.FP8,
    "w8a16": QuantKind.W8A16,
    "w8a8": QuantKind.W8A8,
    "simple_w8a8": QuantKind.W8A8,
    "w4a16": QuantKind.W4A16,
    "w4a16_awq": QuantKind.W4A16,
    "w4a16_gptq": QuantKind.W4A16,
    "awq": QuantKind.W4A16,
    "gptq": QuantKind.W4A16,
    # llmint8: int8 weight-only + dense outlier input channels
    # (quantize_llmint8; reference: quantizer.py:14-50)
    "llmint8": QuantKind.W8A16,
}

_OUTLIER_METHODS = {"llmint8"}


def quantize_params(
    params: Any,
    quant_args,
    model,
    keys: Optional[Set[str]] = None,
) -> Any:
    """Replace eligible weight leaves with QTensors.

    Eligibility follows the reference policy (quantizer.py:277-291): linear
    projection weights only — never norms, embeddings, biases, or lm_head.
    Model adapters may narrow/extend via `quantizable_keys()`.
    """
    method = quant_args.method
    if method in ("none", ""):
        return params
    kind = _KIND_BY_METHOD.get(method)
    if kind is None:
        raise ValueError(f"unknown quant method {method!r}")
    block = quant_args.group_size or BLOCK

    if keys is None:
        keys = getattr(model, "quantizable_keys", lambda: None)()

    if (
        getattr(quant_args, "quantize_head", False)
        and isinstance(params, dict)
        and isinstance(params.get("lm_head"), jnp.ndarray)
        and method not in _OUTLIER_METHODS
    ):
        # opt-in head quantization (quant.quantize_head): untied heads
        # only — consumers go through ops.linear, which dispatches the
        # QTensor to the fused dequant GEMM
        params["lm_head"] = _quantize_weight_jit(
            params["lm_head"], kind, block
        )

    def walk(tree, path=()):
        if isinstance(tree, dict):
            # destructive walk: drop each original leaf as soon as it is
            # quantized so device memory peaks at one extra leaf, not a
            # whole second parameter tree (matters for multi-GB models)
            for k in list(tree.keys()):
                v = tree.pop(k)
                tree[k] = walk(v, path + (k,))
            return tree
        if isinstance(tree, (list, tuple)):
            return type(tree)(
                walk(v, path + (str(i),)) for i, v in enumerate(tree)
            )
        name = path[-1] if path else ""
        under_layers = any("layers" in p or "experts" in p for p in path[:-1])
        eligible = (
            isinstance(tree, jnp.ndarray)
            and tree.ndim >= 2
            and under_layers
            and "norm" not in name
            and not name.startswith("b")
            # router gates stay dense: tiny weights, accuracy-critical
            # (the reference's gate is a raw Parameter, never rewritten;
            # model_deepseek_v3.py:774-842)
            and name not in ("embed", "lm_head", "moe_gate", "gate_bias")
        )
        if keys is not None:
            eligible = eligible and name in keys
        if eligible:
            qfn = (
                quantize_llmint8
                if method in _OUTLIER_METHODS
                else lambda w: _quantize_weight_jit(w, kind, block)
            )
            if tree.ndim >= 3 and tree.shape[0] > 1:
                # stacked leaves quantize layer-by-layer so whole-leaf f32
                # intermediates stay bounded (they peak at several GB for
                # large models) — but inside ONE jitted lax.map: the eager
                # python loop was hundreds of small dispatches, which
                # dominates bring-up behind high-latency device links
                if method in _OUTLIER_METHODS:
                    return _quantize_stacked_llmint8_jit(tree)
                return _quantize_stacked_jit(tree, kind, block)
            return qfn(tree)
        return tree

    return walk(params)


def merge_moe_gate_up(params: Any, tp: int = 1) -> Any:
    """Concatenate MoE expert gate/up stacks into one [.., D, 2F] leaf so
    each MoE layer runs ONE grouped GEMM for gate+up (half the kernel
    dispatches and DMA chains; the reference's fused_moe w13 merge,
    chitu/models/model_deepseek_v3.py:1167-1288). Applies to 4-D expert
    stacks only; dense bf16 and fp8/int8 QTensors merge along the out dim
    (rowwise/blockwise scales concat the same way). W4A16 expert stacks
    stay separate (tile-relative nibble packing is not concat-safe)."""

    def mergeable(a, b, ndim=4):
        # QUANTIZED stacks only: merging measurably helps fp8 (fewer
        # dispatches over half the bytes) but REGRESSED the dense bf16
        # grouped GEMM ~40% at the 16x3.7B bench geometry (wider-N chunks
        # pipeline worse at bf16 byte rates), so dense stacks stay split
        if not (isinstance(a, QTensor) and isinstance(b, QTensor)):
            return False
        return (
            a.kind == b.kind
            and a.kind in (QuantKind.SOFT_FP8, QuantKind.FP8,
                           QuantKind.W8A16, QuantKind.W8A8)
            and a.data.ndim == ndim
            and a.in_perm is None and b.in_perm is None
            and a.oc_idx is None and b.oc_idx is None
            # blockwise scales concatenate on the block axis, which is
            # only exact when the gate's out dim fills its last block —
            # otherwise the up half's scale grid shifts silently
            and (
                a.scale.ndim < a.data.ndim  # rowwise: exact concat
                or a.data.shape[-1] % a.block == 0
            )
        )

    def cat(a, b):
        if isinstance(a, QTensor):
            return QTensor(
                data=jnp.concatenate([a.data, b.data], axis=-1),
                scale=jnp.concatenate([a.scale, b.scale], axis=-1),
                zeros=None,
                kind=a.kind,
                block=a.block,
            )
        return jnp.concatenate([a, b], axis=-1)

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        for key in list(tree.keys()):
            tree[key] = walk(tree[key])
        for gate, up, merged in (
            ("exp_gate", "exp_up", "exp_gu"),
            ("w_gate", "w_up", "w_gu"),
        ):
            if gate in tree and up in tree and mergeable(
                tree[gate], tree[up]
            ):
                tree[merged] = cat(tree.pop(gate), tree.pop(up))
        # 3-D quantized per-layer merges (r5, DeepSeek bs=1 dispatch
        # count): the shared expert's gate+up become one GEMM per layer,
        # and the two lora down-projections (wq_a + wkv_a, both fed by
        # the same attn_norm output) become one — ~26 fewer kernel
        # dispatches per step at the flagship depth
        # shared_gu is 'tp'-column-sharded: a plain [gate | up] concat
        # would split across shards at the wrong boundary, so it merges
        # on single-chip (tp == 1) layouts only — the bs=1 regime the
        # dispatch count matters for. wq_kv_a replicates over tp, so it
        # merges everywhere.
        pairs = [("wq_a", "wkv_a", "wq_kv_a")]
        if tp <= 1:
            pairs.append(("shared_gate", "shared_up", "shared_gu"))
        for a_key, b_key, merged in pairs:
            if a_key in tree and b_key in tree and mergeable(
                tree[a_key], tree[b_key], ndim=3
            ):
                tree[merged] = cat(tree.pop(a_key), tree.pop(b_key))
        return tree

    return walk(params)
