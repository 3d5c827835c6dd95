"""Linear projection dispatch over weight leaf types.

The single entry point every model layer uses. Dispatches on the weight
type: dense jnp array -> plain matmul (XLA puts it on the MXU); `QTensor`
-> fused dequant+matmul, using the Pallas kernels when enabled or an XLA
dequant-then-matmul fallback (the reference's equivalent dispatch is
`linear_deepseek_v3`, chitu/models/model_deepseek_v3.py:53-106, plus the
per-scheme quantized Linear modules of chitu/quantize/*).
"""

from __future__ import annotations

import os
from typing import Optional, Union

import jax
import jax.numpy as jnp

from chitu_tpu.ops.qtensor import QTensor

# op_impl switch (reference keeps an op_impl config for portability,
# chitu/config/serve_config.yaml:15). "pallas" uses hand-written kernels for
# the hot quantized GEMMs; "xla" is the pure-XLA fallback that works on any
# backend (including CPU tests).
_OP_IMPL = os.environ.get("CHITU_TPU_OP_IMPL", "auto")
# A/B switch: route dense stacked-layer weights through the Pallas dense
# GEMM (kernel-side layer indexing) instead of XLA's matmul
_DENSE_KERNEL = os.environ.get("CHITU_TPU_DENSE_KERNEL", "0") == "1"
# fp8 activation mode for QuantKind.FP8 (quant.fp8_act): "int8" = dynamic
# per-token int8 (the v5e speed path), "e4m3" = TRUE fp8 rounding of the
# activations (reference act_quant accuracy semantics, chitu/ops.py:329-353)
_FP8_ACT = os.environ.get("CHITU_TPU_FP8_ACT", "int8")
if _FP8_ACT not in ("int8", "e4m3"):  # a typo must not silently pick int8
    raise ValueError(
        f"CHITU_TPU_FP8_ACT={_FP8_ACT!r}: expected 'int8' or 'e4m3'"
    )


def set_fp8_act(mode: str):
    global _FP8_ACT
    assert mode in ("int8", "e4m3")
    _FP8_ACT = mode


def maybe_fp8_act(x, w):
    """Apply the TRUE-fp8 activation rounding for QuantKind.FP8 weights
    when quant.fp8_act='e4m3' — shared by linear() and the MoE grouped
    GEMM path (models/moe.py), which bypasses linear()."""
    from chitu_tpu.ops.qtensor import QTensor, QuantKind

    if (
        _FP8_ACT == "e4m3"
        and isinstance(w, QTensor)
        and w.kind == QuantKind.FP8
    ):
        from chitu_tpu.quantize.transforms import fp8_act_roundtrip

        return fp8_act_roundtrip(x)
    return x


def get_fp8_act() -> str:
    return _FP8_ACT


def set_op_impl(impl: str):
    global _OP_IMPL
    assert impl in ("auto", "pallas", "xla")
    _OP_IMPL = impl


def get_op_impl() -> str:
    if _OP_IMPL != "auto":
        return _OP_IMPL
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def linear(
    x: jnp.ndarray,
    w: Union[jnp.ndarray, QTensor],
    bias: Optional[jnp.ndarray] = None,
    out_dtype=None,
    layer=None,
) -> jnp.ndarray:
    """y = x @ w (+ bias). x: [..., in], w: [in, out] (dense or quantized).

    With `layer` given and a stacked [L, in, out] QTensor, the kernel
    indexes the layer in-place (no per-layer weight slice copies in the
    layer scan)."""
    from chitu_tpu.ops.pallas_norm_quant import QuantizedActs

    if isinstance(x, QuantizedActs):
        out_dtype = out_dtype or jnp.bfloat16
        if isinstance(w, QTensor):
            y = _quantized_matmul(x, w, layer)
        else:
            # dense weight: reconstruct bf16 activations
            xd = (x.data.astype(jnp.float32) * x.scale[:, None]).astype(
                jnp.bfloat16
            )
            if layer is not None and w.ndim == 3:
                w = w[layer]
            y = jnp.dot(
                xd, w.astype(xd.dtype), preferred_element_type=jnp.float32
            )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y.astype(out_dtype)
    out_dtype = out_dtype or x.dtype
    if isinstance(w, QTensor):
        y = _quantized_matmul(x, w, layer)
    else:
        if layer is not None and w.ndim == 3:
            if _DENSE_KERNEL and get_op_impl() == "pallas":
                from chitu_tpu.ops.pallas_quant_gemm import (
                    dense_matmul_stacked,
                )

                y = dense_matmul_stacked(
                    x.reshape(-1, x.shape[-1]), layer, w,
                    interpret=jax.default_backend() != "tpu",
                ).reshape(*x.shape[:-1], w.shape[-1])
                if bias is not None:
                    y = y + bias.astype(y.dtype)
                return y.astype(out_dtype)
            w = w[layer]
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(out_dtype)


def _quantized_matmul(x, w: QTensor, layer=None) -> jnp.ndarray:
    from chitu_tpu.ops.pallas_norm_quant import QuantizedActs

    extra = None
    if w.oc_idx is not None:
        # LLM.int8 outlier decomposition: dense bf16 GEMM over the few
        # outlier input channels (their int8 rows are zero)
        idx = w.oc_idx[layer] if w.oc_idx.ndim == 2 and layer is not None else w.oc_idx
        ocw = w.oc_w[layer] if w.oc_w.ndim == 3 and layer is not None else w.oc_w
        if isinstance(x, QuantizedActs):
            xo = (
                jnp.take(x.data, idx, axis=-1).astype(jnp.float32)
                * x.scale[:, None]
            ).astype(jnp.bfloat16)
        else:
            xo = jnp.take(x, idx, axis=-1)
        # f32 operands: the outlier slab is tiny and the CPU backend
        # lacks a BF16xBF16->F32 dot thunk
        extra = jnp.dot(
            xo.astype(jnp.float32), ocw.astype(jnp.float32)
        )
        w = QTensor(
            data=w.data, scale=w.scale, zeros=w.zeros, kind=w.kind,
            block=w.block, in_perm=w.in_perm,
        )
        return _quantized_matmul(x, w, layer) + extra
    if isinstance(x, QuantizedActs):
        from chitu_tpu.ops import pallas_quant_gemm  # registers kernels
        from chitu_tpu.ops import quant_gemm

        if layer is not None and w.data.ndim == 3:
            w = w[layer]
        return quant_gemm.PALLAS_GEMMS[w.kind](x, w)
    from chitu_tpu.ops.qtensor import QuantKind as _QK

    if w.kind == _QK.FP8 and _FP8_ACT == "e4m3":
        from chitu_tpu.quantize.transforms import fp8_act_roundtrip

        x = fp8_act_roundtrip(x)
    if w.in_perm is not None:
        # act-order (desc_act) GPTQ: rows are group-sorted in storage;
        # gather x to match (exact — y = x[:, perm] @ w_sorted)
        perm = w.in_perm[layer] if w.in_perm.ndim == 2 and layer is not None else w.in_perm
        x = jnp.take(x, perm, axis=-1)
        w = QTensor(
            data=w.data, scale=w.scale, zeros=w.zeros, kind=w.kind,
            block=w.block,
        )
    impl = get_op_impl()
    if impl == "pallas":
        from chitu_tpu.ops import pallas_quant_gemm  # registers kernels
        from chitu_tpu.ops import quant_gemm
        from chitu_tpu.ops.qtensor import QuantKind

        if (
            layer is not None
            and w.data.ndim == 3
            and w.kind
            in (QuantKind.SOFT_FP8, QuantKind.FP8, QuantKind.W4A16)
            # the stacked kernel's scale indexing assumes QBLK groups;
            # other group sizes (e.g. group-64 GPTQ) take the XLA
            # dequant fallback below, same as the non-stacked _wrap guard
            and (
                w.kind != QuantKind.W4A16
                or w.block == pallas_quant_gemm.QBLK
            )
            # the stacked kernel tiles N in 128-lane multiples; odd
            # output widths (MLA's wkv_a: kv_lora_rank+rope = 576) take
            # the XLA dequant fallback below (tiny leaves — wkv_a is
            # <0.5% of per-step bytes at DeepSeek geometry)
            and w.scale.shape[-1] % 128 == 0
        ):
            return pallas_quant_gemm.matmul_stacked(x, w, layer)
        fn = quant_gemm.PALLAS_GEMMS.get(w.kind)
        if fn is not None:
            if layer is not None and w.data.ndim == 3:
                w = w[layer]
            return fn(x, w)
    # XLA fallback: dequantize then dense matmul. XLA fuses the dequant into
    # the matmul read where profitable; the Pallas path guarantees it.
    if layer is not None and w.data.ndim == 3:
        w = w[layer]
    wd = w.dequantize(jnp.bfloat16)
    return jnp.dot(
        x, wd.astype(x.dtype), preferred_element_type=jnp.float32
    )
