"""Quantized weight tensors as pytree leaves.

The reference rewrites torch module trees to install quantized Linear modules
(reference: chitu/quantize/quantizer.py:14-187). The TPU-native design keeps
models as pure functions over parameter pytrees, so quantization becomes a
*parameter transform*: a bf16 weight leaf is replaced by a `QTensor` carrying
the packed data + scales (+ zeros), and `chitu_tpu.ops.linear` dispatches on
the leaf type. This covers the reference's whole ladder
(SURVEY.md §2.6): soft-fp8 / true FP8 blockwise / W8A16 / W4A16 (AWQ, GPTQ)
/ W8A8 — each `QuantKind` maps onto one fused dequant+matmul kernel.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


class QuantKind(str, enum.Enum):
    # weight-only fp8 (e4m3) with [in/128, out/128] blockwise scales, dequant
    # inside the GEMM k-loop ("soft fp8"; reference: ops.py:395-449,
    # triton_kernels.py:250-287)
    SOFT_FP8 = "soft_fp8"
    # true fp8: fp8 weights + fp8 activations, blockwise scales
    # (reference: ops.py:452-474)
    FP8 = "fp8"
    # int8 weight-only, per-out-channel scales (reference: quantize/w8a16.py)
    W8A16 = "w8a16"
    # int8 weight + dynamic per-token int8 activations, per-channel scales
    # (reference: quantize/w8a8.py)
    W8A8 = "w8a8"
    # 4-bit weight-only, group-128 scales+zeros (AWQ / GPTQ;
    # reference: chitu/awq/qmodule.py:123-278)
    W4A16 = "w4a16"


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """A quantized weight: packed data + scales (+ zeros).

    Logical layout is always [in_features, out_features] to match
    ``x @ w``; `data` holds the packed storage:

    - SOFT_FP8 / FP8: data [in, out] float8_e4m3fn, scale
      [ceil(in/B), ceil(out/B)] f32 (B = block, 128)
    - W8A16 / W8A8: data [in, out] int8, scale [out] f32
    - W4A16: data [in, out] int8 holding one nibble value each (packing to
      2/byte is a storage optimization applied at load), scale [in/G, out]
      f32, zeros [in/G, out] f32 (G = group, 128)
    """

    data: jnp.ndarray
    scale: jnp.ndarray
    zeros: Optional[jnp.ndarray] = None
    kind: QuantKind = QuantKind.SOFT_FP8
    block: int = 128
    # input-dim permutation for act-order (desc_act) GPTQ checkpoints:
    # data rows are stored group-sorted (so scale/zeros keep the standard
    # contiguous [in/G, out] layout) and `x` is gathered by in_perm before
    # the GEMM — y = x[:, in_perm] @ data is exact (reference: AutoGPTQ
    # QuantLinear g_idx handling, chitu/quantize/quantizer.py:53-85)
    in_perm: Optional[jnp.ndarray] = None
    # LLM.int8-style outlier decomposition (reference: bitsandbytes
    # Linear8bitLt via chitu/quantize/quantizer.py:14-50): the rows at
    # oc_idx are kept dense in oc_w and ZEROED in the int8 data, so
    # y = int8_gemm(x) + x[:, oc_idx] @ oc_w
    oc_idx: Optional[jnp.ndarray] = None  # [(L,) K_o] int32
    oc_w: Optional[jnp.ndarray] = None  # [(L,) K_o, N] bf16

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.data.shape

    @property
    def in_features(self) -> int:
        return self.data.shape[-2]

    @property
    def out_features(self) -> int:
        return self.data.shape[-1]

    def tree_flatten(self):
        children = (
            self.data, self.scale, self.zeros, self.in_perm,
            self.oc_idx, self.oc_w,
        )
        aux = (self.kind, self.block)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, scale, zeros, in_perm, oc_idx, oc_w = children
        kind, block = aux
        return cls(
            data=data, scale=scale, zeros=zeros, kind=kind, block=block,
            in_perm=in_perm, oc_idx=oc_idx, oc_w=oc_w,
        )

    def __getitem__(self, idx) -> "QTensor":
        """Slice the leading (stacked-layer / expert) dim."""
        sub = lambda v: v[idx] if v is not None else None
        return QTensor(
            data=self.data[idx],
            scale=self.scale[idx],
            zeros=sub(self.zeros),
            kind=self.kind,
            block=self.block,
            in_perm=sub(self.in_perm),
            oc_idx=sub(self.oc_idx),
            oc_w=sub(self.oc_w),
        )

    def astype(self, dtype):  # keep jnp-tree utilities happy
        return self

    def dequantize(self, dtype=jnp.bfloat16) -> jnp.ndarray:
        """Reference (XLA) dequantization to a dense weight."""
        if self.oc_idx is not None:
            base = QTensor(
                data=self.data, scale=self.scale, zeros=self.zeros,
                kind=self.kind, block=self.block, in_perm=self.in_perm,
            ).dequantize(dtype)
            # scatter the dense outlier rows back (their int8 rows are 0)
            if self.oc_idx.ndim == 1:
                return base.at[..., self.oc_idx, :].add(
                    self.oc_w.astype(dtype)
                )
            out = base
            for l in range(self.oc_idx.shape[0]):
                out = out.at[l, self.oc_idx[l], :].add(
                    self.oc_w[l].astype(dtype)
                )
            return out
        if self.in_perm is not None:
            # rows are stored group-sorted; un-sort back to original order
            base = QTensor(
                data=self.data, scale=self.scale, zeros=self.zeros,
                kind=self.kind, block=self.block,
            ).dequantize(dtype)
            inv = jnp.argsort(self.in_perm, axis=-1)
            return jnp.take_along_axis(base, inv[..., None], axis=-2)
        d = self.data
        if self.kind in (QuantKind.SOFT_FP8, QuantKind.FP8):
            # storage is fp8 bytes, or int8 lanes after
            # quantize.requantize_fp8_storage (v5e fast path)
            w = d.astype(jnp.float32)
            bi, bo = self.block, self.block
            if self.scale.shape[-1] == d.shape[-1]:
                # rowwise pre-expanded scales [in/B, out]
                s = jnp.repeat(self.scale, bi, axis=-2)[..., : d.shape[-2], :]
            else:
                # blockwise [in/B, out/B] -> [in, out]
                s = jnp.repeat(
                    jnp.repeat(self.scale, bi, axis=-2)[..., : d.shape[-2], :],
                    bo,
                    axis=-1,
                )[..., : d.shape[-1]]
            return (w * s).astype(dtype)
        if self.kind in (QuantKind.W8A16, QuantKind.W8A8):
            return (d.astype(jnp.float32) * self.scale[..., None, :]).astype(dtype)
        if self.kind == QuantKind.W4A16:
            if self.scale.shape[-1] == d.shape[-1] * 2:
                from chitu_tpu.quantize.transforms import unpack_int4_storage

                return unpack_int4_storage(self).dequantize(dtype)
            g = self.block
            w = d.astype(jnp.float32)
            scale = jnp.repeat(self.scale, g, axis=-2)[..., : d.shape[-2], :]
            zeros = jnp.repeat(self.zeros, g, axis=-2)[..., : d.shape[-2], :]
            return ((w - zeros) * scale).astype(dtype)
        raise ValueError(f"unknown quant kind {self.kind}")
