"""AWQ / GPTQ packed-checkpoint unpacking -> W4A16 QTensors.

Capability parity with the reference's offline-quantized checkpoint paths
(reference: chitu/awq/qmodule.py:123-278 WQLinear int-packed 4-bit
weights with group-128 scaled zeros, and the AutoGPTQ QuantLinear load
path backend.py:334-347). Both formats unpack to the same logical
`QTensor(W4A16)` layout — data [in, out] int8 nibble values,
scale/zeros [in/G, out] — consumed by the fused dequant-GEMM
(ops/pallas_quant_gemm.py), which mirrors how the reference maps GPTQ
onto the same W4 kernels (SURVEY.md §2.6).

Packing conventions:
- AWQ: qweight int32 [in, out/8], 8 nibbles per word in interleaved
  order (0,2,4,6,1,3,5,7); qzeros int32 [in/G, out/8] same order;
  scales fp16 [in/G, out].
- GPTQ: qweight int32 [in/8, out], 8 nibbles per word packed along the
  *in* dim sequentially; qzeros int32 [in/G, out/8] sequential;
  scales fp16 [in/G, out]. GPTQ checkpoints store zero-1 (the +1 quirk),
  handled by `gptq_zero_plus_one`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from chitu_tpu.ops.qtensor import QTensor, QuantKind

AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def _unpack_nibbles_lastdim(q: np.ndarray, order: np.ndarray) -> np.ndarray:
    """int32 [..., N/8] -> int8 [..., N] per `order` within each word."""
    q = q.astype(np.uint32)
    shifts = (order * 4).astype(np.uint32)
    out = (q[..., :, None] >> shifts[None, :]) & 0xF  # [..., N/8, 8]
    return out.reshape(*q.shape[:-1], q.shape[-1] * 8).astype(np.int8)


def _unpack_nibbles_firstdim(q: np.ndarray) -> np.ndarray:
    """int32 [in/8, out] -> int8 [in, out], sequential along in."""
    q = q.astype(np.uint32)
    shifts = (np.arange(8) * 4).astype(np.uint32)
    out = (q[:, None, :] >> shifts[None, :, None]) & 0xF  # [in/8, 8, out]
    return out.reshape(q.shape[0] * 8, q.shape[1]).astype(np.int8)


def unpack_awq(
    qweight: np.ndarray,  # int32 [in, out/8]
    qzeros: np.ndarray,  # int32 [in/G, out/8]
    scales: np.ndarray,  # fp16/fp32 [in/G, out]
    group_size: int = 128,
) -> QTensor:
    data = _unpack_nibbles_lastdim(qweight, AWQ_ORDER)  # [in, out]
    zeros = _unpack_nibbles_lastdim(qzeros, AWQ_ORDER)  # [in/G, out]
    return QTensor(
        data=jnp.asarray(data),
        scale=jnp.asarray(scales, jnp.float32),
        zeros=jnp.asarray(zeros, jnp.float32),
        kind=QuantKind.W4A16,
        block=group_size,
    )


def unpack_gptq(
    qweight: np.ndarray,  # int32 [in/8, out]
    qzeros: np.ndarray,  # int32 [in/G, out/8]
    scales: np.ndarray,  # fp16/fp32 [in/G, out]
    group_size: int = 128,
    gptq_zero_plus_one: bool = True,
    g_idx: np.ndarray = None,  # int32 [in]: group of each input row
) -> QTensor:
    """GPTQ unpack. `g_idx` (desc_act / act-order checkpoints) maps each
    input row to its quantization group; when it encodes a non-identity
    assignment the rows are stably sorted by group so scale/zeros keep the
    contiguous [in/G, out] layout, and the sort permutation is stored as
    QTensor.in_perm (applied to activations at matmul time — exact).
    Reference honors g_idx via AutoGPTQ QuantLinear
    (chitu/quantize/quantizer.py:53-85)."""
    data = _unpack_nibbles_firstdim(qweight)  # [in, out]
    order = np.arange(8)
    zeros = _unpack_nibbles_lastdim(qzeros, order).astype(np.float32)
    if gptq_zero_plus_one:
        zeros = zeros + 1.0
    in_perm = None
    if g_idx is not None:
        g_idx = np.asarray(g_idx, np.int64)
        identity = np.arange(data.shape[0]) // group_size
        if not np.array_equal(g_idx, identity):
            counts = np.bincount(g_idx, minlength=scales.shape[0])
            if np.any(counts != group_size):
                raise ValueError(
                    "GPTQ g_idx groups are not uniformly sized "
                    f"(expected {group_size} rows/group, got {sorted(set(counts))})"
                )
            perm = np.argsort(g_idx, kind="stable")
            data = data[perm]
            in_perm = jnp.asarray(perm, jnp.int32)
    return QTensor(
        data=jnp.asarray(data),
        scale=jnp.asarray(scales, jnp.float32),
        zeros=jnp.asarray(zeros),
        kind=QuantKind.W4A16,
        block=group_size,
        in_perm=in_perm,
    )


def pack_awq(q: QTensor) -> dict:
    """Inverse of unpack_awq (used by tests / preprocess-and-save)."""
    data = np.asarray(q.data, np.uint32)  # [in, out]
    # zero-points must land on the uint4 grid: quantize_weight emits
    # integer zeros, but round+clip defensively — a float/negative zero
    # cast straight to uint32 would silently wrap before the & 0xF
    zeros = np.clip(np.round(np.asarray(q.zeros, np.float32)), 0, 15)
    zeros = zeros.astype(np.uint32)
    inv = np.empty_like(AWQ_ORDER)
    inv[AWQ_ORDER] = np.arange(8)

    def pack_last(a):
        a = a.reshape(*a.shape[:-1], a.shape[-1] // 8, 8)
        word = np.zeros(a.shape[:-1], np.uint32)
        for j in range(8):
            word |= (a[..., j] & 0xF) << np.uint32(AWQ_ORDER[j] * 4)
        return word.astype(np.int32)

    return {
        "qweight": pack_last(data),
        "qzeros": pack_last(zeros),
        "scales": np.asarray(q.scale, np.float16),
    }
