"""Pallas dequant-GEMM kernels vs QTensor.dequantize + jnp.dot
(reference contract: chitu/triton_kernels.py soft-fp8/fp8 GEMMs,
quantize/w8a16, awq W4A16)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chitu_tpu.ops import pallas_quant_gemm as pqg
from chitu_tpu.ops.qtensor import QuantKind
from chitu_tpu.quantize import quantize_weight


@pytest.mark.parametrize(
    "kind", [QuantKind.SOFT_FP8, QuantKind.W8A16, QuantKind.W4A16]
)
@pytest.mark.parametrize("T,K,N", [(16, 256, 384), (100, 300, 200), (1, 128, 128)])
def test_gemm_matches_dequant(kind, T, K, N):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = (jax.random.normal(kx, (T, K)) * 0.5).astype(jnp.bfloat16)
    w = jax.random.normal(kw, (K, N)) * 0.05
    q = quantize_weight(w, kind)

    want = jnp.dot(
        x, q.dequantize(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    got = pqg._matmul_impl(x, q, interpret=jax.default_backend() != "tpu")
    rel = float(
        jnp.linalg.norm(got - want)
        / jnp.maximum(jnp.linalg.norm(want), 1e-6)
    )
    assert rel < 2e-2, f"{kind} T={T} rel={rel}"


def test_linear_dispatch_uses_kernel():
    from chitu_tpu.ops.linear import linear, set_op_impl

    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = (jax.random.normal(kx, (8, 256)) * 0.5).astype(jnp.bfloat16)
    w = jax.random.normal(kw, (256, 128)) * 0.05
    q = quantize_weight(w, QuantKind.SOFT_FP8)
    try:
        set_op_impl("pallas")
        y_pallas = linear(x, q, out_dtype=jnp.float32)
    finally:
        set_op_impl("auto")
    y_ref = jnp.dot(x.astype(jnp.float32), w)
    rel = float(
        jnp.linalg.norm(y_pallas - y_ref)
        / jnp.maximum(jnp.linalg.norm(y_ref), 1e-6)
    )
    assert rel < 0.1


def test_w8a8_dynamic_activation_path():
    """int8 x int8 MXU GEMM with per-token act scales
    (reference: quantize/w8a8.py)."""
    from chitu_tpu.ops.pallas_quant_gemm import _w8a8_matmul

    kx, kw = jax.random.split(jax.random.PRNGKey(4))
    x = (jax.random.normal(kx, (12, 256)) * 0.5).astype(jnp.bfloat16)
    w = jax.random.normal(kw, (256, 192)) * 0.05
    q = quantize_weight(w, QuantKind.W8A8)
    got = _w8a8_matmul(x, q, interpret=jax.default_backend() != "tpu")
    want = jnp.dot(x.astype(jnp.float32), w)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 3e-2, rel


def test_stacked_layer_gemm_matches_sliced():
    """matmul_stacked(q, layer) == sliced-GEMM on every layer
    (kernel-side layer indexing; interpret mode on CPU)."""
    from chitu_tpu.ops.pallas_quant_gemm import _matmul_impl, matmul_stacked
    from chitu_tpu.quantize import requantize_fp8_storage

    L, K, N = 3, 256, 512
    w = jax.random.normal(jax.random.PRNGKey(5), (L, K, N)) * 0.05
    q = quantize_weight(w, QuantKind.SOFT_FP8)
    q = requantize_fp8_storage({"w": q})["w"]  # int8 lanes + rowwise scales
    x = (jax.random.normal(jax.random.PRNGKey(6), (8, K)) * 0.5).astype(
        jnp.bfloat16
    )
    interp = jax.default_backend() != "tpu"
    for l in range(L):
        want = _matmul_impl(x, q[l], interpret=interp)
        got = matmul_stacked(x, q, jnp.int32(l), interpret=interp)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
        )


def test_stacked_layer_gemm_w4a16_packed():
    from chitu_tpu.ops.pallas_quant_gemm import _matmul_impl, matmul_stacked
    from chitu_tpu.quantize import pack_int4_storage

    L, K, N = 2, 256, 1024
    w = jax.random.normal(jax.random.PRNGKey(7), (L, K, N)) * 0.05
    q = quantize_weight(w, QuantKind.W4A16)
    # stacked packing path: pack each layer then restack
    from chitu_tpu.ops.qtensor import QTensor
    packed_layers = [
        pack_int4_storage({"w": q[l]})["w"] for l in range(L)
    ]
    qp = QTensor(
        data=jnp.stack([p.data for p in packed_layers]),
        scale=jnp.stack([p.scale for p in packed_layers]),
        zeros=jnp.stack([p.zeros for p in packed_layers]),
        kind=QuantKind.W4A16,
        block=q.block,
    )
    x = (jax.random.normal(jax.random.PRNGKey(8), (4, K)) * 0.5).astype(
        jnp.bfloat16
    )
    interp = jax.default_backend() != "tpu"
    for l in range(L):
        want = _matmul_impl(x, q[l], interpret=interp)
        got = matmul_stacked(x, qp, jnp.int32(l), interpret=interp)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
        )
