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
) -> jnp.ndarray:
    """y = x @ w (+ bias). x: [..., in], w: [in, out] (dense or quantized)."""
    out_dtype = out_dtype or x.dtype
    if isinstance(w, QTensor):
        y = _quantized_matmul(x, w)
    else:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(out_dtype)


def _quantized_matmul(x: jnp.ndarray, w: QTensor) -> jnp.ndarray:
    impl = get_op_impl()
    if impl == "pallas":
        from chitu_tpu.ops import pallas_quant_gemm  # registers kernels
        from chitu_tpu.ops import quant_gemm

        fn = quant_gemm.PALLAS_GEMMS.get(w.kind)
        if fn is not None:
            return fn(x, w)
    # XLA fallback: dequantize then dense matmul. XLA fuses the dequant into
    # the matmul read where profitable; the Pallas path guarantees it.
    wd = w.dequantize(jnp.bfloat16)
    return jnp.dot(
        x, wd.astype(x.dtype), preferred_element_type=jnp.float32
    )
