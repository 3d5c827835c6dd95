"""Pallas fused dequant+matmul kernels (registry).

Filled in by chitu_tpu.ops.pallas_quant_gemm at import time when running on
TPU; maps QuantKind -> fn(x, qtensor) -> y. Kernel contracts follow the
reference's Triton GEMMs (soft-fp8: chitu/triton_kernels.py:368-508; fp8
blockwise: triton_kernels.py:290-365; w8a16/w8a8/w4a16: SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Callable, Dict

from chitu_tpu.ops.qtensor import QuantKind

PALLAS_GEMMS: Dict[QuantKind, Callable] = {}


def register(kind: QuantKind):
    def deco(fn):
        PALLAS_GEMMS[kind] = fn
        return fn

    return deco
