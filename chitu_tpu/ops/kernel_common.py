"""Shared in-kernel numeric helpers for the Pallas kernels."""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def fp8_place_bits(raw: jnp.ndarray) -> jnp.ndarray:
    """e4m3 BYTES (int8 lanes) -> f32 by bit placement: sign to bit 31,
    exp+mantissa to bits 20..26 (the reference's 0x7b800000 soft-fp8
    trick, chitu/triton_kernels.py:250-287, done with VPU integer ops
    instead of the slow fp8 cast path).

    The result is the e4m3 value scaled by 2^-120: callers either
    multiply by 2.0**120 (KV-cache dequant, ops/pallas_attention._pool_f32)
    or fold the re-bias into their quant scales (the GEMM kernels)."""
    u = raw.astype(jnp.int32) & 0xFF
    bits = ((u & 0x80) << 24) | ((u & 0x7F) << 20)
    return pltpu.bitcast(bits, jnp.float32)
