"""Fused RMSNorm + per-token int8 activation quantization.

Capability parity with the reference's muxi fused norm+quant kernel
(reference: chitu/quantize/muxi_w8a8.py:15-36 NormAndQuant replacing
RMSNorm, :128-147 passing (int8, scale) tuples between layers): the W8A8
path's activations are normalized and quantized in ONE pass over the
activations, so the bf16 intermediate never round-trips HBM and the int8
GEMM receives (values, per-token scales) directly.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantizedActs:
    """Per-token symmetric int8 activations: values + scales."""

    data: jnp.ndarray  # [T, D] int8
    scale: jnp.ndarray  # [T] f32

    def tree_flatten(self):
        return (self.data, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.data.shape


def _norm_quant_kernel(x_ref, w_ref, xq_ref, s_ref, *, eps: float):
    xf = x_ref[...].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps) * w_ref[...].astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True), 1e-8)
    s = amax / 127.0
    xq_ref[...] = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    s_ref[...] = s


def _quant_kernel(x_ref, xq_ref, s_ref):
    xf = x_ref[...].astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8)
    s = amax / 127.0
    xq_ref[...] = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    s_ref[...] = s


BT = 32  # int8 sublane tile


def _pad_rows(x, m):
    pad = (-x.shape[0]) % m
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def rms_norm_quant(
    x: jnp.ndarray,  # [T, D]
    w: jnp.ndarray,  # [D]
    eps: float,
    interpret: bool = False,
) -> QuantizedActs:
    """Fused rmsnorm(x) * w -> per-token int8 (values, scales)."""
    T, D = x.shape
    xp = _pad_rows(x, BT)
    Tp = xp.shape[0]
    xq, s = pl.pallas_call(
        functools.partial(_norm_quant_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, D), jnp.int8),
            jax.ShapeDtypeStruct((Tp, 1), jnp.float32),
        ),
        grid=(Tp // BT,),
        in_specs=[
            pl.BlockSpec((BT, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BT, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xp, w.reshape(1, D))
    return QuantizedActs(data=xq[:T], scale=s[:T, 0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_acts(
    x: jnp.ndarray, interpret: bool = False
) -> QuantizedActs:
    """Per-token int8 quantization (no norm — mid-FFN activations)."""
    T, D = x.shape
    xp = _pad_rows(x, BT)
    Tp = xp.shape[0]
    xq, s = pl.pallas_call(
        _quant_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Tp, D), jnp.int8),
            jax.ShapeDtypeStruct((Tp, 1), jnp.float32),
        ),
        grid=(Tp // BT,),
        in_specs=[
            pl.BlockSpec((BT, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BT, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xp)
    return QuantizedActs(data=xq[:T], scale=s[:T, 0])
