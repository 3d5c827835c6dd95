"""Shared model building blocks (pure JAX functions).

Capability parity with the reference's base model layer
(reference: chitu/models/model.py): RMSNorm, rotary embedding in all three
layouts (hf-llama half-split, llama interleaved, glm4 partial —
reference: chitu/ops.py:94-326), grouped-query attention, and paged-KV
append/gather helpers. Everything here is shape-static and jit-safe.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def psum_f32(x: jnp.ndarray, axis) -> jnp.ndarray:
    """bf16-safe psum for the manual-tp layer collectives: XLA CPU's
    AllReducePromotion pass crashes cloning a bf16 all-reduce ("Invalid
    binary instruction opcode copy"), and an f32 all-reduce needs no
    promotion and is exact for bf16 partial sums. No-op when `axis` is
    empty."""
    if not axis:
        return x
    if x.dtype == jnp.float32:
        return jax.lax.psum(x, axis)
    return jax.lax.psum(x.astype(jnp.float32), axis).astype(x.dtype)


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm with fp32 accumulation (reference: models/model.py:29-78)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Rotary embeddings
# ---------------------------------------------------------------------------


def rope_tables(
    head_rot_dim: int,
    max_seq_len: int,
    theta: float,
    rope_scaling=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [max_seq_len, rot_dim//2] in f32.

    Supports YaRN-style extension with correction range + mscale
    (reference: chitu/models/model_deepseek_v3.py:1353-1445).
    """
    half = head_rot_dim // 2
    freqs = 1.0 / (
        theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_rot_dim)
    )
    mscale = 1.0
    if rope_scaling is not None and rope_scaling.kind == "yarn":
        factor = rope_scaling.factor
        orig = rope_scaling.original_max_position
        if max_seq_len > orig and factor > 1.0:
            def find_dim(num_rot: float) -> float:
                # dimension whose wavelength reaches num_rot full rotations
                # over the original context
                return (
                    head_rot_dim
                    * math.log(orig / (num_rot * 2 * math.pi))
                    / (2 * math.log(theta))
                )

            low = max(math.floor(find_dim(rope_scaling.beta_fast)), 0)
            high = min(math.ceil(find_dim(rope_scaling.beta_slow)), half - 1)
            # linear ramp over [low, high]: rng=0 keeps the original
            # freqs (extrapolation), rng=1 divides by factor (full
            # interpolation) — smooth = 1 - rng blends between them
            rng = jnp.clip(
                (jnp.arange(half, dtype=jnp.float32) - low)
                / max(high - low, 1e-3),
                0.0,
                1.0,
            )
            smooth = 1.0 - rng
            freqs = freqs / factor * (1.0 - smooth) + freqs * smooth

            def get_mscale(scale: float, m: float) -> float:
                if scale <= 1.0 or m == 0.0:
                    return 1.0
                return 0.1 * m * math.log(scale) + 1.0

            mscale = get_mscale(factor, rope_scaling.mscale) / get_mscale(
                factor, rope_scaling.mscale_all_dim
            )
    elif rope_scaling is not None and rope_scaling.kind == "linear":
        freqs = freqs / rope_scaling.factor

    t = jnp.arange(max_seq_len, dtype=jnp.float32)
    ang = jnp.outer(t, freqs)
    return jnp.cos(ang) * mscale, jnp.sin(ang) * mscale


def apply_rope(
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    layout: str = "hf-llama",
) -> jnp.ndarray:
    """Rotate x: [..., T, H, D]. cos/sin: [T, R//2] where R = rotary dims.

    Layouts (reference: chitu/ops.py:94-326):
    - "hf-llama": half-split — pairs are (x[i], x[i + D/2])
    - "llama": interleaved — pairs are (x[2i], x[2i+1])
    - "glm4": partial (first half of D) + interleaved within that
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    d = x.shape[-1]
    r2 = cos.shape[-1]  # rotated half size
    cos_b = cos[..., :, None, :]  # [T, 1, R/2]
    sin_b = sin[..., :, None, :]

    if layout == "hf-llama":
        assert 2 * r2 == d
        x1, x2 = xf[..., :r2], xf[..., r2:]
        o1 = x1 * cos_b - x2 * sin_b
        o2 = x2 * cos_b + x1 * sin_b
        return jnp.concatenate([o1, o2], axis=-1).astype(dtype)

    if layout in ("llama", "glm4"):
        rot = 2 * r2
        xr, xp = xf[..., :rot], xf[..., rot:]
        x1 = xr[..., 0::2]
        x2 = xr[..., 1::2]
        o1 = x1 * cos_b - x2 * sin_b
        o2 = x2 * cos_b + x1 * sin_b
        out = jnp.stack([o1, o2], axis=-1).reshape(xr.shape)
        if xp.shape[-1]:
            out = jnp.concatenate([out, xp], axis=-1)
        return out.astype(dtype)

    raise ValueError(f"unknown rotary layout {layout!r}")


# ---------------------------------------------------------------------------
# Attention (XLA reference path — the correctness oracle; the Pallas flash
# kernels plug in behind the same contracts, reference: attn_backend.py:24-164)
# ---------------------------------------------------------------------------


def grouped_attention(
    q: jnp.ndarray,  # [T, H, Dh]
    k: jnp.ndarray,  # [S, KV, Dh]
    v: jnp.ndarray,  # [S, KV, Dv]
    mask: Optional[jnp.ndarray],  # [T, S] bool (True = attend) or None
    scale: Optional[float] = None,
    softcap: float = 0.0,
) -> jnp.ndarray:
    """GQA/MQA attention with f32 softmax. Returns [T, H, Dv]."""
    T, H, Dh = q.shape
    S, KV, _ = k.shape
    G = H // KV
    scale = scale if scale is not None else 1.0 / math.sqrt(Dh)
    qg = q.reshape(T, KV, G, Dh).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("tkgd,skd->kgts", qg, kf) * scale
    if softcap > 0.0:
        scores = jnp.tanh(scores / softcap) * softcap
    if mask is not None:
        scores = jnp.where(mask[None, None, :, :], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("kgts,skd->tkgd", p, v.astype(jnp.float32))
    return out.reshape(T, H, -1).astype(q.dtype)


# ---------------------------------------------------------------------------
# Paged KV helpers (XLA path; reference contract: cache_manager.py §2.2)
# ---------------------------------------------------------------------------


def paged_flat_index(
    block_table: jnp.ndarray, pos: jnp.ndarray, page_size: int
) -> jnp.ndarray:
    """Flattened pool index for absolute position(s) `pos`.

    block_table: [..., max_pages] int32; pos: [...] int32.
    Out-of-range positions map to an out-of-bounds index so that scatter
    with mode='drop' skips them.
    """
    page = pos // page_size
    off = pos % page_size
    mp = block_table.shape[-1]
    blk = jnp.take_along_axis(
        block_table,
        jnp.minimum(page, mp - 1)[..., None].astype(jnp.int32),
        axis=-1,
    )[..., 0]
    idx = blk * page_size + off
    # -1 table entries AND positions past the table width both map to the
    # drop sentinel (take_along_axis would otherwise clamp an overflow to
    # the LAST column and silently overwrite that page's live KV)
    oob = (blk < 0) | (page >= mp)
    return jnp.where(oob, jnp.iinfo(jnp.int32).max, idx)


def pad_kv_minor(kv_heads: int, head_dim: int, lane: int = 128) -> int:
    """Pool minor-dim size: KV*D padded up to a lane multiple so pages are
    contiguous 128-aligned rows (TPU DMA tiling requirement)."""
    c = max(kv_heads, 1) * head_dim
    return (c + lane - 1) // lane * lane


def kv_pool_minor(kv_heads: int, head_dim: int, lane: int = 128) -> int:
    """GQA pool minor: per-head interleaved [K_0 V_0 K_1 V_1 ...] blocks of
    width head_dim, padded to a lane multiple. The interleaving puts each
    KV head's K and V in one contiguous 2*D block, so sharding the minor
    dim over 'tp' gives every shard whole (K, V) head pairs — the
    TP-sharded cache the reference sizes per-rank
    (reference: backend.py:181-217 n_local_kv_heads)."""
    c = 2 * kv_heads * head_dim
    return (c + lane - 1) // lane * lane


def kv_encode(vals: jnp.ndarray, pool_dtype) -> jnp.ndarray:
    """Encode KV rows for the pool. int8 pools hold fp8-e4m3 BITS
    (infer.kv_dtype=fp8): halves KV bandwidth/footprint, int8 lanes keep
    the v5e storage path fast (same trick as soft-fp8 weights,
    reference: ops.py:395-449)."""
    if pool_dtype == jnp.int8:
        return jax.lax.bitcast_convert_type(
            vals.astype(jnp.float8_e4m3fn), jnp.int8
        )
    return vals.astype(pool_dtype)


def kv_decode(x: jnp.ndarray, out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Inverse of kv_encode (int8 bits -> e4m3 value -> out_dtype)."""
    if x.dtype == jnp.int8:
        return jax.lax.bitcast_convert_type(
            x, jnp.float8_e4m3fn
        ).astype(out_dtype)
    return x if x.dtype == out_dtype else x.astype(out_dtype)


def paged_append(
    pool: jnp.ndarray,  # [L, num_pages, page, C] (the WHOLE stacked pool)
    layer: jnp.ndarray,  # scalar i32
    values: jnp.ndarray,  # [N, KV, D] (or [N, C_valid])
    flat_idx: jnp.ndarray,  # [N] int32 within one layer (OOB = drop)
) -> jnp.ndarray:
    """Scatter one layer's new rows into the full pool.

    The pool travels whole through the layer scan (carry) and is indexed
    here — slicing a per-layer pool in/out of the scan materializes slice
    copies that scale with pool size (measured 36% decode regression at
    3x pool)."""
    L, P, page, C = pool.shape
    N = values.shape[0]
    vals = values.reshape(N, -1)
    if vals.shape[-1] < C:
        vals = jnp.pad(vals, ((0, 0), (0, C - vals.shape[-1])))
    oob = jnp.iinfo(jnp.int32).max
    idx = jnp.where(
        flat_idx >= P * page, oob, layer.astype(jnp.int32) * (P * page) + flat_idx
    )
    flat = pool.reshape(L * P * page, C)
    flat = flat.at[idx].set(kv_encode(vals, pool.dtype), mode="drop")
    return flat.reshape(L, P, page, C)
