"""Attention backend layer.

Capability parity with the reference's `AttnBackend` ABC
(reference: chitu/attn_backend.py:24-164): one protocol with ragged/chunked
prefill and fused append+decode over a paged KV cache, served by two
implementations selected by `op_impl`:

- "xla": pure-jnp oracle (the RefAttnBackend equivalent,
  reference: attn_backend.py:246-501) — append via scatter, gather pages,
  masked grouped attention. Runs on any backend; used by CPU tests.
- "pallas": flash kernels reading pages directly from HBM
  (ops/pallas_attention.py), the FlashAttn/FlashMLA/Triton-decode
  equivalents (reference: attn_backend.py:167-243,504-572,687-774).

Contract notes: causal alignment is bottom-right (query token i in a chunk
starting at absolute position p attends to absolute positions <= p+i),
matching flash-attn semantics the reference documents
(attn_backend.py:88-101).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from chitu_tpu.models.common import (
    NEG_INF,
    grouped_attention,
    paged_append,
    paged_flat_index,
    paged_gather,
)


def append_prefill(
    k_pool: jnp.ndarray,  # [P, page, KV, D]
    v_pool: Optional[jnp.ndarray],
    k: jnp.ndarray,  # [T, KV, D]
    v: Optional[jnp.ndarray],
    block_table: jnp.ndarray,  # [mp] int32
    q_pos: jnp.ndarray,  # [T] absolute positions (pad rows -> OOB dropped)
    valid_len: jnp.ndarray,  # scalar: number of valid rows in this chunk
    page_size: int,
):
    """Write a prefill chunk's K/V into the pools."""
    T = k.shape[0]
    pos = jnp.where(jnp.arange(T) < valid_len, q_pos, -1)
    bt = jnp.broadcast_to(block_table, (T, block_table.shape[0]))
    flat = paged_flat_index(bt, jnp.maximum(pos, 0), page_size)
    flat = jnp.where(pos >= 0, flat, jnp.iinfo(jnp.int32).max)
    k_pool = paged_append(k_pool, k, flat)
    if v_pool is not None:
        v_pool = paged_append(v_pool, v, flat)
    return k_pool, v_pool


def append_decode(
    k_pool: jnp.ndarray,
    v_pool: Optional[jnp.ndarray],
    k: jnp.ndarray,  # [B, KV, D]
    v: Optional[jnp.ndarray],
    block_tables: jnp.ndarray,  # [B, mp]
    seq_lens: jnp.ndarray,  # [B] context length (new token's position)
    valid: jnp.ndarray,  # [B] bool — padded batch rows are dropped
    page_size: int,
):
    flat = paged_flat_index(block_tables, seq_lens, page_size)
    flat = jnp.where(valid, flat, jnp.iinfo(jnp.int32).max)
    k_pool = paged_append(k_pool, k, flat)
    if v_pool is not None:
        v_pool = paged_append(v_pool, v, flat)
    return k_pool, v_pool


def attend_prefill(
    q: jnp.ndarray,  # [T, H, D]
    k_pool: jnp.ndarray,  # [P, page, KV, D]
    v_pool: jnp.ndarray,
    block_table: jnp.ndarray,  # [mp]
    q_pos: jnp.ndarray,  # [T] absolute positions
    total_len: jnp.ndarray,  # scalar: sequence length incl. this chunk
    page_size: int,
    scale: Optional[float] = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Chunk attention against the paged context (append must precede)."""
    if impl == "pallas":
        from chitu_tpu.ops import pallas_attention

        return pallas_attention.attend_prefill(
            q, k_pool, v_pool, block_table, q_pos, total_len, page_size, scale
        )
    mp = block_table.shape[0]
    kv = paged_gather(k_pool, block_table[None])[0]  # [mp*page, KV, D]
    vv = paged_gather(v_pool, block_table[None])[0]
    S = mp * page_size
    cols = jnp.arange(S)[None, :]
    mask = (cols <= q_pos[:, None]) & (cols < total_len)
    return grouped_attention(q, kv, vv, mask, scale=scale)


def attend_decode(
    q: jnp.ndarray,  # [B, H, D]
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, mp]
    seq_lens: jnp.ndarray,  # [B] context length EXCLUDING the new token
    page_size: int,
    scale: Optional[float] = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """One-token decode attention (new token's K/V already appended)."""
    if impl == "pallas":
        from chitu_tpu.ops import pallas_attention

        return pallas_attention.attend_decode(
            q, k_pool, v_pool, block_tables, seq_lens, page_size, scale
        )
    B, H, D = q.shape
    kv = paged_gather(k_pool, block_tables)  # [B, S, KV, D]
    vv = paged_gather(v_pool, block_tables)
    S = kv.shape[1]
    cols = jnp.arange(S)[None, :]
    mask = cols <= seq_lens[:, None]  # [B, S]

    def one(qb, kb, vb, mb):
        return grouped_attention(qb[None], kb, vb, mb[None], scale=scale)[0]

    return jax.vmap(one)(q, kv, vv, mask)
