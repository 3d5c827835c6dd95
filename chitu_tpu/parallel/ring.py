"""Ring attention: sequence-parallel prefill over a mesh axis.

ADDITIVE capability over the reference (it has no sequence parallelism
anywhere — SURVEY.md §5 long-context: max_seq_len + YaRN only; BASELINE
names long-seq scaling the north star): the prefill token dim shards over
the 'sp' mesh axis, each shard holds its Q/K/V slice, and K/V slices
rotate around the ring with `ppermute` while an online-softmax
accumulator folds each incoming block — classic ring attention
(Liu et al.), expressed as one shard_map so XLA overlaps the ring
transfer with the block computation.

This scales prefill *compute* and activation memory with the ring size;
KV-cache *capacity* scaling is handled separately by the TP-sharded pool
(ops/attention.py interleaved layout).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

NEG_INF = -1e30


def _block_attention(q, k, v, keep, scale, m, l, acc):
    """One online-softmax accumulation step.

    q [T, KV, G, D] f32 (pre-scaled), k/v [S, KV, D] f32,
    keep [T, S] bool; m/l [KV, G, T, 1], acc [KV, G, T, D]."""
    s = jnp.einsum("tkgd,skd->kgts", q, k)
    s = jnp.where(keep[None, None, :, :], s, NEG_INF)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.einsum("kgts,skd->kgtd", p, v)
    return m_new, l_new, acc * alpha + pv


def ring_attention(
    q: jnp.ndarray,  # [T, H, D] GLOBAL (sharded over axis on T)
    k: jnp.ndarray,  # [T, KV, D]
    v: jnp.ndarray,  # [T, KV, D]
    pos: jnp.ndarray,  # [T] absolute positions (-1 = padding)
    mesh,
    axis: str = "sp",
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Causal GQA attention with the sequence dim sharded over `axis`.

    Each ring step attends the local queries against the currently held
    K/V slice (causal by absolute position), then rotates the slice to
    the next shard. Output matches the single-device oracle.
    """
    T, H, D = q.shape
    KV = k.shape[1]
    G = H // KV
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    sp = mesh.shape[axis]

    def local(q_l, k_l, v_l, pos_l):
        Tl = q_l.shape[0]
        qf = (
            q_l.reshape(Tl, KV, G, D).astype(jnp.float32) * scale
        )

        def step(i, carry):
            m, l, acc, k_cur, v_cur, pos_cur = carry
            keep = (
                (pos_cur[None, :] <= pos_l[:, None])
                & (pos_cur[None, :] >= 0)
                & (pos_l[:, None] >= 0)
            )
            m, l, acc = _block_attention(
                qf, k_cur.astype(jnp.float32), v_cur.astype(jnp.float32),
                keep, 1.0, m, l, acc,
            )
            perm = [(j, (j + 1) % sp) for j in range(sp)]
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            pos_cur = jax.lax.ppermute(pos_cur, axis, perm)
            return m, l, acc, k_cur, v_cur, pos_cur

        m0 = jnp.full((KV, G, Tl, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((KV, G, Tl, 1), jnp.float32)
        acc0 = jnp.zeros((KV, G, Tl, D), jnp.float32)
        m, l, acc, *_ = jax.lax.fori_loop(
            0, sp, step, (m0, l0, acc0, k_l, v_l, pos_l)
        )
        out = acc / jnp.maximum(l, 1e-30)  # [KV, G, Tl, D]
        return (
            out.transpose(2, 0, 1, 3).reshape(Tl, H, D).astype(q_l.dtype)
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axis, None, None),
            P(axis, None, None),
            P(axis, None, None),
            P(axis),
        ),
        out_specs=P(axis, None, None),
        check_vma=False,
        axis_names={axis},
    )(q, k, v, pos)
