"""Ring-sharded KV cache: pool pages sharded over a mesh axis.

ADDITIVE capability over the reference (no sequence parallelism there —
SURVEY.md §5 long-context; BASELINE names long-seq scaling the north
star): the paged pool's PAGE dim shards over the ring axis, so total KV
capacity scales with the ring size — the decode-side complement of ring
prefill (parallel/ring.py, which scales prefill *compute*).

Page placement follows shard_map's contiguous split: global page g lives
on ring shard `g // P_local` at local index `g % P_local` (P_local =
P_global / sp). Appends are owner-writes (non-owners scatter to
the drop sentinel); attention is flash-decoding across shards — every
shard computes an online-softmax partial over its own pages, then the
(m, l, acc) stats combine with `pmax`/`psum` over the ring axis. The
collective payload is [B, H, D] + two [B, H] stats per layer — tiny next
to the KV pages it saves each shard from reading.

Oracle-parity: matches the replicated-pool decode path exactly
(tests/test_ring_kv.py); the engine enables it with `infer.ring_kv=true`
on a dp>1 mesh (the batch stays replicated over 'dp' — capacity trades
against replica throughput, the long-context regime).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from chitu_tpu.models.common import NEG_INF, paged_append, paged_flat_index
from chitu_tpu.ops.attention import _gather, pack_kv, unpack_pool


def ring_local_block_table(bt: jnp.ndarray, p_local: int, idx) -> jnp.ndarray:
    """Global block table -> this shard's local table (-1 = not owned).

    Ownership is the contiguous bank split shard_map applies to the page
    dim: global page g lives on shard g // p_local."""
    owned = (bt >= 0) & (bt // p_local == idx)
    return jnp.where(owned, bt % p_local, -1)


def _tp(mesh, tp_axis: str):
    """tp composition: the pool minor (whole-KV-head blocks) additionally
    shards over `tp_axis` — each (ring, tp) shard owns its page stripe x
    its contiguous KV-head slice, exactly the TP-sharded-pool layout the
    non-ring kernels use (ops/attention.py kv_tp_shard)."""
    return mesh.shape.get(tp_axis, 1) if tp_axis else 1


def _la(mesh, layer_axis: str):
    """pp composition: the pool's LAYER dim additionally shards over
    `layer_axis` (the engine's P('pp', ring, None, tp) pool spec). A
    stage that does not own the current layer contributes zero pages —
    its appends hit the drop sentinel and its attention stats fold into
    the cross-shard combine as empty — so the flash-stat psum/pmax runs
    over (ring x pp) and every device ends with the full output."""
    return mesh.shape.get(layer_axis, 1) if layer_axis else 1


def _local_layer(pool_l, layer_g, layer_axis: str):
    """(local layer index clamped into range, owned?) for this shard."""
    if not layer_axis:
        return layer_g, None
    L_local = pool_l.shape[0]
    off = jax.lax.axis_index(layer_axis) * L_local
    l_loc = layer_g - off
    owned = (l_loc >= 0) & (l_loc < L_local)
    return jnp.clip(l_loc, 0, L_local - 1), owned


def _partial_attention(
    q: jnp.ndarray,  # [B, H, D]
    k: jnp.ndarray,  # [B, S, KV, D]
    v: jnp.ndarray,  # [B, S, KV, D]
    mask: jnp.ndarray,  # [B, S] bool
    kv_heads: int,
    scale: float,
    softcap: float,
):
    """Grouped attention partial with online-softmax stats.

    Returns (m [B, KV, G], l [B, KV, G], acc [B, KV, G, D]) — the
    flash-decoding split-KV contract (reference:
    chitu/triton_decode_attention.py:20-291 computes the same per-split
    stats before the LSE reduce)."""
    B, H, D = q.shape
    G = H // kv_heads
    qg = q.reshape(B, kv_heads, G, D).astype(jnp.float32) * scale
    scores = jnp.einsum("bkgd,bskd->bkgs", qg, k.astype(jnp.float32))
    if softcap > 0.0:
        scores = jnp.tanh(scores / softcap) * softcap
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    m = jnp.max(scores, axis=-1)  # [B, KV, G]; NEG_INF when nothing owned
    p = jnp.exp(scores - m[..., None])
    p = jnp.where(mask[:, None, None, :], p, 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bkgs,bskd->bkgd", p, v.astype(jnp.float32))
    return m, l, acc


def _combine(m, l, acc, axis):
    """Fold per-shard stats over the ring (and the 'pp' stage axis when
    the layer dim is also sharded): the cross-shard LSE reduce. `axis`
    is a name or tuple of names."""
    m_g = jax.lax.pmax(m, axis)
    corr = jnp.where(m > NEG_INF / 2, jnp.exp(m - m_g), 0.0)
    l_g = jax.lax.psum(l * corr, axis)
    acc_g = jax.lax.psum(acc * corr[..., None], axis)
    return acc_g / jnp.maximum(l_g, 1e-30)[..., None]


def _page_mask(bt_local: jnp.ndarray, S: int, page_size: int) -> jnp.ndarray:
    """[B, S] bool: token column is backed by an owned page."""
    cols = jnp.arange(S)[None, :]
    page_of_col = cols // page_size  # [1, S]
    owned_page = jnp.take_along_axis(
        bt_local, jnp.broadcast_to(page_of_col, (bt_local.shape[0], S)),
        axis=1,
    )
    return owned_page >= 0


def append_decode_ring(
    pool: jnp.ndarray,  # [L, P_global, page, M] (page dim sharded)
    layer: jnp.ndarray,
    k: jnp.ndarray,  # [B, KV, D]
    v: Optional[jnp.ndarray],
    block_tables: jnp.ndarray,  # [B, mp] GLOBAL page ids
    seq_lens: jnp.ndarray,  # [B]
    valid: jnp.ndarray,  # [B] bool
    page_size: int,
    mesh,
    axis: str = "dp",
    tp_axis: str = "",
    layer_axis: str = "",
) -> jnp.ndarray:
    ta = tp_axis if _tp(mesh, tp_axis) > 1 else None
    la = layer_axis if _la(mesh, layer_axis) > 1 else None

    def local(pool_l, layer_l, k_l, v_l, bt_l, sl_l, valid_l):
        idx = jax.lax.axis_index(axis)
        lbt = ring_local_block_table(bt_l, pool_l.shape[1], idx)
        l_loc, owned = _local_layer(pool_l, layer_l[0], la)
        flat = paged_flat_index(lbt, sl_l, page_size)  # -1 page -> sentinel
        flat = jnp.where(valid_l, flat, jnp.iinfo(jnp.int32).max)
        if owned is not None:
            flat = jnp.where(owned, flat, jnp.iinfo(jnp.int32).max)
        vals = pack_kv(
            k_l, None if v_l.ndim == 0 else v_l, pool_l.shape[-1]
        )
        return paged_append(pool_l, l_loc, vals, flat)

    v_in = v if v is not None else jnp.zeros((), pool.dtype)
    layer_arr = jnp.reshape(layer.astype(jnp.int32), (1,))
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(la, axis, None, ta),
            P(None),
            P(None, ta, None),
            P(None, ta, None) if v is not None else P(),
            P(None, None),
            P(None),
            P(None),
        ),
        out_specs=P(la, axis, None, ta),
        check_vma=False,
    )(pool, layer_arr, k, v_in, block_tables, seq_lens, valid)


def attend_decode_ring(
    q: jnp.ndarray,  # [B, H, D]
    pool: jnp.ndarray,  # [L, P_global, page, M] (page dim sharded)
    layer: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, mp] GLOBAL
    seq_lens: jnp.ndarray,  # [B] context EXCLUDING the new token
    page_size: int,
    kv_heads: int,
    head_dim: int,
    split_kv: bool = True,
    scale: Optional[float] = None,
    mesh=None,
    axis: str = "dp",
    window: int = 0,
    softcap: float = 0.0,
    tp_axis: str = "",
    layer_axis: str = "",
) -> jnp.ndarray:
    B, H, D = q.shape
    tp = _tp(mesh, tp_axis)
    ta = tp_axis if tp > 1 else None
    la = layer_axis if _la(mesh, layer_axis) > 1 else None
    kv_local = kv_heads // tp
    scale_ = scale if scale is not None else 1.0 / math.sqrt(D)
    comb_axes = (axis,) if la is None else (axis, la)

    def local(q_l, pool_l, layer_l, bt_l, sl_l):
        idx = jax.lax.axis_index(axis)
        lbt = ring_local_block_table(bt_l, pool_l.shape[1], idx)
        l_loc, owned = _local_layer(pool_l, layer_l[0], la)
        gathered = _gather(pool_l, l_loc, lbt)  # [B, S, M_local]
        k, v = unpack_pool(gathered, kv_local, head_dim, split_kv)
        S = k.shape[1]
        cols = jnp.arange(S)[None, :]
        mask = (cols <= sl_l[:, None]) & _page_mask(lbt, S, page_size)
        if owned is not None:
            mask = mask & owned
        if window > 0:
            mask = mask & (cols > sl_l[:, None] - window)
        m, l, acc = _partial_attention(
            q_l, k, v, mask, kv_local, scale_, softcap
        )
        out = _combine(m, l, acc, comb_axes)  # [B, KV_l, G, D]
        return out.reshape(B, q_l.shape[1], D).astype(q_l.dtype)

    layer_arr = jnp.reshape(layer.astype(jnp.int32), (1,))
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, ta, None),
            P(la, axis, None, ta),
            P(None),
            P(None, None),
            P(None),
        ),
        out_specs=P(None, ta, None),
        check_vma=False,
    )(q, pool, layer_arr, block_tables, seq_lens)


def append_prefill_ring(
    pool: jnp.ndarray,
    layer: jnp.ndarray,
    k: jnp.ndarray,  # [T, KV, D]
    v: Optional[jnp.ndarray],
    block_table: jnp.ndarray,  # [mp] GLOBAL
    q_pos: jnp.ndarray,  # [T]
    valid_len: jnp.ndarray,
    page_size: int,
    mesh,
    axis: str = "dp",
    tp_axis: str = "",
    layer_axis: str = "",
) -> jnp.ndarray:
    T = k.shape[0]
    ta = tp_axis if _tp(mesh, tp_axis) > 1 else None
    la = layer_axis if _la(mesh, layer_axis) > 1 else None

    def local(pool_l, layer_l, k_l, v_l, bt_l, pos_l, vl_l):
        idx = jax.lax.axis_index(axis)
        lbt = ring_local_block_table(bt_l, pool_l.shape[1], idx)
        l_loc, owned = _local_layer(pool_l, layer_l[0], la)
        pos = jnp.where(jnp.arange(T) < vl_l[0], pos_l, -1)
        bt_rows = jnp.broadcast_to(lbt, (T, lbt.shape[0]))
        flat = paged_flat_index(bt_rows, jnp.maximum(pos, 0), page_size)
        flat = jnp.where(pos >= 0, flat, jnp.iinfo(jnp.int32).max)
        if owned is not None:
            flat = jnp.where(owned, flat, jnp.iinfo(jnp.int32).max)
        vals = pack_kv(
            k_l, None if v_l.ndim == 0 else v_l, pool_l.shape[-1]
        )
        return paged_append(pool_l, l_loc, vals, flat)

    v_in = v if v is not None else jnp.zeros((), pool.dtype)
    layer_arr = jnp.reshape(layer.astype(jnp.int32), (1,))
    vl_arr = jnp.reshape(jnp.asarray(valid_len, jnp.int32), (1,))
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(la, axis, None, ta),
            P(None),
            P(None, ta, None),
            P(None, ta, None) if v is not None else P(),
            P(None),
            P(None),
            P(None),
        ),
        out_specs=P(la, axis, None, ta),
        check_vma=False,
    )(pool, layer_arr, k, v_in, block_table, q_pos, vl_arr)


def attend_prefill_ring(
    q: jnp.ndarray,  # [T, H, D]
    pool: jnp.ndarray,
    layer: jnp.ndarray,
    block_table: jnp.ndarray,  # [mp] GLOBAL
    q_pos: jnp.ndarray,  # [T]
    total_len: jnp.ndarray,
    page_size: int,
    kv_heads: int,
    head_dim: int,
    split_kv: bool = True,
    scale: Optional[float] = None,
    mesh=None,
    axis: str = "dp",
    window: int = 0,
    softcap: float = 0.0,
    tp_axis: str = "",
    layer_axis: str = "",
) -> jnp.ndarray:
    """Chunk prefill attention against the ring-sharded pool (chunked
    prefill reads earlier chunks' pages from their owner shards)."""
    T, H, D = q.shape
    tp = _tp(mesh, tp_axis)
    ta = tp_axis if tp > 1 else None
    la = layer_axis if _la(mesh, layer_axis) > 1 else None
    kv_local = kv_heads // tp
    scale_ = scale if scale is not None else 1.0 / math.sqrt(D)
    comb_axes = (axis,) if la is None else (axis, la)

    def local(q_l, pool_l, layer_l, bt_l, qp_l, info_l):
        idx = jax.lax.axis_index(axis)
        lbt = ring_local_block_table(bt_l, pool_l.shape[1], idx)
        l_loc, owned = _local_layer(pool_l, layer_l[0], la)
        gathered = _gather(pool_l, l_loc, lbt[None])  # [1, S, M_l]
        k, v = unpack_pool(gathered, kv_local, head_dim, split_kv)
        S = k.shape[1]
        cols = jnp.arange(S)[None, :]
        mask = (
            (cols <= qp_l[:, None])
            & (cols < info_l[0])
            & _page_mask(lbt[None], S, page_size)
        )
        if owned is not None:
            mask = mask & owned
        if window > 0:
            mask = mask & (cols > qp_l[:, None] - window)
        kb = jnp.broadcast_to(k, (T,) + k.shape[1:])
        vb = jnp.broadcast_to(v, (T,) + v.shape[1:])
        m, l, acc = _partial_attention(
            q_l, kb, vb, mask, kv_local, scale_, softcap
        )
        out = _combine(m, l, acc, comb_axes)
        return out.reshape(T, q_l.shape[1], D).astype(q_l.dtype)

    info = jnp.stack([jnp.asarray(total_len, jnp.int32)])
    layer_arr = jnp.reshape(layer.astype(jnp.int32), (1,))
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, ta, None),
            P(la, axis, None, ta),
            P(None),
            P(None),
            P(None),
            P(None),
        ),
        out_specs=P(None, ta, None),
        check_vma=False,
    )(q, pool, layer_arr, block_table, q_pos, info)
