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

KV pool layout: ONE pool per layer, [num_pages, page, M].
- GQA/MHA models: M = pad128(2*KV*D), K-half-then-V-half rows
  [K_0..K_{KV-1} V_0..V_{KV-1}] (grouped per tp shard when the minor is
  sharded — pack_kv) — one DMA fetches both halves, kernels dot only the
  half they need, and the minor dim shards over 'tp' on whole-KV-head
  boundaries (split_kv=True; the per-rank n_local_kv_heads sizing of
  reference backend.py:181-217).
- MLA models: M = pad128(kv_dim); K and V are the same latent rows
  (split_kv=False; reference merged cache: backend.py:181-217).

Contract notes: causal alignment is bottom-right (query token i in a chunk
starting at absolute position p attends to absolute positions <= p+i),
matching flash-attn semantics the reference documents
(attn_backend.py:88-101).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from chitu_tpu.models.common import (
    grouped_attention,
    pad_kv_minor,
    paged_append,
    paged_flat_index,
)


def pack_kv(
    k: jnp.ndarray, v: Optional[jnp.ndarray], minor: int, groups: int = 1
) -> jnp.ndarray:
    """[N, KV, D] k (+v) -> [N, minor] page-row values.

    GQA layout: K-half then V-half, [K_0..K_{KV-1} V_0..V_{KV-1} | pad] —
    attention kernels dot q against the K lanes and p against the V lanes
    only, HALF the MXU passes of an interleaved layout where zeros/dead
    lanes still burn passes. `groups` > 1 (kv_tp_shard) nests the halves
    per tp shard, [G_0 | .. | G_{g-1}] with G_r = [K_r-heads | V_r-heads],
    so a contiguous 'tp' shard of the minor still holds whole heads AND a
    local halves layout (the per-rank n_local_kv_heads cache sizing,
    reference: backend.py:181-217). Merged-MLA (v=None): [k_flat | pad]."""
    N = k.shape[0]
    if v is None:
        kf = k.reshape(N, -1)
        if kf.shape[-1] < minor:
            kf = jnp.pad(kf, ((0, 0), (0, minor - kf.shape[-1])))
        return kf
    kg = k.reshape(N, groups, -1)  # [N, g, KVl*D]
    vg = v.reshape(N, groups, -1)
    flat = jnp.concatenate([kg, vg], axis=-1).reshape(N, -1)
    if flat.shape[-1] < minor:
        flat = jnp.pad(flat, ((0, 0), (0, minor - flat.shape[-1])))
    return flat


def unpack_pool(
    gathered: jnp.ndarray,  # [B, S, M]
    kv_heads: int,
    head_dim: int,
    split_kv: bool,
    groups: int = 1,
):
    """-> (k [B, S, KV, D], v [B, S, KV, D]). int8 pools hold fp8-e4m3
    bits (infer.kv_dtype=fp8) and dequantize here. Inverse of pack_kv's
    grouped-halves layout."""
    from chitu_tpu.models.common import kv_decode

    gathered = kv_decode(gathered)
    B, S, M = gathered.shape
    n = kv_heads * head_dim
    if split_kv:
        nl = n // groups
        kv = gathered[..., : 2 * n].reshape(B, S, groups, 2, nl)
        k = kv[..., 0, :].reshape(B, S, kv_heads, head_dim)
        v = kv[..., 1, :].reshape(B, S, kv_heads, head_dim)
        return k, v
    k = gathered[..., :n].reshape(B, S, kv_heads, head_dim)
    return k, k


def _gather(pool, layer, block_table):
    L, P, page, M = pool.shape
    safe = jnp.maximum(block_table, 0) + layer.astype(jnp.int32) * P
    out = pool.reshape(L * P, page, M)[safe]  # [B, MP, page, M]
    B, MP = block_table.shape
    return out.reshape(B, MP * page, M)


def _pool_groups(mesh, kv_tp_shard: bool) -> int:
    """kv-shard group count of the pool's minor layout (pack_kv): tp when
    the minor is actually 'tp'-sharded (model.kv_tp_shard), else 1."""
    if mesh is None or not kv_tp_shard:
        return 1
    return mesh.shape.get("tp", 1)


def append_prefill(
    pool: jnp.ndarray,  # [L, P, page, M] (whole stacked pool)
    layer: jnp.ndarray,  # scalar i32
    k: jnp.ndarray,  # [T, KV, D]
    v: Optional[jnp.ndarray],
    block_table: jnp.ndarray,  # [mp] int32
    q_pos: jnp.ndarray,  # [T] absolute positions
    valid_len: jnp.ndarray,
    page_size: int,
    kv_groups: int = 1,
) -> jnp.ndarray:
    T = k.shape[0]
    pos = jnp.where(jnp.arange(T) < valid_len, q_pos, -1)
    bt = jnp.broadcast_to(block_table, (T, block_table.shape[0]))
    flat = paged_flat_index(bt, jnp.maximum(pos, 0), page_size)
    flat = jnp.where(pos >= 0, flat, jnp.iinfo(jnp.int32).max)
    return paged_append(
        pool, layer, pack_kv(k, v, pool.shape[-1], kv_groups), flat
    )


def append_decode(
    pool: jnp.ndarray,  # [L, P, page, M]
    layer: jnp.ndarray,
    k: jnp.ndarray,  # [B, KV, D]
    v: Optional[jnp.ndarray],
    block_tables: jnp.ndarray,  # [B, mp]
    seq_lens: jnp.ndarray,  # [B]
    valid: jnp.ndarray,  # [B] bool
    page_size: int,
    kv_groups: int = 1,
) -> jnp.ndarray:
    flat = paged_flat_index(block_tables, seq_lens, page_size)
    flat = jnp.where(valid, flat, jnp.iinfo(jnp.int32).max)
    return paged_append(
        pool, layer, pack_kv(k, v, pool.shape[-1], kv_groups), flat
    )


def attend_prefill(
    q: jnp.ndarray,  # [T, H, D]
    pool: jnp.ndarray,  # [L, P, page, M]
    layer: jnp.ndarray,  # scalar i32
    block_table: jnp.ndarray,  # [mp]
    q_pos: jnp.ndarray,  # [T]
    total_len: jnp.ndarray,
    page_size: int,
    kv_heads: int,
    head_dim: int,
    split_kv: bool = True,
    scale: Optional[float] = None,
    impl: str = "xla",
    mesh=None,
    kv_tp_shard: bool = False,
    window: int = 0,
    softcap: float = 0.0,
    layer_axis: str = "",
) -> jnp.ndarray:
    """Chunk attention against the paged context (append must precede).

    `layer_axis`: mesh axis sharding the pool's layer dim ("pp" under
    sequential pipeline-parallel GSPMD; "" = replicated pool)."""
    if impl == "pallas" and mesh is not None:
        return _shmap_prefill(
            q, pool, layer, block_table, q_pos, total_len,
            page_size, kv_heads, head_dim, split_kv, scale, mesh,
            kv_tp_shard, window, softcap, layer_axis,
        )
    if impl == "pallas":
        from chitu_tpu.ops import pallas_attention

        return pallas_attention.attend_prefill(
            q, pool, layer, block_table, q_pos, total_len,
            page_size, kv_heads, head_dim, split_kv, scale=scale,
            window=window, softcap=softcap,
            interpret=jax.default_backend() != "tpu",
        )
    gathered = _gather(pool, layer, block_table[None])
    k, v = unpack_pool(
        gathered, kv_heads, head_dim, split_kv,
        _pool_groups(mesh, kv_tp_shard),
    )
    S = k.shape[1]
    cols = jnp.arange(S)[None, :]
    mask = (cols <= q_pos[:, None]) & (cols < total_len)
    if window > 0:
        mask = mask & (cols > q_pos[:, None] - window)
    return grouped_attention(
        q, k[0], v[0], mask, scale=scale, softcap=softcap
    )


def append_prefill_packed(
    pool: jnp.ndarray,  # [L, P, page, M]
    layer: jnp.ndarray,
    k: jnp.ndarray,  # [T, KV, D] packed tokens
    v: Optional[jnp.ndarray],
    block_tables: jnp.ndarray,  # [R, mp]
    seg_ids: jnp.ndarray,  # [T] int32 (-1 = padding token)
    pos: jnp.ndarray,  # [T] absolute position within its sequence
    page_size: int,
    kv_groups: int = 1,
) -> jnp.ndarray:
    """Packed-varlen append: each token scatters into its own segment's
    pages (reference VarLens contract: chitu/utils.py:84-100)."""
    bt = jnp.take(block_tables, jnp.maximum(seg_ids, 0), axis=0)  # [T, mp]
    flat = paged_flat_index(bt, jnp.maximum(pos, 0), page_size)
    flat = jnp.where((seg_ids >= 0) & (pos >= 0), flat, jnp.iinfo(jnp.int32).max)
    return paged_append(
        pool, layer, pack_kv(k, v, pool.shape[-1], kv_groups), flat
    )


def _oracle_prefill_packed(
    q, pool, layer, block_tables, seg_ids, pos, total_lens,
    kv_heads, head_dim, split_kv, scale, window=0, softcap=0.0,
    kv_groups=1,
):
    import math

    gathered = _gather(pool, layer, block_tables)  # [R, S, M]
    k, v = unpack_pool(gathered, kv_heads, head_dim, split_kv, kv_groups)
    seg_safe = jnp.maximum(seg_ids, 0)
    kt = jnp.take(k, seg_safe, axis=0)  # [T, S, KV, D]
    vt = jnp.take(v, seg_safe, axis=0)
    T, H, D = q.shape
    S = k.shape[1]
    G = H // kv_heads
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    spos = jnp.arange(S)[None, :]
    mask = (
        (spos <= pos[:, None])
        & (spos < jnp.take(total_lens, seg_safe)[:, None])
        & (seg_ids >= 0)[:, None]
    )
    if window > 0:
        mask = mask & (spos > pos[:, None] - window)
    qg = q.reshape(T, kv_heads, G, D).astype(jnp.float32) * scale
    scores = jnp.einsum("tkgd,tskd->tkgs", qg, kt.astype(jnp.float32))
    if softcap > 0.0:
        scores = jnp.tanh(scores / softcap) * softcap
    from chitu_tpu.models.common import NEG_INF

    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("tkgs,tskd->tkgd", p, vt.astype(jnp.float32))
    return out.reshape(T, H, D).astype(q.dtype)


def attend_prefill_packed(
    q: jnp.ndarray,  # [T, H, D]
    pool: jnp.ndarray,
    layer: jnp.ndarray,
    block_tables: jnp.ndarray,  # [R, mp]
    seg_ids: jnp.ndarray,  # [T]
    pos: jnp.ndarray,  # [T]
    total_lens: jnp.ndarray,  # [R]
    block_seg: jnp.ndarray,  # [NB]
    block_qstart: jnp.ndarray,  # [NB]
    page_size: int,
    kv_heads: int,
    head_dim: int,
    split_kv: bool = True,
    scale: Optional[float] = None,
    impl: str = "xla",
    mesh=None,
    kv_tp_shard: bool = False,
    window: int = 0,
    softcap: float = 0.0,
    layer_axis: str = "",
) -> jnp.ndarray:
    """R ragged prompts' chunk attention in one call (reference packed
    varlen prefill: chitu/utils.py:84-100, executor.py:118-131)."""
    if impl == "pallas" and mesh is not None:
        if _supports_shmap(mesh, q.shape[1], pool.shape[0], layer_axis):
            return _shmap_prefill_packed(
                q, pool, layer, block_tables, block_seg, block_qstart,
                total_lens, page_size, kv_heads, head_dim, split_kv, scale,
                mesh, kv_tp_shard, window, softcap, layer_axis,
            )
        impl = "xla"  # oracle under GSPMD for unsupported layouts
    if impl == "pallas":
        from chitu_tpu.ops import pallas_attention

        return pallas_attention.attend_prefill_packed(
            q, pool, layer, block_tables, block_seg, block_qstart,
            total_lens, page_size, kv_heads, head_dim, split_kv,
            scale=scale, window=window, softcap=softcap,
            interpret=jax.default_backend() != "tpu",
        )
    return _oracle_prefill_packed(
        q, pool, layer, block_tables, seg_ids, pos, total_lens,
        kv_heads, head_dim, split_kv, scale, window, softcap,
        kv_groups=_pool_groups(mesh, kv_tp_shard),
    )


def attend_decode(
    q: jnp.ndarray,  # [B, H, D]
    pool: jnp.ndarray,  # [L, P, page, M]
    layer: jnp.ndarray,  # scalar i32
    block_tables: jnp.ndarray,  # [B, mp]
    seq_lens: jnp.ndarray,  # [B] context EXCLUDING the new token
    page_size: int,
    kv_heads: int,
    head_dim: int,
    split_kv: bool = True,
    scale: Optional[float] = None,
    impl: str = "xla",
    mesh=None,
    kv_tp_shard: bool = False,
    window: int = 0,
    softcap: float = 0.0,
    layer_axis: str = "",
) -> jnp.ndarray:
    """One-token decode attention (new token's K/V already appended)."""
    if impl == "pallas" and mesh is not None:
        return _shmap_decode(
            q, pool, layer, block_tables, seq_lens,
            page_size, kv_heads, head_dim, split_kv, scale, mesh,
            kv_tp_shard, window, softcap, layer_axis,
        )
    if impl == "pallas":
        from chitu_tpu.ops import pallas_attention

        return pallas_attention.attend_decode(
            q, pool, layer, block_tables, seq_lens,
            page_size, kv_heads, head_dim, split_kv, scale=scale,
            window=window, softcap=softcap,
            interpret=jax.default_backend() != "tpu",
        )
    gathered = _gather(pool, layer, block_tables)
    k, v = unpack_pool(
        gathered, kv_heads, head_dim, split_kv,
        _pool_groups(mesh, kv_tp_shard),
    )
    S = k.shape[1]
    cols = jnp.arange(S)[None, :]
    mask = cols <= seq_lens[:, None]
    if window > 0:
        mask = mask & (cols > seq_lens[:, None] - window)

    def one(qb, kb, vb, mb):
        return grouped_attention(
            qb[None], kb, vb, mb[None], scale=scale, softcap=softcap
        )[0]

    return jax.vmap(one)(q, k, v, mask)


# ---------------------------------------------------------------------------
# shard_map wrappers: pallas kernels under a mesh. q arrives head-sharded
# over 'tp' (column-parallel wq); the pool is either TP-sharded on the
# interleaved KV-head minor (kv_tp_shard — each shard reads only its own
# KV heads' pages) or replicated (fallback for non-divisible layouts).
# GSPMD cannot partition pallas_call itself, so this is the multi-chip
# kernel path (the NCCL-free analogue of the reference's per-rank
# flash-attn calls).
#
# pp>1 (r5, VERDICT r4 next-1b): the pool's LAYER dim is 'pp'-sharded
# (kv_cache_partition_spec); `layer_axis="pp"` makes 'pp' a manual axis
# too — the OWNING stage runs the kernel on its local layer slice with a
# local layer index, the others contribute zeros, and one psum over 'pp'
# replicates the output (the sequential-GSPMD layers are computed
# redundantly on every stage anyway, so attention output is replicated).
# A replicated pool (layer_axis="", e.g. DeepSeek's dense-first group)
# just computes identically on every stage. This replaces the old
# pp==1-only gate that dropped EVERY pp>1 layout to the dense-gather
# oracle — the O(seq) copying SURVEY.md §2.2 criticizes (the reference
# keeps flash-attn on every rank regardless of layout,
# chitu/attn_backend.py:167-243).
# ---------------------------------------------------------------------------


def _supports_shmap(mesh, H: int, L: int = 0, layer_axis: str = "") -> bool:
    tp = mesh.shape.get("tp", 1)
    pp = mesh.shape.get("pp", 1)
    if pp > 1:
        # 'pp'-sharded pool needs even layer slices and the axis name;
        # a pool NOT declared pp-sharded must be replicated — callers
        # pass layer_axis="" only for replicated groups
        if layer_axis == "pp":
            if L % pp != 0:
                return False
        elif layer_axis:
            return False
    return H % tp == 0 and jax.default_backend() in ("tpu", "cpu")


def _pp_local_layer(pool_l, layer, layer_axis: str, pp: int):
    """(local_layer_idx, owner_weight | None): maps a GLOBAL layer index
    onto this stage's local pool slice. owner_weight is None when the
    pool is replicated (every stage owns every layer)."""
    if not layer_axis or pp <= 1:
        return layer, None
    Ll = pool_l.shape[0]
    stage = jax.lax.axis_index(layer_axis)
    loc = layer - stage * Ll
    owns = (loc >= 0) & (loc < Ll)
    return jnp.clip(loc, 0, Ll - 1), owns


def _pp_fold(out, owns, layer_axis: str):
    """Zero non-owner stages' kernel output and psum it back replicated
    (f32 lanes: the XLA CPU AllReducePromotion bf16 crash, see
    models/common.psum_f32)."""
    if owns is None:
        return out
    from chitu_tpu.models.common import psum_f32

    return psum_f32(jnp.where(owns, out, 0), layer_axis)


def _shmap_decode(
    q, pool, layer, block_tables, seq_lens, page_size, kv_heads, head_dim,
    split_kv, scale, mesh, kv_tp_shard=False, window=0, softcap=0.0,
    layer_axis: str = "",
):
    from jax.sharding import PartitionSpec as P

    from chitu_tpu.ops import pallas_attention

    B, H, D = q.shape
    tp = mesh.shape["tp"]
    pp = mesh.shape.get("pp", 1)
    if not _supports_shmap(mesh, H, pool.shape[0], layer_axis):
        # fall back to the oracle path under unsupported layouts
        gathered = _gather(pool, layer, block_tables)
        k, v = unpack_pool(
            gathered, kv_heads, head_dim, split_kv,
            _pool_groups(mesh, kv_tp_shard),
        )
        S = k.shape[1]
        cols = jnp.arange(S)[None, :]
        mask = cols <= seq_lens[:, None]

        if window > 0:
            mask = mask & (cols > seq_lens[:, None] - window)

        def one(qb, kb, vb, mb):
            return grouped_attention(
                qb[None], kb, vb, mb[None], scale=scale, softcap=softcap
            )[0]

        return jax.vmap(one)(q, k, v, mask)

    group = H // kv_heads
    sharded = kv_tp_shard and split_kv and tp > 1 and kv_heads % tp == 0
    kv_local = kv_heads // tp if sharded else kv_heads
    interpret = jax.default_backend() != "tpu"
    layer_arr = jnp.reshape(layer.astype(jnp.int32), (1,))
    pool_spec = P(
        layer_axis or None, None, None, "tp" if sharded else None
    )

    def local(q_l, pool_l, layer_l, bt_l, sl_l):
        # sharded pool: the local head slice is aligned with the local KV
        # slice (both contiguous over 'tp'), so local kv = h // group
        off = 0 if sharded else jax.lax.axis_index("tp") * (H // tp)
        lidx, owns = _pp_local_layer(pool_l, layer_l[0], layer_axis, pp)
        out = pallas_attention.attend_decode(
            q_l, pool_l, lidx, bt_l, sl_l, page_size, kv_local,
            head_dim, split_kv, scale=scale, interpret=interpret,
            group=group, head_offset=off, window=window, softcap=softcap,
        )
        return _pp_fold(out, owns, layer_axis)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, "tp", None),
            pool_spec,
            P(None),
            P(None, None),
            P(None),
        ),
        out_specs=P(None, "tp", None),
        check_vma=False,
    )(q, pool, layer_arr, block_tables, seq_lens)


def _shmap_prefill(
    q, pool, layer, block_table, q_pos, total_len, page_size, kv_heads,
    head_dim, split_kv, scale, mesh, kv_tp_shard=False, window=0,
    softcap=0.0, layer_axis: str = "",
):
    from jax.sharding import PartitionSpec as P

    from chitu_tpu.ops import pallas_attention

    T, H, D = q.shape
    tp = mesh.shape["tp"]
    pp = mesh.shape.get("pp", 1)
    if not _supports_shmap(mesh, H, pool.shape[0], layer_axis):
        gathered = _gather(pool, layer, block_table[None])
        k, v = unpack_pool(
            gathered, kv_heads, head_dim, split_kv,
            _pool_groups(mesh, kv_tp_shard),
        )
        S = k.shape[1]
        cols = jnp.arange(S)[None, :]
        mask = (cols <= q_pos[:, None]) & (cols < total_len)
        if window > 0:
            mask = mask & (cols > q_pos[:, None] - window)
        return grouped_attention(
            q, k[0], v[0], mask, scale=scale, softcap=softcap
        )

    group = H // kv_heads
    sharded = kv_tp_shard and split_kv and tp > 1 and kv_heads % tp == 0
    kv_local = kv_heads // tp if sharded else kv_heads
    interpret = jax.default_backend() != "tpu"
    info = jnp.stack(
        [jnp.asarray(total_len, jnp.int32), layer.astype(jnp.int32)]
    )
    pool_spec = P(
        layer_axis or None, None, None, "tp" if sharded else None
    )

    def local(q_l, pool_l, bt_l, qp_l, info_l):
        off = 0 if sharded else jax.lax.axis_index("tp") * (H // tp)
        lidx, owns = _pp_local_layer(pool_l, info_l[1], layer_axis, pp)
        out = pallas_attention.attend_prefill(
            q_l, pool_l, lidx, bt_l, qp_l, info_l[0], page_size,
            kv_local, head_dim, split_kv, scale=scale, interpret=interpret,
            group=group, head_offset=off, window=window, softcap=softcap,
        )
        return _pp_fold(out, owns, layer_axis)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, "tp", None),
            pool_spec,
            P(None),
            P(None),
            P(None),
        ),
        out_specs=P(None, "tp", None),
        check_vma=False,
    )(q, pool, block_table, q_pos, info)


def _shmap_prefill_packed(
    q, pool, layer, block_tables, block_seg, block_qstart, total_lens,
    page_size, kv_heads, head_dim, split_kv, scale, mesh, kv_tp_shard=False,
    window=0, softcap=0.0, layer_axis: str = "",
):
    from jax.sharding import PartitionSpec as P

    from chitu_tpu.ops import pallas_attention

    T, H, D = q.shape
    tp = mesh.shape["tp"]
    pp = mesh.shape.get("pp", 1)
    if not _supports_shmap(mesh, H, pool.shape[0], layer_axis):
        raise NotImplementedError(
            "packed prefill oracle fallback under mesh requires seg/pos; "
            "callers guard on _supports_shmap"
        )
    group = H // kv_heads
    sharded = kv_tp_shard and split_kv and tp > 1 and kv_heads % tp == 0
    kv_local = kv_heads // tp if sharded else kv_heads
    interpret = jax.default_backend() != "tpu"
    layer_arr = jnp.reshape(layer.astype(jnp.int32), (1,))
    pool_spec = P(
        layer_axis or None, None, None, "tp" if sharded else None
    )

    def local(q_l, pool_l, bt_l, bs_l, bq_l, tl_l, layer_l):
        off = 0 if sharded else jax.lax.axis_index("tp") * (H // tp)
        lidx, owns = _pp_local_layer(pool_l, layer_l[0], layer_axis, pp)
        out = pallas_attention.attend_prefill_packed(
            q_l, pool_l, lidx, bt_l, bs_l, bq_l, tl_l, page_size,
            kv_local, head_dim, split_kv, scale=scale, interpret=interpret,
            group=group, head_offset=off, window=window, softcap=softcap,
        )
        return _pp_fold(out, owns, layer_axis)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, "tp", None),
            pool_spec,
            P(None, None),
            P(None),
            P(None),
            P(None),
            P(None),
        ),
        out_specs=P(None, "tp", None),
        check_vma=False,
    )(q, pool, block_tables, block_seg, block_qstart, total_lens, layer_arr)
