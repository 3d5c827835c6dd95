"""Pallas TPU attention kernels over the paged KV cache.

The TPU-native replacement for the reference's attention-backend zoo
(reference: chitu/attn_backend.py — flash_attn / FlashMLA / flashinfer /
triton split-KV decode, chitu/triton_decode_attention.py:20-291):

- `attend_decode`: flash-decoding style batched one-token attention. One
  grid step per batch row; pages stream HBM->VMEM through a ring of
  in-flight DMAs (depth 8) with a *dynamic* page-count loop, so only the
  live context is read and DMA latency is hidden behind compute.
- `attend_prefill`: chunked prefill attention against the paged context
  with causal masking by absolute position (flash-attn varlen semantics,
  reference: attn_backend.py:88-101).

Layouts (see ops/attention.py): one pool per layer, [P, page, M].
split_kv=True packs K-half-then-V-half page rows
([K_0..K_{KV-1} V_0..V_{KV-1}], grouped per tp shard when the minor is
sharded — pack_kv); split_kv=False is the merged-MLA latent cache where V
rows are the K rows (reference: backend.py:181-217 MLA-absorb shapes).

GQA is handled with an *expanded query*: head h's D query lanes are placed
into its KV head's K block (zeros elsewhere), so Q@K^T computes every head
against its own KV head in one MXU matmul — no per-head slicing inside the
kernel (64-wide head slices break Mosaic's 128-lane tiling). When the K
half is 128-lane aligned the kernels dot q against ONLY the K half and p
against ONLY the V half (half the MXU passes); otherwise the dots run
full-row with dead lanes. The PV product's block mask selects each head's
V block and a constant fold matrix sums it back to D lanes. The same
expand/mask/fold machinery covers the merged-MLA latent row (split_kv=
False), so ONE kernel body serves both layouts — and the grouped rows
shard over 'tp' on KV-head boundaries with plain NamedShardings.

Both kernels match the jnp oracle in ops/attention.py
(tests/test_pallas_attention.py: CPU interpret mode + real TPU).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DMA_RING = 8  # in-flight page fetches (shrunk to fit VMEM)
Q_BLOCK = 64  # prefill query tokens per grid step (shrunk to fit VMEM)
VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the 16MB scoped limit


def _fit_ring(page: int, M: int, itemsize: int, budget: int) -> int:
    ring = DMA_RING
    while ring > 2 and ring * page * M * itemsize > budget:
        ring //= 2
    if ring * page * M * itemsize > 2 * budget:
        # fail with the cause instead of an opaque Mosaic VMEM error
        # (dense/skew cache types set page_size = max_seq_len: at large
        # contexts those layouts cannot host the pallas page ring)
        raise ValueError(
            f"page_size={page} x pool minor {M} needs "
            f"{ring * page * M * itemsize >> 20} MiB of VMEM ring "
            f"scratch; use cache_type=paged with a smaller page_size "
            f"or attn_type=xla"
        )
    return ring


def _fit_q_block(T: int, H: int, C: int, page: int, D: int) -> int:
    """Largest power-of-two query block whose kernel working set fits the
    VMEM budget: expanded q (bf16 in, f32 in-kernel), score matrix, and
    the f32 accumulator, all sized per query row."""
    per_row = H * (6 * C + 4 * page + 8 * D)
    tq = min(T, Q_BLOCK)
    while tq > 8 and tq * per_row > VMEM_BUDGET // 2:
        tq //= 2
    return tq


def _expand_q(
    q: jnp.ndarray,
    kv_heads: int,
    M: int,
    group: Optional[int] = None,
    head_offset=0,
    interleaved: bool = True,
) -> jnp.ndarray:
    """[..., H, D] -> [..., H, M]: head h occupies its KV head's K block.

    Split-KV (GQA) rows hold the K half then the V half
    ([K_0..K_{KV-1} V_0..V_{KV-1} | pad], ops/attention.pack_kv); head
    h's query goes to K block kv_h in the FIRST half, zeros elsewhere —
    Q @ row^T reads only K lanes, and kernels may dot against just the
    K half (half the MXU passes). Merged rows (MLA) have KV blocks and
    head h maps to block kv_h (identity for the 1-"head" latent).

    `group` is the GLOBAL heads-per-KV-head ratio and `head_offset` the
    global index of local head 0 — under shard_map each tp shard holds a
    contiguous head slice of the full head range.
    """
    *lead, H, D = q.shape
    G = group or (H // kv_heads)
    h_idx = jnp.arange(H)
    kv_idx = (head_offset + h_idx) // G
    blk = kv_idx  # K half leads in both layouts
    nblk = (2 if interleaved else 1) * kv_heads
    out = jnp.zeros((*lead, H, nblk, D), q.dtype)
    out = out.at[..., h_idx, blk, :].set(q)
    out = out.reshape(*lead, H, nblk * D)
    if nblk * D < M:
        pad = [(0, 0)] * (len(lead) + 1) + [(0, M - nblk * D)]
        out = jnp.pad(out, pad)
    return out


def _head_block_mask(
    H: int,
    kv_heads: int,
    D: int,
    M: int,
    group: Optional[int] = None,
    head_offset=0,
    interleaved: bool = True,
) -> jnp.ndarray:
    """[H, M] 1.0 where column belongs to head h's V block (split: in
    the V half) or its KV block (merged)."""
    G = group or (H // kv_heads)
    kv_idx = (head_offset + jnp.arange(H)) // G  # [H]
    target = kv_heads + kv_idx if interleaved else kv_idx
    nblk = (2 if interleaved else 1) * kv_heads
    colblk = jnp.arange(M) // D
    return (
        (colblk[None, :] == target[:, None]) & (colblk[None, :] < nblk)
    ).astype(jnp.float32)


def _fold_matrix(
    kv_heads: int, D: int, M: int, interleaved: bool = True
) -> np.ndarray:
    """[M, D]: sums the V blocks of a masked [_, M] row into D columns."""
    f = np.zeros((M, D), np.float32)
    for k in range(kv_heads):
        b = kv_heads + k if interleaved else k
        if (b + 1) * D <= M:
            f[b * D : (b + 1) * D, :] = np.eye(D, dtype=np.float32)
    return f


# ---------------------------------------------------------------------------
# Decode kernel
# ---------------------------------------------------------------------------



def _pool_f32(x):
    """Pool rows -> f32. int8 pools hold fp8-e4m3 BITS
    (infer.kv_dtype=fp8): dequant by bit placement — sign to bit 31,
    exp+mantissa to bits 20..26, then the 2^120 exponent re-bias (the
    soft-fp8 trick, reference: chitu/triton_kernels.py:250-287) — using
    VPU integer ops instead of the slow fp8 cast path."""
    if x.dtype == jnp.int8:
        from chitu_tpu.ops.kernel_common import fp8_place_bits

        return fp8_place_bits(x) * 2.0 ** 120
    return x.astype(jnp.float32)


def _pool_bf16(x):
    """Pool rows -> bf16 MXU operands. f32 dot_generals run the MXU at
    quarter rate (multi-pass decomposition); bf16 inputs with f32
    accumulation are the native path and exactly cover both pool
    encodings (bf16 identity; fp8-e4m3's 3-bit mantissa and 2^-6..448
    range embed losslessly in bf16)."""
    if x.dtype == jnp.int8:
        from chitu_tpu.ops.kernel_common import fp8_place_bits

        return (fp8_place_bits(x) * 2.0 ** 120).astype(jnp.bfloat16)
    return x

def _decode_kernel(
    block_tables_ref,  # [B, mp] int32 (SMEM, scalar prefetch)
    seq_lens_ref,  # [B] int32
    layer_ref,  # [1] int32
    q_ref,  # [1, H, C] VMEM block
    pool_ref,  # [L, P, page, M] ANY/HBM (whole stacked pool)
    mask_ref,  # [H, C] VMEM
    fold_ref,  # [C, D] VMEM
    o_ref,  # [1, H, D] VMEM block
    buf,  # [W, page, M] VMEM
    sems,  # [W] DMA semaphores
    *,
    page: int,
    scale: float,
    split_kv: bool,
    ring: int,
    window: int = 0,
    softcap: float = 0.0,
    khalf: int = 0,
    nofold: bool = False,
):
    b = pl.program_id(0)
    B = pl.num_programs(0)

    def row_geometry(row):
        total = seq_lens_ref[row] + 1  # new token's K/V already appended
        n_pages = jax.lax.div(total + page - 1, page)
        # sliding window: only the last `window` positions matter — skip
        # the pages before them entirely (free perf; reference
        # window_size, attn_backend.py:43-44)
        if window > 0:
            p0 = jnp.maximum(total - window, 0) // page
        else:
            p0 = 0
        return total, p0, n_pages

    total, p0, n_pages = row_geometry(b)
    H = q_ref.shape[1]
    D = o_ref.shape[2]
    layer = layer_ref[0]

    def dma(slot, i, row):
        pid = jnp.maximum(block_tables_ref[row, i], 0)
        return pltpu.make_async_copy(
            pool_ref.at[layer, pid], buf.at[slot], sems.at[slot]
        )

    def fill_ring(row):
        _, q0, np_r = row_geometry(row)
        for w in range(ring):
            @pl.when(q0 + w < np_r)
            def _():
                dma(jax.lax.rem(q0 + w, ring), q0 + w, row).start()

    # cross-row pipelining: row b's ring was filled at the END of row
    # b-1's grid step (bootstrap at b == 0), so the first pages are
    # already in flight when this step starts — batch-row boundaries
    # cost no DMA stall
    @pl.when(b == 0)
    def _():
        fill_ring(0)

    # bf16 MXU operands, f32 accumulation (native MXU rate; f32 inputs
    # decompose into multi-pass emulation). scale folds into the f32
    # product so q is not re-rounded.
    q = q_ref[0].astype(jnp.bfloat16)  # [H, C]

    def body(i, carry):
        m, l, acc = carry  # [H, 1], [H, 1], [H, D]
        slot = jax.lax.rem(i, ring)
        dma(slot, i, b).wait()

        if khalf:
            # K-half / V-half page layout (pack_kv): each dot contracts
            # only the lanes it needs — HALF the MXU passes of full-row
            # products with zero/dead lanes. Sliced at the REF (Mosaic
            # rejects value-level lane slices feeding dots).
            rows_k = _pool_bf16(buf[slot, :, :khalf])
            rows_v = _pool_bf16(buf[slot, :, khalf:])
        else:
            rows_k = rows_v = _pool_bf16(buf[slot])  # [page, M]
        pos = i * page + jax.lax.broadcasted_iota(jnp.int32, (1, page), 1)
        valid = pos < total

        # q is zero outside each head's K block, so the product reads
        # only K lanes
        s = jax.lax.dot_general(
            q, rows_k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [H, page] f32
        if softcap > 0.0:
            s = jnp.tanh(s / softcap) * softcap
        if window > 0:
            valid = valid & (pos >= total - window)
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)

        pv_full = jax.lax.dot_general(
            p.astype(jnp.bfloat16), rows_v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, M or khalf]
        if nofold:
            # merged 1-"head" MLA latent: mask is all-ones, fold is the
            # identity — pv_full IS the [H, D] result (skipping the
            # [H, M] x [M, D] fold matmul per page)
            pv = pv_full
        else:
            pv = jax.lax.dot_general(
                (pv_full * mask_ref[...]).astype(jnp.bfloat16),
                fold_ref[...].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H, D]

        # refill the ring slot we just freed
        @pl.when(i + ring < n_pages)
        def _():
            dma(slot, i + ring, b).start()

        return m_new, l_new, acc * alpha + pv

    m0 = jnp.full((H, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((H, 1), jnp.float32)
    acc0 = jnp.zeros((H, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(p0, n_pages, body, (m0, l0, acc0))
    # prefetch the NEXT row's first pages while this row's output flushes
    @pl.when(b + 1 < B)
    def _():
        fill_ring(b + 1)

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size", "kv_heads", "head_dim", "split_kv", "scale",
        "interpret", "group", "window", "softcap",
    ),
)
def attend_decode(
    q: jnp.ndarray,  # [B, H, D]
    pool: jnp.ndarray,  # [L, P, page, M] (whole stacked pool)
    layer: jnp.ndarray,  # scalar i32
    block_tables: jnp.ndarray,  # [B, mp] int32
    seq_lens: jnp.ndarray,  # [B] int32 (context excluding the new token)
    page_size: int,
    kv_heads: int,
    head_dim: int,
    split_kv: bool = True,
    scale: Optional[float] = None,
    interpret: bool = False,
    group: Optional[int] = None,
    head_offset=0,
    window: int = 0,
    softcap: float = 0.0,
) -> jnp.ndarray:
    B, H, D = q.shape
    L, P, page, M = pool.shape
    assert page == page_size and D == head_dim
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    ring = min(
        _fit_ring(page, M, pool.dtype.itemsize, VMEM_BUDGET // 2),
        max(block_tables.shape[-1], 2),
    )

    # K|V-halves fast path: q / mask / fold shrink to one half and the
    # kernel dots contract half the lanes (gated on 128-lane alignment)
    khalf = kv_heads * D if split_kv and (kv_heads * D) % 128 == 0 else 0
    Mq = khalf if khalf else M
    q_exp = _expand_q(
        q, kv_heads, Mq, group, head_offset, split_kv and not khalf
    )
    # merged 1-"head" latent rows (MLA absorb): mask = all-ones, fold =
    # identity — skip both in-kernel (and their VMEM residency)
    nofold = (not split_kv) and kv_heads == 1 and M == D
    if nofold:
        mask = jnp.ones((1, 1), jnp.float32)
        fold = jnp.ones((1, 1), jnp.float32)
    else:
        mask = _head_block_mask(
            H, kv_heads, D, Mq, group, head_offset, split_kv and not khalf
        )
        fold = jnp.asarray(
            _fold_matrix(kv_heads, D, Mq, split_kv and not khalf)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H, Mq), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((ring, page, M), pool.dtype),
            pltpu.SemaphoreType.DMA((ring,)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, page=page, scale=scale, split_kv=split_kv,
        ring=ring, window=window, softcap=softcap, khalf=khalf,
        nofold=nofold,
    )
    layer_arr = jnp.reshape(jnp.asarray(layer, jnp.int32), (1,))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(block_tables, seq_lens, layer_arr, q_exp, pool, mask, fold)


def _decode_fused_kernel(
    block_tables_ref,  # [B_pad, mp] int32 (SMEM, scalar prefetch)
    seq_lens_ref,  # [B_pad] int32 (context EXCLUDING the new token)
    layer_ref,  # [1] int32
    valid_ref,  # [B_pad] int32 (1 = live row)
    q_ref,  # [RB, H, C] VMEM block
    newkv_ref,  # [RB, 1, C] VMEM block: new tokens' packed page rows
    pool_ref,  # [L, P, page, M] ANY/HBM (aliased to pool_out_ref)
    mask_ref,  # [H, C] VMEM
    fold_ref,  # [C, D] VMEM
    o_ref,  # [RB, H, D] VMEM block
    pool_out_ref,  # [L, P, page, M] ANY/HBM — same buffer as pool_ref
    buf,  # [W, page, M] VMEM
    sems,  # [W] DMA semaphores
    wbuf,  # [2, ALIGN, M] VMEM: aligned append blocks (double-buffered)
    rsem,  # scalar DMA semaphore for the append block read
    wsem,  # [2] DMA semaphores for the pipelined append write-back
    nbuf,  # [2, page, M] VMEM: NEXT row's first page (cross-row prefetch)
    nsems,  # [2] DMA semaphores for nbuf
    *,
    page: int,
    scale: float,
    split_kv: bool,
    ring: int,
    rows_block: int,
    window: int = 0,
    softcap: float = 0.0,
    khalf: int = 0,
    nofold: bool = False,
):
    """Fused append+attend decode: the reference's
    `flash_attn_with_kvcache` contract (in-kernel KV append,
    reference: chitu/attn_backend.py:167-243) done the TPU way.

    Each grid step processes a BLOCK of `rows_block` batch rows (the
    per-grid-step fixed cost — block copies, guards, index maps —
    dominated the kernel at serving context lengths where a row is only
    1-2 pages), with the page-DMA ring threaded across rows so the memory
    pipeline never drains at a row boundary.

    The new token's page row lands via an aligned read-modify-write —
    Mosaic DMAs slice the sublane dim at 8-row granularity, so the kernel
    fetches the 8-row block around the slot, splices the row in VMEM, and
    writes the block back (requests never share a page, so the other 7
    rows are this row's own bytes). The write-back is double-buffered and
    retired one row later — no per-row DMA stall. Attention runs over the
    PRIOR context pages; the new token's contribution is one extra
    online-softmax column computed straight from VMEM, so the kernel
    never depends on reading back the bytes it writes, and the separate
    XLA scatter append disappears."""
    g = pl.program_id(0)
    G = pl.num_programs(0)
    RB = rows_block
    B = G * RB  # rows are padded to a rows_block multiple
    layer = layer_ref[0]
    align = wbuf.shape[1]
    H = q_ref.shape[1]
    D = o_ref.shape[2]

    def slot_geom(row):
        tot = seq_lens_ref[row]
        pid = block_tables_ref[row, jax.lax.div(tot, page)]
        off = jax.lax.rem(tot, page)
        blk = jax.lax.div(off, align) * align
        can = (valid_ref[row] > 0) & (pid >= 0)
        return pid, off, blk, can

    def wblock(ref, pid, blk):
        return ref.at[layer, jnp.maximum(pid, 0), pl.ds(blk, align)]

    def retire_write(row):
        """Wait for `row`'s append write-back (descriptor reconstructed
        from the scalar-prefetch refs) before its wbuf half is reused."""
        pidp, _, blkp, canp = slot_geom(row)

        @pl.when(canp)
        def _():
            pltpu.make_async_copy(
                wbuf.at[jax.lax.rem(row, 2)],
                wblock(pool_out_ref, pidp, blkp),
                wsem.at[jax.lax.rem(row, 2)],
            ).wait()

    def row_geometry(row):
        tot = seq_lens_ref[row]
        n_pages = jax.lax.div(tot + page - 1, page)
        if window > 0:
            p0 = jnp.maximum(tot + 1 - window, 0) // page
        else:
            p0 = 0
        return tot, p0, n_pages

    def dma(slot, i, row):
        pid = jnp.maximum(block_tables_ref[row, i], 0)
        return pltpu.make_async_copy(
            pool_ref.at[layer, pid], buf.at[slot], sems.at[slot]
        )

    def prefetch_first(row):
        """Row `row`'s FIRST page -> its nbuf half, issued a whole row
        early (at the PREVIOUS row's start). Serving rows are 1-2 pages,
        so the first-page DMA latency IS the row's critical path when it
        only leads by the predecessor's epilogue — all rows' page-0 used
        to share ring slot q0%ring, which serialized exactly that way.
        Unconditional (clamped pid): a 0-page row's garbage masks out via
        pos < total, and a conditional DMA would leave nsems unsignaled
        for the unconditional wait."""
        _, q0r, _ = row_geometry(row)
        pid = jnp.maximum(
            block_tables_ref[row, jnp.minimum(q0r, block_tables_ref.shape[1] - 1)],
            0,
        )
        pltpu.make_async_copy(
            pool_ref.at[layer, pid],
            nbuf.at[jax.lax.rem(row, 2)],
            nsems.at[jax.lax.rem(row, 2)],
        ).start()

    def fill_rest(row):
        """Prime ring slots with row's pages q0+1..q0+ring (page q0 rides
        nbuf via prefetch_first)."""
        _, q0, np_r = row_geometry(row)
        for w in range(1, ring + 1):
            @pl.when(q0 + w < np_r)
            def _():
                dma(jax.lax.rem(q0 + w, ring), q0 + w, row).start()

    @pl.when(g == 0)
    def _():
        prefetch_first(0)
        fill_rest(0)

    for r in range(RB):
        row = g * RB + r
        pid_new, off_new, blk0, can_write = slot_geom(row)

        # issue the NEXT row's first page now: a full row of compute +
        # RMW hides its DMA latency (the epilogue-only lead was ~1 us
        # short per row — 40% of the kernel at 1-page serving contexts)
        if r + 1 < RB:
            prefetch_first(row + 1)
        else:
            @pl.when(row + 1 < B)
            def _():
                prefetch_first(row + 1)

        # retire row-2's write just before ITS wbuf half (row % 2) is
        # reused by this row's RMW read: retiring row-1 here would wait
        # on a DMA issued at the END of the immediately preceding
        # iteration (zero work in between, serializing every write);
        # row-2's write has a full row of attention to hide behind
        if 2 - r <= 0:
            retire_write(row - 2)
        else:
            gmin = (2 - r + RB - 1) // RB  # smallest g with row >= 2
            @pl.when(g >= gmin)
            def _():
                retire_write(row - 2)

        @pl.when(can_write)
        def _():
            pltpu.make_async_copy(
                wblock(pool_ref, pid_new, blk0),
                wbuf.at[jax.lax.rem(row, 2)], rsem,
            ).start()

        tot_b, p0, n_pages = row_geometry(row)
        # bf16 MXU operands, f32 accumulation (see _pool_bf16); scale
        # folds into the f32 product so q is not re-rounded
        q = q_ref[r].astype(jnp.bfloat16)  # [H, C]

        def attend_page(rows_k, rows_v, i, carry, tot_b=tot_b):
            m, l, acc = carry
            pos = i * page + jax.lax.broadcasted_iota(
                jnp.int32, (1, page), 1
            )
            valid = pos < tot_b
            s = jax.lax.dot_general(
                q, rows_k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if softcap > 0.0:
                s = jnp.tanh(s / softcap) * softcap
            if window > 0:
                valid = valid & (pos >= tot_b + 1 - window)
            s = jnp.where(valid, s, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv_full = jax.lax.dot_general(
                p.astype(jnp.bfloat16), rows_v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if nofold:
                # merged 1-"head" latent (MLA): identity fold, skip it
                pv = pv_full
            else:
                pv = jax.lax.dot_general(
                    (pv_full * mask_ref[...]).astype(jnp.bfloat16),
                    fold_ref[...].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return m_new, l_new, acc * alpha + pv

        def load_halves(ref):
            if khalf:
                # ref-level lane slices (Mosaic rejects sliced values
                # feeding dots): half the MXU passes per dot
                return _pool_bf16(ref[:, :khalf]), _pool_bf16(ref[:, khalf:])
            rows = _pool_bf16(ref[...])
            return rows, rows

        def body(i, carry, row=row, n_pages=n_pages):
            slot = jax.lax.rem(i, ring)
            dma(slot, i, row).wait()
            out = attend_page(*load_halves(buf.at[slot]), i, carry)

            @pl.when(i + ring < n_pages)
            def _():
                dma(slot, i + ring, row).start()

            return out

        m0 = jnp.full((H, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((H, 1), jnp.float32)
        acc0 = jnp.zeros((H, D), jnp.float32)
        # peeled first page from the cross-row prefetch buffer; its
        # unconditional garbage when the row has no pages masks out via
        # pos < total
        pltpu.make_async_copy(
            pool_ref.at[layer, 0],
            nbuf.at[jax.lax.rem(row, 2)],
            nsems.at[jax.lax.rem(row, 2)],
        ).wait()
        m, l, acc = attend_page(
            *load_halves(nbuf.at[jax.lax.rem(row, 2)]), p0, (m0, l0, acc0)
        )
        m, l, acc = jax.lax.fori_loop(p0 + 1, n_pages, body, (m, l, acc))

        # the new token's own column, straight from VMEM (never read back
        # from HBM): one extra online-softmax block of width 1. VPU
        # row-sum, not a dot — Mosaic cannot lower a width-1 bf16
        # dot_general ('vector.broadcast' element-type verify failure)
        if khalf:
            new_k = _pool_f32(newkv_ref[r, :, :khalf])
            new_v = _pool_f32(newkv_ref[r, :, khalf:])
        else:
            new_k = new_v = _pool_f32(newkv_ref[r])  # [1, C] f32
        s_new = jnp.sum(
            q.astype(jnp.float32) * new_k, axis=-1, keepdims=True
        ) * scale  # [H, 1]
        if softcap > 0.0:
            s_new = jnp.tanh(s_new / softcap) * softcap
        m_f = jnp.maximum(m, s_new)
        p_new = jnp.exp(s_new - m_f)  # [H, 1]
        alpha = jnp.exp(m - m_f)
        l_f = l * alpha + p_new
        if nofold:
            pv_new = p_new * new_v  # [H, D] (identity fold)
        else:
            pv_new = jax.lax.dot_general(
                ((p_new * new_v) * mask_ref[...]).astype(jnp.bfloat16),
                fold_ref[...].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H, D]
        acc_f = acc * alpha + pv_new

        # keep the ring primed through the row/block boundary (pages
        # beyond the prefetched first one)
        if r + 1 < RB:
            fill_rest(row + 1)
        else:
            @pl.when(g + 1 < G)
            def _():
                fill_rest(row + 1)

        o_ref[r] = (acc_f / jnp.maximum(l_f, 1e-30)).astype(o_ref.dtype)

        @pl.when(can_write)
        def _():
            pltpu.make_async_copy(
                wblock(pool_ref, pid_new, blk0),
                wbuf.at[jax.lax.rem(row, 2)], rsem,
            ).wait()
            row_in_blk = off_new - blk0
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (align, wbuf.shape[2]), 0
            )
            wbuf[jax.lax.rem(row, 2)] = jnp.where(
                rows == row_in_blk, newkv_ref[r].astype(wbuf.dtype),
                wbuf[jax.lax.rem(row, 2)],
            )
            pltpu.make_async_copy(
                wbuf.at[jax.lax.rem(row, 2)],
                wblock(pool_out_ref, pid_new, blk0),
                wsem.at[jax.lax.rem(row, 2)],
            ).start()

    # the last TWO rows' writes have no successor-plus-2 to retire them
    @pl.when(g + 1 >= G)
    def _():
        if B >= 2:
            retire_write(B - 2)
        retire_write(B - 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size", "kv_heads", "head_dim", "split_kv", "scale",
        "interpret", "group", "window", "softcap",
    ),
)
def attend_decode_fused(
    q: jnp.ndarray,  # [B, H, D]
    pool: jnp.ndarray,  # [L, P, page, M] (aliased: returned updated)
    layer: jnp.ndarray,  # scalar i32
    k: jnp.ndarray,  # [B, KV, D] new token K
    v: Optional[jnp.ndarray],  # [B, KV, D] new token V (None = merged MLA)
    block_tables: jnp.ndarray,  # [B, mp] int32
    seq_lens: jnp.ndarray,  # [B] int32 (context excluding the new token)
    valid: jnp.ndarray,  # [B] bool
    page_size: int,
    kv_heads: int,
    head_dim: int,
    split_kv: bool = True,
    scale: Optional[float] = None,
    interpret: bool = False,
    group: Optional[int] = None,
    head_offset=0,
    window: int = 0,
    softcap: float = 0.0,
):
    """-> (out [B, H, D], pool updated in place via aliasing)."""
    from chitu_tpu.ops.attention import pack_kv

    B, H, D = q.shape
    L, P, page, M = pool.shape
    assert page == page_size and D == head_dim
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    isz = pool.dtype.itemsize
    # budget the ring AFTER the kernel's other page-sized scratch: the
    # nbuf cross-row prefetch (2 pages) and the wbuf RMW blocks — a ring
    # sized against the raw budget blew the 16 MB scoped VMEM for
    # dense-cache geometries that previously compiled
    extra = (2 * page + 2 * min(page, 8)) * M * isz
    ring = min(
        _fit_ring(page, M, isz, max(VMEM_BUDGET // 2 - extra, 0)),
        max(block_tables.shape[-1], 2),
    )
    # multi-row grid blocks: per-grid-step fixed cost dominates at
    # serving context lengths (1-2 pages/row), so amortize it over RB rows
    RB = min(8, B)
    B_pad = (B + RB - 1) // RB * RB

    # K|V-halves fast path (see attend_decode): half-width q/mask/fold
    khalf = kv_heads * D if split_kv and (kv_heads * D) % 128 == 0 else 0
    Mq = khalf if khalf else M
    q_exp = _expand_q(
        q, kv_heads, Mq, group, head_offset, split_kv and not khalf
    )
    nofold = (not split_kv) and kv_heads == 1 and M == D
    if nofold:
        mask = jnp.ones((1, 1), jnp.float32)
        fold = jnp.ones((1, 1), jnp.float32)
    else:
        mask = _head_block_mask(
            H, kv_heads, D, Mq, group, head_offset, split_kv and not khalf
        )
        fold = jnp.asarray(
            _fold_matrix(kv_heads, D, Mq, split_kv and not khalf)
        )
    from chitu_tpu.models.common import kv_encode

    newkv = kv_encode(pack_kv(k, v, M), pool.dtype)[:, None, :]  # [B, 1, M]
    layer_arr = jnp.reshape(jnp.asarray(layer, jnp.int32), (1,))
    if B_pad != B:
        padr = B_pad - B
        q_exp = jnp.pad(q_exp, ((0, padr), (0, 0), (0, 0)))
        newkv = jnp.pad(newkv, ((0, padr), (0, 0), (0, 0)))
        block_tables = jnp.pad(
            block_tables, ((0, padr), (0, 0)), constant_values=-1
        )
        seq_lens = jnp.pad(seq_lens, ((0, padr),))
        valid = jnp.pad(valid, ((0, padr),))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B_pad // RB,),
        in_specs=[
            pl.BlockSpec(
                (RB, H, Mq), lambda b, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (RB, 1, M), lambda b, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (RB, H, D), lambda b, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((ring, page, M), pool.dtype),
            pltpu.SemaphoreType.DMA((ring,)),
            pltpu.VMEM((2, min(page, 8), M), pool.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, page, M), pool.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _decode_fused_kernel, page=page, scale=scale, split_kv=split_kv,
        ring=ring, rows_block=RB, window=window, softcap=softcap,
        khalf=khalf, nofold=nofold,
    )
    out, pool = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B_pad, H, D), q.dtype),
            jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        ],
        grid_spec=grid_spec,
        # alias the pool input (operand 6 counting the 4 scalar-prefetch
        # refs + q + newkv) onto the pool output
        input_output_aliases={6: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        block_tables, seq_lens, layer_arr, valid.astype(jnp.int32),
        q_exp, newkv, pool, mask, fold,
    )
    return out[:B], pool


# ---------------------------------------------------------------------------
# Prefill kernels
#
# Two variants (r5, VERDICT r4 next-5):
# - GROUPED (GQA/MHA, head_dim % 128 == 0): queries arrive KV-major
#   [KV, Tq, G, D]; each KV head's G query heads dot ONLY their own
#   128-lane-aligned K/V slice of the page row. No expanded-q copies, no
#   mask/fold matmuls, 1/KV of the old score MACs, and a q block KV x
#   smaller in VMEM (so Tq grows 8x at the 3B geometry -> 8x fewer
#   whole-context page re-reads). This was the 0.46-MFU ceiling the r4
#   xplane attribution pointed at ("expanded-query GQA attention").
# - EXPANDED (fallback): head_dim not lane-aligned (64-wide heads) or a
#   dynamic head offset (shard_map unsharded-pool path) — the original
#   expand/mask/fold formulation. MLA's merged latent (nofold) also
#   stays here: its 1-"head" row is already optimal.
# ---------------------------------------------------------------------------


def _grouped_eligible(
    split_kv: bool, kv_heads: int, head_dim: int, H: int,
    group, head_offset,
) -> bool:
    if not split_kv or head_dim % 128 != 0:
        return False
    if not isinstance(head_offset, int) or head_offset != 0:
        return False  # dynamic offsets keep the expanded layout
    G = group or (H // kv_heads)
    return G > 0 and H == kv_heads * G


def _fit_q_block_grouped(T: int, H: int, page: int, D: int) -> int:
    """Grouped-kernel q block: per-row footprint uses D (not KV*D)."""
    per_row = H * (14 * D + 4 * page)
    tq = min(T, Q_BLOCK)
    while tq > 8 and tq * per_row > VMEM_BUDGET // 2:
        tq //= 2
    return tq


def _grouped_inner(
    q_ref,  # [KV, Tq, G, D] VMEM block
    buf,  # [ring, page, M] VMEM scratch
    dma,  # fn(slot, i) -> async copy
    o_ref,  # [KV, Tq, G, D] VMEM block
    *,
    page: int,
    scale: float,
    ring: int,
    window: int,
    softcap: float,
    khalf: int,
    q_start,
    total,
    p0,
    n_pages,
):
    """Shared page loop of the grouped prefill kernels: per-KV-head
    online softmax over [Tq*G, D] x [D, page] dots."""
    KV, Tq, G, D = q_ref.shape
    TG = Tq * G
    row_t = jax.lax.broadcasted_iota(jnp.int32, (TG, 1), 0) // G
    q_pos = q_start + row_t  # [TG, 1]
    qs = [q_ref[h].astype(jnp.bfloat16).reshape(TG, D) for h in range(KV)]

    def body(i, carry):
        ms, ls, accs = carry
        slot = jax.lax.rem(i, ring)
        dma(slot, i).wait()
        kpos = i * page + jax.lax.broadcasted_iota(jnp.int32, (1, page), 1)
        keep = (kpos < total) & (kpos <= q_pos)
        if window > 0:
            keep = keep & (kpos > q_pos - window)
        new_m, new_l, new_acc = [], [], []
        for h in range(KV):
            rows_k = _pool_bf16(buf[slot, :, h * D : (h + 1) * D])
            rows_v = _pool_bf16(
                buf[slot, :, khalf + h * D : khalf + (h + 1) * D]
            )
            s = jax.lax.dot_general(
                qs[h], rows_k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [TG, page]
            if softcap > 0.0:
                s = jnp.tanh(s / softcap) * softcap
            s = jnp.where(keep, s, NEG_INF)
            m_new = jnp.maximum(ms[h], jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(ms[h] - m_new)
            new_m.append(m_new)
            new_l.append(ls[h] * alpha + jnp.sum(p, axis=-1, keepdims=True))
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), rows_v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            new_acc.append(accs[h] * alpha + pv)

        @pl.when(i + ring < n_pages)
        def _():
            dma(slot, i + ring).start()

        return tuple(new_m), tuple(new_l), tuple(new_acc)

    m0 = tuple(jnp.full((TG, 1), NEG_INF, jnp.float32) for _ in range(KV))
    l0 = tuple(jnp.zeros((TG, 1), jnp.float32) for _ in range(KV))
    a0 = tuple(jnp.zeros((TG, D), jnp.float32) for _ in range(KV))
    ms, ls, accs = jax.lax.fori_loop(p0, n_pages, body, (m0, l0, a0))
    for h in range(KV):
        out = accs[h] / jnp.maximum(ls[h], 1e-30)
        o_ref[h] = out.reshape(Tq, G, D).astype(o_ref.dtype)


def _prefill_grouped_kernel(
    block_table_ref,  # [mp] int32
    info_ref,  # [3] int32: (total_len, q_start, layer)
    q_ref,  # [KV, Tq, G, D] VMEM block
    pool_ref,  # [L, P, page, M] ANY
    o_ref,  # [KV, Tq, G, D] VMEM block
    buf,
    sems,
    *,
    page: int,
    scale: float,
    ring: int,
    window: int = 0,
    softcap: float = 0.0,
    khalf: int = 0,
):
    qb = pl.program_id(0)
    total = info_ref[0]
    Tq = q_ref.shape[1]
    q_start = info_ref[1] + qb * Tq
    layer = info_ref[2]
    last_pos = jnp.minimum(q_start + Tq, total)
    n_pages = jax.lax.div(last_pos + page - 1, page)
    p0 = (
        jnp.maximum(q_start - window + 1, 0) // page if window > 0 else 0
    )

    def dma(slot, i):
        pid = jnp.maximum(block_table_ref[i], 0)
        return pltpu.make_async_copy(
            pool_ref.at[layer, pid], buf.at[slot], sems.at[slot]
        )

    for w in range(ring):
        @pl.when(p0 + w < n_pages)
        def _():
            dma(jax.lax.rem(p0 + w, ring), p0 + w).start()

    _grouped_inner(
        q_ref, buf, dma, o_ref, page=page, scale=scale, ring=ring,
        window=window, softcap=softcap, khalf=khalf, q_start=q_start,
        total=total, p0=p0, n_pages=n_pages,
    )


def _prefill_kernel(
    block_table_ref,  # [mp] int32
    info_ref,  # [3] int32: (total_len, q_start, layer)
    q_ref,  # [Tq, H, C] VMEM block
    pool_ref,  # [L, P, page, M]
    mask_ref,  # [H, C]
    fold_ref,  # [C, D]
    o_ref,  # [Tq, H, D] VMEM block
    buf,
    sems,
    *,
    page: int,
    heads: int,
    scale: float,
    split_kv: bool,
    ring: int,
    window: int = 0,
    softcap: float = 0.0,
    khalf: int = 0,
    nofold: bool = False,
):
    qb = pl.program_id(0)
    total = info_ref[0]
    Tq = q_ref.shape[0]
    q_start = info_ref[1] + qb * Tq
    layer = info_ref[2]
    H = heads
    D = o_ref.shape[2]
    C = q_ref.shape[2]

    # causal: this q block only needs pages up to its last row's position
    last_pos = jnp.minimum(q_start + Tq, total)
    n_pages = jax.lax.div(last_pos + page - 1, page)
    # sliding window: the earliest position any row in this block can see
    if window > 0:
        p0 = jnp.maximum(q_start - window + 1, 0) // page
    else:
        p0 = 0

    def dma(slot, i):
        pid = jnp.maximum(block_table_ref[i], 0)
        return pltpu.make_async_copy(
            pool_ref.at[layer, pid], buf.at[slot], sems.at[slot]
        )

    for w in range(ring):
        @pl.when(p0 + w < n_pages)
        def _():
            dma(jax.lax.rem(p0 + w, ring), p0 + w).start()

    # bf16 MXU operands, f32 accumulation; scale folds into the product
    q = q_ref[...].astype(jnp.bfloat16).reshape(Tq * H, C)
    row_t = jax.lax.broadcasted_iota(jnp.int32, (Tq * H, 1), 0) // H
    q_pos = q_start + row_t  # [Tq*H, 1]
    mask_tc = None if nofold else jnp.broadcast_to(
        mask_ref[...][None, :, :], (Tq, H, C)
    ).reshape(Tq * H, C)

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, ring)
        dma(slot, i).wait()

        if khalf:
            # K|V halves layout: each dot contracts only its half
            rows_k = _pool_bf16(buf[slot, :, :khalf])
            rows_v = _pool_bf16(buf[slot, :, khalf:])
        else:
            rows_k = rows_v = _pool_bf16(buf[slot])  # [page, M]
        kpos = i * page + jax.lax.broadcasted_iota(jnp.int32, (1, page), 1)
        keep = (kpos < total) & (kpos <= q_pos)  # [Tq*H, page]

        s = jax.lax.dot_general(
            q, rows_k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if softcap > 0.0:
            s = jnp.tanh(s / softcap) * softcap
        if window > 0:
            keep = keep & (kpos > q_pos - window)
        s = jnp.where(keep, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv_full = jax.lax.dot_general(
            p.astype(jnp.bfloat16), rows_v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if nofold:
            # merged 1-"head" latent (MLA): identity fold, skip it
            pv = pv_full
        else:
            pv = jax.lax.dot_general(
                (pv_full * mask_tc).astype(jnp.bfloat16),
                fold_ref[...].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(i + ring < n_pages)
        def _():
            dma(slot, i + ring).start()

        return m_new, l_new, acc * alpha + pv

    TH = Tq * H
    m0 = jnp.full((TH, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((TH, 1), jnp.float32)
    acc0 = jnp.zeros((TH, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(p0, n_pages, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[...] = out.reshape(Tq, H, D).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size", "kv_heads", "head_dim", "split_kv", "scale",
        "interpret", "group", "window", "softcap",
    ),
)
def attend_prefill(
    q: jnp.ndarray,  # [T, H, D]
    pool: jnp.ndarray,  # [L, P, page, M]
    layer: jnp.ndarray,  # scalar i32
    block_table: jnp.ndarray,  # [mp]
    q_pos: jnp.ndarray,  # [T] absolute positions (consecutive from q_pos[0])
    total_len: jnp.ndarray,  # scalar
    page_size: int,
    kv_heads: int,
    head_dim: int,
    split_kv: bool = True,
    scale: Optional[float] = None,
    interpret: bool = False,
    group: Optional[int] = None,
    head_offset=0,
    window: int = 0,
    softcap: float = 0.0,
) -> jnp.ndarray:
    T, H, D = q.shape
    L, P, page, M = pool.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    ring = min(
        _fit_ring(page, M, pool.dtype.itemsize, VMEM_BUDGET // 2),
        max(block_table.shape[-1], 2),
    )

    if _grouped_eligible(split_kv, kv_heads, D, H, group, head_offset):
        KV = kv_heads
        G = H // KV
        Tq = _fit_q_block_grouped(T, H, page, D)
        assert T % Tq == 0, f"prefill chunk {T} must be a multiple of {Tq}"
        q_g = jnp.transpose(
            q.reshape(T, KV, G, D), (1, 0, 2, 3)
        )  # [KV, T, G, D]
        info = jnp.stack(
            [
                jnp.asarray(total_len, jnp.int32),
                q_pos[0].astype(jnp.int32),
                jnp.asarray(layer, jnp.int32),
            ]
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T // Tq,),
            in_specs=[
                pl.BlockSpec(
                    (KV, Tq, G, D), lambda i, *_: (0, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (KV, Tq, G, D), lambda i, *_: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((ring, page, M), pool.dtype),
                pltpu.SemaphoreType.DMA((ring,)),
            ],
        )
        kernel = functools.partial(
            _prefill_grouped_kernel, page=page, scale=scale, ring=ring,
            window=window, softcap=softcap, khalf=KV * D,
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((KV, T, G, D), q.dtype),
            grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(block_table, info, q_g, pool)
        return jnp.transpose(out, (1, 0, 2, 3)).reshape(T, H, D)

    Tq = _fit_q_block(T, H, M, page, D)
    assert T % Tq == 0, f"prefill chunk {T} must be a multiple of {Tq}"

    khalf = kv_heads * D if split_kv and (kv_heads * D) % 128 == 0 else 0
    Mq = khalf if khalf else M
    q_exp = _expand_q(
        q, kv_heads, Mq, group, head_offset, split_kv and not khalf
    )
    nofold = (not split_kv) and kv_heads == 1 and M == D
    if nofold:
        mask = jnp.ones((1, 1), jnp.float32)
        fold = jnp.ones((1, 1), jnp.float32)
    else:
        mask = _head_block_mask(
            H, kv_heads, D, Mq, group, head_offset, split_kv and not khalf
        )
        fold = jnp.asarray(
            _fold_matrix(kv_heads, D, Mq, split_kv and not khalf)
        )
    info = jnp.stack(
        [
            jnp.asarray(total_len, jnp.int32),
            q_pos[0].astype(jnp.int32),
            jnp.asarray(layer, jnp.int32),
        ]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T // Tq,),
        in_specs=[
            pl.BlockSpec(
                (Tq, H, Mq), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Tq, H, D), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((ring, page, M), pool.dtype),
            pltpu.SemaphoreType.DMA((ring,)),
        ],
    )
    kernel = functools.partial(
        _prefill_kernel,
        page=page,
        heads=H,
        scale=scale,
        split_kv=split_kv,
        ring=ring,
        window=window,
        softcap=softcap,
        khalf=khalf,
        nofold=nofold,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, H, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(block_table, info, q_exp, pool, mask, fold)


# ---------------------------------------------------------------------------
# Packed varlen prefill kernel: R ragged prompts in ONE call
# ---------------------------------------------------------------------------


def packed_q_block(
    H: int, M: int, page: int, D: int,
    kv_heads: Optional[int] = None, split_kv: bool = True,
) -> int:
    """Query-block granularity for packed prefill: each request's tokens
    are padded to a multiple of this so every grid block belongs to
    exactly one segment (the moe-align trick applied to attention).

    When the grouped kernel applies (kv_heads given, lane-aligned
    heads) the fit uses its KV x smaller per-row footprint — at the 3B
    geometry that takes Tq from 8 to 64, cutting whole-context page
    re-reads 8x (the r4 prefill-MFU ceiling)."""
    if kv_heads and _grouped_eligible(split_kv, kv_heads, D, H, None, 0):
        return _fit_q_block_grouped(1 << 30, H, page, D)
    return _fit_q_block(1 << 30, H, M, page, D)


def _prefill_packed_fused_kernel(
    bt_ref,  # [R, mp] int32 (scalar prefetch)
    seg_ref,  # [NB] int32 block -> segment (-1 = dead/pad block)
    qstart_ref,  # [NB] int32 block's first-row position within its seq
    total_ref,  # [R] int32 per-segment total context length
    layer_ref,  # [1] int32
    q_ref,  # [KV, Tq, G, D] VMEM block
    newkv_ref,  # [Tq, M] VMEM block: this block's packed page rows
    pool_ref,  # [L, P, page, M] ANY (aliased to pool_out_ref)
    o_ref,  # [KV, Tq, G, D]
    pool_out_ref,  # same buffer as pool_ref
    buf,
    sems,
    abuf,  # [Tq, M] VMEM: RMW append staging
    asem,  # DMA semaphore for the append RMW
    *,
    page: int,
    scale: float,
    ring: int,
    window: int = 0,
    softcap: float = 0.0,
    khalf: int = 0,
):
    """Grouped packed prefill with IN-KERNEL KV append (r5): the block's
    fresh rows land in their page via one aligned RMW DMA before the
    attend page loop reads them back — no XLA scatter per layer (9% of
    the r4 3B prefill step). Structural contract from the executor's
    packed slab: q_start is a Tq multiple and page % Tq == 0, so a
    block's rows never cross a page and the RMW range is row-aligned."""
    b = pl.program_id(0)
    seg = seg_ref[b]
    live = seg >= 0
    ss = jnp.maximum(seg, 0)

    @pl.when(jnp.logical_not(live))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(live)
    def _():
        total = total_ref[ss]
        q_start = qstart_ref[b]
        layer = layer_ref[0]
        Tq = q_ref.shape[1]

        # -- append: RMW the aligned [Tq, M] row range of the one page
        # this block's tokens occupy (rows past `total` keep their old
        # pool contents — same semantics as the masked XLA scatter)
        nw = jnp.clip(total - q_start, 0, Tq)
        pidx = jnp.maximum(bt_ref[ss, q_start // page], 0)
        # q_start is a Tq multiple (slab contract), so the page-relative
        # offset is too — the hint lets Mosaic prove sublane alignment
        r0 = pl.multiple_of(
            q_start - (q_start // page) * page, min(Tq, 8)
        )

        @pl.when(nw > 0)
        def _():
            rd = pltpu.make_async_copy(
                pool_ref.at[layer, pidx, pl.ds(r0, Tq)], abuf, asem
            )
            rd.start()
            rd.wait()
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (Tq, 1), 0
            )
            abuf[...] = jnp.where(rows < nw, newkv_ref[...], abuf[...])
            wr = pltpu.make_async_copy(
                abuf, pool_out_ref.at[layer, pidx, pl.ds(r0, Tq)], asem
            )
            wr.start()
            wr.wait()

        # -- attend over the context INCLUDING the fresh rows
        last_pos = jnp.minimum(q_start + Tq, total)
        n_pages = jax.lax.div(last_pos + page - 1, page)
        p0 = (
            jnp.maximum(q_start - window + 1, 0) // page
            if window > 0
            else 0
        )

        def dma(slot, i):
            pid = jnp.maximum(bt_ref[ss, i], 0)
            return pltpu.make_async_copy(
                pool_out_ref.at[layer, pid], buf.at[slot], sems.at[slot]
            )

        for w in range(ring):
            @pl.when(p0 + w < n_pages)
            def _():
                dma(jax.lax.rem(p0 + w, ring), p0 + w).start()

        _grouped_inner(
            q_ref, buf, dma, o_ref, page=page, scale=scale, ring=ring,
            window=window, softcap=softcap, khalf=khalf, q_start=q_start,
            total=total, p0=p0, n_pages=n_pages,
        )


def prefill_packed_fused_ok(
    split_kv: bool, kv_heads: int, head_dim: int, H: int,
    page: int, Tq: int,
) -> bool:
    """Caller gate for the fused append+attend packed prefill: grouped
    layout + the slab's structural alignment (q_start multiples of Tq,
    blocks never spanning pages)."""
    return (
        _grouped_eligible(split_kv, kv_heads, head_dim, H, None, 0)
        and Tq > 0
        and page % Tq == 0
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size", "kv_heads", "head_dim", "split_kv", "scale",
        "interpret", "window", "softcap",
    ),
)
def attend_prefill_packed_fused(
    q: jnp.ndarray,  # [T, H, D]
    pool: jnp.ndarray,  # [L, P, page, M]
    layer: jnp.ndarray,  # scalar i32
    k: jnp.ndarray,  # [T, KV, D] fresh keys (packed rows)
    v: jnp.ndarray,  # [T, KV, D] fresh values
    block_tables: jnp.ndarray,  # [R, mp] int32
    block_seg: jnp.ndarray,  # [NB] int32
    block_qstart: jnp.ndarray,  # [NB] int32
    total_lens: jnp.ndarray,  # [R] int32
    page_size: int,
    kv_heads: int,
    head_dim: int,
    split_kv: bool = True,
    scale: Optional[float] = None,
    interpret: bool = False,
    window: int = 0,
    softcap: float = 0.0,
):
    """-> (out [T, H, D], pool updated via aliasing). Callers must pass
    the structural contract prefill_packed_fused_ok checks."""
    from chitu_tpu.models.common import kv_encode
    from chitu_tpu.ops.attention import pack_kv

    T, H, D = q.shape
    L, P, page, M = pool.shape
    NB = block_seg.shape[0]
    Tq = T // NB
    assert Tq * NB == T and page % Tq == 0
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    ring = min(
        _fit_ring(page, M, pool.dtype.itemsize, VMEM_BUDGET // 2),
        max(block_tables.shape[-1], 2),
    )
    KV = kv_heads
    G = H // KV
    newkv = kv_encode(pack_kv(k, v, M), pool.dtype)  # [T, M]
    q_g = jnp.transpose(q.reshape(T, KV, G, D), (1, 0, 2, 3))
    layer_arr = jnp.reshape(jnp.asarray(layer, jnp.int32), (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(
                (KV, Tq, G, D), lambda i, *_: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (Tq, M), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (KV, Tq, G, D), lambda i, *_: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((ring, page, M), pool.dtype),
            pltpu.SemaphoreType.DMA((ring,)),
            pltpu.VMEM((Tq, M), pool.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _prefill_packed_fused_kernel, page=page, scale=scale, ring=ring,
        window=window, softcap=softcap, khalf=KV * D,
    )
    out, pool = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((KV, T, G, D), q.dtype),
            jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        ],
        grid_spec=grid_spec,
        # operand order: 5 scalar-prefetch refs, then q, newkv, pool
        input_output_aliases={7: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        block_tables, block_seg, block_qstart, total_lens, layer_arr,
        q_g, newkv, pool,
    )
    return jnp.transpose(out, (1, 0, 2, 3)).reshape(T, H, D), pool


def _prefill_packed_grouped_kernel(
    bt_ref,  # [R, mp] int32 (scalar prefetch)
    seg_ref,  # [NB] int32 block -> segment (-1 = dead/pad block)
    qstart_ref,  # [NB] int32 block's first-row position within its seq
    total_ref,  # [R] int32 per-segment total context length
    layer_ref,  # [1] int32
    q_ref,  # [KV, Tq, G, D] VMEM block
    pool_ref,  # [L, P, page, M] ANY
    o_ref,  # [KV, Tq, G, D]
    buf,
    sems,
    *,
    page: int,
    scale: float,
    ring: int,
    window: int = 0,
    softcap: float = 0.0,
    khalf: int = 0,
):
    b = pl.program_id(0)
    seg = seg_ref[b]
    live = seg >= 0
    ss = jnp.maximum(seg, 0)

    @pl.when(jnp.logical_not(live))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(live)
    def _():
        total = total_ref[ss]
        q_start = qstart_ref[b]
        layer = layer_ref[0]
        Tq = q_ref.shape[1]
        last_pos = jnp.minimum(q_start + Tq, total)
        n_pages = jax.lax.div(last_pos + page - 1, page)
        p0 = (
            jnp.maximum(q_start - window + 1, 0) // page
            if window > 0
            else 0
        )

        def dma(slot, i):
            pid = jnp.maximum(bt_ref[ss, i], 0)
            return pltpu.make_async_copy(
                pool_ref.at[layer, pid], buf.at[slot], sems.at[slot]
            )

        for w in range(ring):
            @pl.when(p0 + w < n_pages)
            def _():
                dma(jax.lax.rem(p0 + w, ring), p0 + w).start()

        _grouped_inner(
            q_ref, buf, dma, o_ref, page=page, scale=scale, ring=ring,
            window=window, softcap=softcap, khalf=khalf, q_start=q_start,
            total=total, p0=p0, n_pages=n_pages,
        )


def _prefill_packed_kernel(
    bt_ref,  # [R, mp] int32 (scalar prefetch)
    seg_ref,  # [NB] int32 block -> segment (-1 = dead/pad block)
    qstart_ref,  # [NB] int32 block's first-row position within its seq
    total_ref,  # [R] int32 per-segment total context length
    layer_ref,  # [1] int32
    q_ref,  # [Tq, H, M] VMEM block
    pool_ref,  # [L, P, page, M] ANY
    mask_ref,  # [H, M]
    fold_ref,  # [M, D]
    o_ref,  # [Tq, H, D]
    buf,
    sems,
    *,
    page: int,
    heads: int,
    scale: float,
    ring: int,
    window: int = 0,
    softcap: float = 0.0,
    khalf: int = 0,
    nofold: bool = False,
):
    b = pl.program_id(0)
    seg = seg_ref[b]
    live = seg >= 0
    ss = jnp.maximum(seg, 0)

    @pl.when(jnp.logical_not(live))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(live)
    def _():
        total = total_ref[ss]
        q_start = qstart_ref[b]
        layer = layer_ref[0]
        Tq = q_ref.shape[0]
        H = heads
        D = o_ref.shape[2]
        M = q_ref.shape[2]

        last_pos = jnp.minimum(q_start + Tq, total)
        n_pages = jax.lax.div(last_pos + page - 1, page)
        if window > 0:
            p0 = jnp.maximum(q_start - window + 1, 0) // page
        else:
            p0 = 0

        def dma(slot, i):
            pid = jnp.maximum(bt_ref[ss, i], 0)
            return pltpu.make_async_copy(
                pool_ref.at[layer, pid], buf.at[slot], sems.at[slot]
            )

        for w in range(ring):
            @pl.when(p0 + w < n_pages)
            def _():
                dma(jax.lax.rem(p0 + w, ring), p0 + w).start()

        # bf16 MXU operands, f32 accumulation; scale folds into the dot
        q = q_ref[...].astype(jnp.bfloat16).reshape(Tq * H, M)
        row_t = jax.lax.broadcasted_iota(jnp.int32, (Tq * H, 1), 0) // H
        q_pos = q_start + row_t
        mask_tc = None if nofold else jnp.broadcast_to(
            mask_ref[...][None, :, :], (Tq, H, M)
        ).reshape(Tq * H, M)

        def body(i, carry):
            m, l, acc = carry
            slot = jax.lax.rem(i, ring)
            dma(slot, i).wait()

            if khalf:
                # K|V halves layout: each dot contracts only its half
                rows_k = _pool_bf16(buf[slot, :, :khalf])
                rows_v = _pool_bf16(buf[slot, :, khalf:])
            else:
                rows_k = rows_v = _pool_bf16(buf[slot])
            kpos = i * page + jax.lax.broadcasted_iota(
                jnp.int32, (1, page), 1
            )
            keep = (kpos < total) & (kpos <= q_pos)

            sc = jax.lax.dot_general(
                q, rows_k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if softcap > 0.0:
                sc = jnp.tanh(sc / softcap) * softcap
            if window > 0:
                keep = keep & (kpos > q_pos - window)
            sc = jnp.where(keep, sc, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
            pr = jnp.exp(sc - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(pr, axis=-1, keepdims=True)
            pv_full = jax.lax.dot_general(
                pr.astype(jnp.bfloat16), rows_v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if nofold:
                # merged 1-"head" latent (MLA): identity fold, skip it
                pv = pv_full
            else:
                pv = jax.lax.dot_general(
                    (pv_full * mask_tc).astype(jnp.bfloat16),
                    fold_ref[...].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            @pl.when(i + ring < n_pages)
            def _():
                dma(slot, i + ring).start()

            return m_new, l_new, acc * alpha + pv

        TH = Tq * H
        m0 = jnp.full((TH, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((TH, 1), jnp.float32)
        acc0 = jnp.zeros((TH, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(p0, n_pages, body, (m0, l0, acc0))
        out = acc / jnp.maximum(l, 1e-30)
        o_ref[...] = out.reshape(Tq, H, D).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size", "kv_heads", "head_dim", "split_kv", "scale",
        "interpret", "group", "window", "softcap",
    ),
)
def attend_prefill_packed(
    q: jnp.ndarray,  # [T, H, D] packed tokens (padded per segment)
    pool: jnp.ndarray,  # [L, P, page, M]
    layer: jnp.ndarray,  # scalar i32
    block_tables: jnp.ndarray,  # [R, mp] int32
    block_seg: jnp.ndarray,  # [NB] int32 (-1 = pad block)
    block_qstart: jnp.ndarray,  # [NB] int32
    total_lens: jnp.ndarray,  # [R] int32
    page_size: int,
    kv_heads: int,
    head_dim: int,
    split_kv: bool = True,
    scale: Optional[float] = None,
    interpret: bool = False,
    group: Optional[int] = None,
    head_offset=0,
    window: int = 0,
    softcap: float = 0.0,
) -> jnp.ndarray:
    """R ragged prompts' chunk attention in one kernel call (the packed
    VarLens contract; reference: chitu/utils.py:84-100, executor.py:118-131
    flash_attn_varlen)."""
    T, H, D = q.shape
    L, P, page, M = pool.shape
    NB = block_seg.shape[0]
    Tq = T // NB
    assert Tq * NB == T
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    ring = min(
        _fit_ring(page, M, pool.dtype.itemsize, VMEM_BUDGET // 2),
        max(block_tables.shape[-1], 2),
    )

    if _grouped_eligible(split_kv, kv_heads, D, H, group, head_offset):
        KV = kv_heads
        G = H // KV
        assert Tq <= _fit_q_block_grouped(1 << 30, H, page, D), (
            f"packed q block {Tq} exceeds the grouped VMEM fit"
        )
        q_g = jnp.transpose(
            q.reshape(T, KV, G, D), (1, 0, 2, 3)
        )  # [KV, T, G, D]
        layer_arr = jnp.reshape(jnp.asarray(layer, jnp.int32), (1,))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec(
                    (KV, Tq, G, D), lambda i, *_: (0, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (KV, Tq, G, D), lambda i, *_: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((ring, page, M), pool.dtype),
                pltpu.SemaphoreType.DMA((ring,)),
            ],
        )
        kernel = functools.partial(
            _prefill_packed_grouped_kernel, page=page, scale=scale,
            ring=ring, window=window, softcap=softcap, khalf=KV * D,
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((KV, T, G, D), q.dtype),
            grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(
            block_tables, block_seg, block_qstart, total_lens, layer_arr,
            q_g, pool,
        )
        return jnp.transpose(out, (1, 0, 2, 3)).reshape(T, H, D)

    assert Tq <= _fit_q_block(1 << 30, H, M, page, D), (
        f"packed q block {Tq} exceeds the VMEM fit"
    )
    khalf = kv_heads * D if split_kv and (kv_heads * D) % 128 == 0 else 0
    Mq = khalf if khalf else M
    q_exp = _expand_q(
        q, kv_heads, Mq, group, head_offset, split_kv and not khalf
    )
    nofold = (not split_kv) and kv_heads == 1 and M == D
    if nofold:
        mask = jnp.ones((1, 1), jnp.float32)
        fold = jnp.ones((1, 1), jnp.float32)
    else:
        mask = _head_block_mask(
            H, kv_heads, D, Mq, group, head_offset, split_kv and not khalf
        )
        fold = jnp.asarray(
            _fold_matrix(kv_heads, D, Mq, split_kv and not khalf)
        )
    layer_arr = jnp.reshape(jnp.asarray(layer, jnp.int32), (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(
                (Tq, H, Mq), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Tq, H, D), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((ring, page, M), pool.dtype),
            pltpu.SemaphoreType.DMA((ring,)),
        ],
    )
    kernel = functools.partial(
        _prefill_packed_kernel, page=page, heads=H, scale=scale, ring=ring,
        window=window, softcap=softcap, khalf=khalf, nofold=nofold,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, H, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        block_tables, block_seg, block_qstart, total_lens, layer_arr,
        q_exp, pool, mask, fold,
    )
