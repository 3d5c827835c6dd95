"""Pallas grouped (expert-indexed) GEMM for the fused-MoE path.

The TPU-native replacement for the reference's token-sorted fused-MoE
kernels (reference: chitu/fused_moe.py:62-307 `fused_moe_kernel` with
in-kernel soft-fp8 PTX dequant at :195-246, and the `moe_align_block_size`
contract :314-610): tokens are argsort-grouped by expert on the XLA side
(models/moe.py sorted_dispatch — the moe-align equivalent), and this kernel
runs one grid step per BM-row block of same-expert rows, computing
``out[block] = xs[block] @ dequant(w[layer, expert[block]])``.

Design (why not BlockSpec-indexed weights): a static grid must cover the
worst-case block count, but only blocks holding real assignments may touch
HBM — with BlockSpec-driven weight fetches every dead block would re-read
an expert's weights (~30 MB at DeepSeek scale). Weights therefore stay in
HBM (`pl.ANY`) and the kernel issues its own double-buffered DMAs, skipped
entirely for dead blocks (`block_expert < 0`). Weight traffic is exactly
(live blocks) x (expert bytes) — for decode that is the active-expert set,
which is what makes weight-only fp8 a bandwidth win at MoE scale.

Quantized experts keep packed int8 lanes in HBM and dequantize per
128-row quant block right before the MXU dot, with rowwise pre-expanded
scales (same algebra as ops/pallas_quant_gemm.py; the fp8-byte bit-
placement trick with the 2^120 rebias folded into scales is applied by the
wrapper when storage is raw e4m3).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chitu_tpu.ops.qtensor import QTensor, QuantKind

import os

QBLK = 128  # quant block size along K (scale row granularity)
# double-buffered weight chunk VMEM budget (env-tunable for tile A/Bs)
W_BUDGET = int(
    os.environ.get("CHITU_TPU_MOE_WBUDGET", str(6 * 1024 * 1024))
)


def _pick_bk(K: int, N: int, itemsize: int) -> int:
    """Largest QBLK-multiple K-chunk whose two DMA buffers fit the budget."""
    if K % QBLK:
        # fail clearly instead of the decrement loop reaching K % 0
        raise ValueError(
            f"grouped_matmul needs K divisible by {QBLK} (got K={K}); "
            "route ineligible stacks through the XLA fallback "
            "(models/moe.kernel_eligible)"
        )
    bk = (K // QBLK) * QBLK
    while bk > QBLK and (2 * bk * N * itemsize > W_BUDGET or K % bk):
        bk -= QBLK
    while K % bk:
        bk -= QBLK
    return max(bk, QBLK)


def _moe_gemm_kernel(
    layer_ref,  # [1] i32 (scalar prefetch)
    be_ref,  # [NB] i32 block -> expert (-1 = dead block)
    x_ref,  # [bm, K] VMEM block (sorted activations)
    w_ref,  # [L, E, K, N] or [E, K, N] ANY/HBM
    s_ref,  # [L, E, nq, N] or [E, nq, N] f32 ANY/HBM (quant only; else absent)
    o_ref,  # [bm, N] VMEM block
    wbuf,  # [2, bk, N] VMEM
    sbuf,  # [nq, N] f32 VMEM (quant only; else absent)
    sems,  # [3] DMA semaphores
    *,
    bk: int,
    nk: int,
    quant: bool,
    fp8_bits: bool,
    stacked: bool,
):
    b = pl.program_id(0)
    NB = pl.num_programs(0)
    e = be_ref[b]
    live = e >= 0
    bm, K = x_ref.shape
    N = o_ref.shape[1]
    groups = bk // QBLK

    @pl.when(jnp.logical_not(live))
    def _():
        # dead blocks must write zeros: under expert parallelism another
        # shard owns these assignments and the combine psum adds all shards
        o_ref[...] = jnp.zeros_like(o_ref)

    # Cross-block DMA pipeline: the chunk sequence c = block*nk + k chains
    # across grid steps through the persistent scratch buffers — while
    # chunk c computes, chunk c+1 (possibly the NEXT block's first chunk,
    # a different expert) is already in flight, so block boundaries cost
    # no DMA stall. The sorted layout guarantees dead blocks form a tail,
    # so the lookahead chain simply stops at the first dead block.
    def chunk_dma(c):
        bb = c // nk
        kk = c - bb * nk
        ee = be_ref[bb]
        src = (
            w_ref.at[layer_ref[0], ee, pl.ds(kk * bk, bk)]
            if stacked
            else w_ref.at[ee, pl.ds(kk * bk, bk)]
        )
        return pltpu.make_async_copy(
            src, wbuf.at[jax.lax.rem(c, 2)], sems.at[jax.lax.rem(c, 2)]
        )

    if quant:

        def scale_dma(bb):
            ee = be_ref[bb]
            src = s_ref.at[layer_ref[0], ee] if stacked else s_ref.at[ee]
            return pltpu.make_async_copy(
                src, sbuf.at[jax.lax.rem(bb, 2)], sems.at[2 + jax.lax.rem(bb, 2)]
            )

    @pl.when(live)
    def _():
        c0 = b * nk

        @pl.when(b == 0)
        def _():
            chunk_dma(0).start()
            if quant:
                scale_dma(0).start()

        # lookahead: next block's scale slab
        if quant:
            @pl.when((b + 1 < NB) & (be_ref[jnp.minimum(b + 1, NB - 1)] >= 0))
            def _():
                scale_dma(b + 1).start()

        def body(ki, acc):
            c = c0 + ki
            b1 = (c + 1) // nk

            @pl.when(
                (c + 1 < NB * nk)
                & (be_ref[jnp.minimum(b1, NB - 1)] >= 0)
            )
            def _():
                chunk_dma(c + 1).start()

            chunk_dma(c).wait()
            if quant:
                @pl.when(ki == 0)
                def _():
                    scale_dma(b).wait()
            slot = jax.lax.rem(c, 2)

            if quant:
                sslot = jax.lax.rem(b, 2)
                # per-quant-block dequant: scale constant along K within a
                # group, so (x @ w_packed) * scale_row == x @ (w * scale)
                for g in range(groups):
                    raw = wbuf[slot, g * QBLK : (g + 1) * QBLK, :]
                    if fp8_bits:
                        from chitu_tpu.ops.kernel_common import (
                            fp8_place_bits,
                        )

                        wg = fp8_place_bits(raw).astype(jnp.bfloat16)
                    else:
                        wg = raw.astype(jnp.bfloat16)
                    xg = x_ref[
                        :, pl.ds(ki * bk + g * QBLK, QBLK)
                    ].astype(jnp.bfloat16)
                    partial = jax.lax.dot_general(
                        xg, wg, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    srow = sbuf[sslot, pl.ds(ki * groups + g, 1), :]
                    acc = acc + partial * srow
            else:
                xg = x_ref[:, pl.ds(ki * bk, bk)].astype(jnp.bfloat16)
                acc = acc + jax.lax.dot_general(
                    xg,
                    wbuf[slot].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return acc

        acc0 = jnp.zeros((bm, N), jnp.float32)
        acc = jax.lax.fori_loop(0, nk, body, acc0)
        o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bm", "quant", "fp8_bits", "stacked", "interpret"),
)
def _grouped_gemm(
    xs: jnp.ndarray,  # [NB*bm, K] sorted activations
    layer: jnp.ndarray,  # scalar i32
    block_expert: jnp.ndarray,  # [NB] i32 (-1 dead)
    data: jnp.ndarray,  # [L, E, K, N] / [E, K, N] packed or bf16
    scale_rows: Optional[jnp.ndarray],  # [L, E, K//QBLK, N] / [E, ..] f32
    bm: int,
    quant: bool,
    fp8_bits: bool,
    stacked: bool,
    interpret: bool,
):
    NB = block_expert.shape[0]
    K, N = data.shape[-2], data.shape[-1]
    bk = _pick_bk(K, N, data.dtype.itemsize)
    nk = K // bk
    layer_arr = jnp.reshape(jnp.asarray(layer, jnp.int32), (1,))

    in_specs = [
        pl.BlockSpec((bm, K), lambda b, *_: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [xs, data]
    scratch = [pltpu.VMEM((2, bk, N), data.dtype)]
    if quant:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(scale_rows)
        # double-buffered scale slabs (next block's scales prefetch while
        # this block computes); rows mirror the sublane-padded slab
        scratch.append(
            pltpu.VMEM((2, scale_rows.shape[-2], N), jnp.float32)
        )
    scratch.append(pltpu.SemaphoreType.DMA((4,)))

    kernel = functools.partial(
        _moe_gemm_kernel,
        bk=bk,
        nk=nk,
        quant=quant,
        fp8_bits=fp8_bits,
        stacked=stacked,
    )
    if not quant:
        # keep the kernel signature uniform: drop the absent refs
        def kernel(layer_ref, be_ref, x_ref, w_ref, o_ref, wbuf, sems):
            return _moe_gemm_kernel(
                layer_ref, be_ref, x_ref, w_ref, None, o_ref, wbuf, None,
                sems, bk=bk, nk=nk, quant=False, fp8_bits=False,
                stacked=stacked,
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, N), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NB * bm, N), jnp.bfloat16),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(layer_arr, block_expert, *operands)


def kernel_eligible(w) -> bool:
    """Can this expert stack run through the grouped kernel?"""
    if isinstance(w, QTensor):
        if w.kind not in (QuantKind.SOFT_FP8, QuantKind.FP8):
            return False
        K, N = w.data.shape[-2], w.data.shape[-1]
        # rowwise [.., nq, N] (requantize_fp8_storage pre-expands on TPU)
        # or blockwise [.., nq, N/block] (expanded at call time — the
        # CPU/interpret engines never run requantize)
        so = w.scale.shape[-1]
        scale_ok = so == N or so * w.block >= N
        return K % QBLK == 0 and N % QBLK == 0 and scale_ok
    K, N = w.shape[-2], w.shape[-1]
    return K % QBLK == 0 and N % QBLK == 0


def grouped_matmul(
    xs: jnp.ndarray,  # [NB*bm, K]
    w,  # QTensor or dense array, [L, E, K, N] or [E, K, N]
    layer,  # scalar i32 (ignored when unstacked)
    block_expert: jnp.ndarray,  # [NB]
    bm: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[b*bm+i] = xs[b*bm+i] @ dequant(w[layer, block_expert[b]])."""
    if isinstance(w, QTensor):
        stacked = w.data.ndim == 4
        data = w.data
        scale_rows = w.scale.astype(jnp.float32)
        fp8_bits = False
        if data.dtype == jnp.float8_e4m3fn:
            data = jax.lax.bitcast_convert_type(data, jnp.int8)
            scale_rows = scale_rows * jnp.float32(2.0**120)
            fp8_bits = True
        N = data.shape[-1]
        if scale_rows.shape[-1] != N:
            # blockwise [.., nq, N/block] -> rowwise [.., nq, N] (XLA
            # fuses the repeat; TPU engines pre-expand on load instead,
            # quantize/transforms.requantize_fp8_storage)
            scale_rows = jnp.repeat(scale_rows, w.block, axis=-1)[..., :N]
        # the kernel DMAs the whole [nq, N] scale slab per block; Mosaic
        # needs the sublane dim 8-aligned (requantize_fp8_storage pre-pads
        # engine-loaded expert stacks, so this pad is a no-op there)
        nq = data.shape[-2] // QBLK
        nq_pad = -(-nq // 8) * 8
        if scale_rows.shape[-2] < nq_pad:
            widths = [(0, 0)] * scale_rows.ndim
            widths[-2] = (0, nq_pad - scale_rows.shape[-2])
            scale_rows = jnp.pad(scale_rows, widths)
        return _grouped_gemm(
            xs, layer if stacked else 0, block_expert, data, scale_rows,
            bm=bm, quant=True, fp8_bits=fp8_bits, stacked=stacked,
            interpret=interpret,
        )
    stacked = w.ndim == 4
    return _grouped_gemm(
        xs, layer if stacked else 0, block_expert,
        w.astype(jnp.bfloat16), None,
        bm=bm, quant=False, fp8_bits=False, stacked=stacked,
        interpret=interpret,
    )
