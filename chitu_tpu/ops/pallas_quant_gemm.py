"""Pallas fused dequant+matmul kernels (the quantization ladder's hot path).

Capability parity with the reference's quantized GEMM zoo
(reference: soft-fp8 Triton GEMM with inline-PTX byte unpacking,
chitu/triton_kernels.py:368-508; fp8 blockwise GEMM :290-365; EETQ W8A16,
AWQ W4A16, W8A8 — SURVEY.md §2.6). TPU-native design: weights stay packed
(fp8 / int8 / int4-in-uint8) in HBM and are dequantized to bf16 *inside the
GEMM's K-loop* in VMEM, right before feeding the MXU — the memory pipeline
only ever moves packed bytes, which is the entire point of weight-only
quantization for bandwidth-bound decode (reference: docs/en/FAQ.md:3-11).

Scale handling: blockwise / per-channel scales are pre-expanded to rowwise
[K_blocks, N] (a <=3% extra read) so every grid step multiplies a [1, bn]
row — no sub-128-lane scale tiles.

All kernels match QTensor.dequantize + jnp.dot within bf16 tolerance
(tests/test_pallas_quant_gemm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chitu_tpu.ops.qtensor import QTensor, QuantKind
from chitu_tpu.ops.quant_gemm import register

BM_MAX = 256
BN = 2048
QBLK = 128  # quant block size along K
# tile choice is measured IN-ENGINE, not in isolation: isolated
# layer-scan microbenches prefer BK=512 by 20-40%, but inside the full
# decode program (quant GEMMs interleaved with attention/sampling) the
# same config loses 6% — engine A/B picked BK=1024 x BN=2048 with
# _pick_bn trimming N-padding per shape
BK = 1024  # GEMM K-tile (= GROUPS quant blocks)
GROUPS = BK // QBLK


def _pad_to(x: jnp.ndarray, m: int, axis: int) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pick_bn(N: int) -> int:
    """N-tile: the largest candidate <= BN that minimizes N padding —
    bn=BN blindly pads e.g. N=2560 -> 4096 (60% dead DMA + MXU), erasing
    the wide-tile win. Ties prefer the wider tile."""
    cands = [c for c in (BN, BN // 2, BN // 4, BN // 8) if c >= 128]
    best = min(cands, key=lambda c: (-(-N // c) * c, -c))
    return min(best, N) if N >= 128 else N


def _gemm_kernel(
    x_ref,  # [bm, BK] activation block
    w_ref,  # [BK, bn] packed weights (int8: raw or fp8 bit pattern)
    s_ref,  # [1, GROUPS, bn] per-quant-block rowwise scales
    z_ref,  # [1, GROUPS, bn] rowwise zeros (unused unless asym)
    o_ref,  # [bm, bn]
    acc,  # [bm, bn] f32 scratch
    *,
    n_k: int,
    asym: bool,
    fp8_bits: bool,
    int4_packed: bool,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    if w_ref.ndim == 3:  # stacked variant: [1, BK, bnw] block
        w_ref = w_ref.at[0]
        s_ref = s_ref.at[0]
        z_ref = z_ref.at[0]
    bk, bn_w = w_ref.shape
    bn = bn_w * 2 if int4_packed else bn_w
    groups = bk // QBLK
    # Per-quant-block dequant+matmul with the scale/zero algebra moved OFF
    # the weight elements onto the [bm, bn] accumulator: within one quant
    # block the scale s and zero z are constant along the contraction dim,
    # so  x @ ((w - z) * s) == (x @ w) * s - rowsum(x) (x) (z * s).
    # The per-byte VPU work collapses to a single cast feeding the MXU —
    # that cast is what keeps the pipeline at DMA speed. Lane-aligned
    # slices only (cross-sublane reshapes relayout).
    for g in range(groups):
        raw = w_ref[g * QBLK : (g + 1) * QBLK, :]
        if int4_packed:
            # tile-relative nibble packing: low nibbles are the tile's
            # first half-columns, high nibbles the second — two masks and
            # a lane concat, no interleave
            u = raw.astype(jnp.int32)
            lo = (u & 0xF).astype(jnp.bfloat16)
            hi = ((u >> 4) & 0xF).astype(jnp.bfloat16)
            wg = jnp.concatenate([lo, hi], axis=1)
        elif fp8_bits:
            # e4m3 bytes -> f32 by bit placement: sign to bit 31,
            # exp+mantissa to bits 20..26; the 2^120 exponent re-bias is
            # folded into the scales (the reference's 0x7b800000 trick,
            # chitu/triton_kernels.py:250-287, done with VPU integer ops
            # instead of the slow fp8 cast path)
            from chitu_tpu.ops.kernel_common import fp8_place_bits

            wg = fp8_place_bits(raw).astype(jnp.bfloat16)
        else:
            wg = raw.astype(jnp.bfloat16)
        xg = x_ref[:, g * QBLK : (g + 1) * QBLK].astype(jnp.bfloat16)
        partial = jax.lax.dot_general(
            xg, wg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bm, bn]
        sg = s_ref[0, g : g + 1, :]  # [1, bn]
        if asym:
            xsum = jnp.sum(
                xg.astype(jnp.float32), axis=1, keepdims=True
            )  # [bm, 1]
            acc[...] += partial * sg - xsum * (z_ref[0, g : g + 1, :] * sg)
        else:
            acc[...] += partial * sg

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "asym", "fp8_bits", "int4_packed", "interpret", "out_dtype"
    ),
)
def _quant_gemm(
    x: jnp.ndarray,  # [T, K]
    data: jnp.ndarray,  # [K, N] packed
    scale_rows: jnp.ndarray,  # [K//BK, N] f32
    zero_rows: jnp.ndarray,  # [K//BK, N] f32
    asym: bool = False,
    fp8_bits: bool = False,
    int4_packed: bool = False,
    interpret: bool = False,
    out_dtype=jnp.float32,
):
    T, K = x.shape
    N = data.shape[1] * 2 if int4_packed else data.shape[1]
    bm = min(BM_MAX, max(8, (T + 7) // 8 * 8))
    if int4_packed:
        # nibble packing is relative to PACK_TILE-wide output tiles: the
        # kernel block must be exactly one tile for the lane-concat unpack
        from chitu_tpu.quantize.transforms import PACK_TILE

        bn = PACK_TILE
        assert N % PACK_TILE == 0
    else:
        bn = _pick_bn(N)

    xp = _pad_to(_pad_to(x, bm, 0), BK, 1)
    dp = _pad_to(_pad_to(data, BK, 0), bn // 2 if int4_packed else bn, 1)
    sp = _pad_to(scale_rows, bn, 1)
    zp = _pad_to(zero_rows, bn, 1)
    Tp, Kp = xp.shape
    Np = dp.shape[1] * 2 if int4_packed else dp.shape[1]
    n_k = Kp // BK
    n_qb = n_k * GROUPS
    if sp.shape[0] < n_qb:  # K padding added quant blocks
        sp = _pad_to(sp, n_qb, 0)
        zp = _pad_to(zp, n_qb, 0)
    # [n_k, GROUPS, N]: middle dim full so (1, GROUPS, bn) obeys tiling
    sp = sp.reshape(n_k, GROUPS, -1)
    zp = zp.reshape(n_k, GROUPS, -1)

    grid = (Tp // bm, Np // bn, n_k)
    out = pl.pallas_call(
        functools.partial(
            _gemm_kernel,
            n_k=n_k,
            asym=asym,
            fp8_bits=fp8_bits,
            int4_packed=int4_packed,
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, Np), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (bm, BK), lambda i, j, k: (i, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BK, bn // 2 if int4_packed else bn),
                lambda i, j, k: (k, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, GROUPS, bn),
                lambda i, j, k: (k, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, GROUPS, bn),
                lambda i, j, k: (k, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(xp, dp, sp, zp)
    return out[:T, :N]


def _gemm_kernel_stacked(layer_ref, x_ref, w_ref, s_ref, z_ref, o_ref, acc, **kw):
    # scalar-prefetch layer ref is consumed by the index maps only
    _gemm_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc, **kw)


@functools.partial(
    jax.jit,
    static_argnames=(
        "asym", "fp8_bits", "int4_packed", "interpret", "out_dtype"
    ),
)
def _quant_gemm_stacked(
    x: jnp.ndarray,  # [T, K]
    layer: jnp.ndarray,  # scalar i32
    data: jnp.ndarray,  # [L, K, N] packed (whole stack)
    scale_rows: jnp.ndarray,  # [L, K//QBLK, N] f32
    zero_rows: jnp.ndarray,  # [L, K//QBLK, N] f32
    asym: bool = False,
    fp8_bits: bool = False,
    int4_packed: bool = False,
    interpret: bool = False,
    out_dtype=jnp.float32,
):
    """Layer-indexed variant: the kernel reads blocks of data[layer]
    directly via scalar-prefetched index maps, so the per-layer weight
    slice is never materialized (a pallas operand must be a real buffer —
    slicing stacked weights per scan iteration copies them and multiplies
    HBM traffic)."""
    T, K = x.shape
    L = data.shape[0]
    N = data.shape[2] * 2 if int4_packed else data.shape[2]
    bm = min(BM_MAX, max(8, (T + 7) // 8 * 8))
    if int4_packed:
        from chitu_tpu.quantize.transforms import PACK_TILE

        bn = PACK_TILE
        assert N % PACK_TILE == 0
    else:
        bn = _pick_bn(N)
        while N % bn:
            bn //= 2
        assert bn >= 128, f"stacked gemm needs a 128-multiple tile for {N}"
    bk = BK
    while K % bk:
        bk //= 2
    assert bk >= QBLK, f"stacked gemm needs a {QBLK}-multiple K for {K}"
    groups = bk // QBLK

    xp = _pad_to(x, bm, 0)
    xp = _pad_to(xp, bk, 1) if K % bk else xp
    Tp = xp.shape[0]
    n_k = K // bk
    sp = scale_rows.reshape(L, n_k, groups, N)
    zp = zero_rows.reshape(L, n_k, groups, N)
    layer_arr = jnp.reshape(jnp.asarray(layer, jnp.int32), (1,))

    grid = (Tp // bm, N // bn, n_k)
    bnw = bn // 2 if int4_packed else bn
    out = pl.pallas_call(
        functools.partial(
            _gemm_kernel_stacked,
            n_k=n_k,
            asym=asym,
            fp8_bits=fp8_bits,
            int4_packed=int4_packed,
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, N), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (bm, bk),
                    lambda i, j, k, s: (i, k),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, bk, bnw),
                    lambda i, j, k, s: (s[0], k, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, groups, bn),
                    lambda i, j, k, s: (s[0], k, 0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, groups, bn),
                    lambda i, j, k, s: (s[0], k, 0, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j, k, s: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(layer_arr, xp, data, sp, zp)
    return out[:T]


def _expand_scale_rows(q: QTensor) -> jnp.ndarray:
    """Per-scheme scales -> rowwise [K//BK, N] f32."""
    K, N = q.data.shape[-2], q.data.shape[-1]
    nk = (K + QBLK - 1) // QBLK
    if q.kind in (QuantKind.SOFT_FP8, QuantKind.FP8):
        if q.scale.shape[-1] == N:
            return q.scale.astype(jnp.float32)  # already rowwise
        # [K/B, N/B] -> repeat along N
        s = jnp.repeat(q.scale, q.block, axis=-1)[..., :N]
        return s.astype(jnp.float32)
    if q.kind in (QuantKind.W8A16, QuantKind.W8A8):
        # [N] per-out-channel -> same for every K block
        return jnp.broadcast_to(q.scale[None, :], (nk, N)).astype(jnp.float32)
    if q.kind == QuantKind.W4A16:
        # group == BK along K: scale already [K/G, N]
        return q.scale.astype(jnp.float32)
    raise ValueError(q.kind)


def matmul_stacked(
    x: jnp.ndarray, q: QTensor, layer, interpret: bool = False
):
    """x [.., K] @ dequant(q[layer]) for stacked [L, K, N] QTensors."""
    from chitu_tpu.quantize.transforms import is_packed_int4

    *lead, K = x.shape
    x2 = x.reshape(-1, K)
    L = q.data.shape[0]
    N_logical = q.scale.shape[-1]
    scale_rows = _expand_scale_rows_stacked(q)
    int4_packed = (
        q.kind == QuantKind.W4A16 and q.data.shape[-1] * 2 == N_logical
    )
    data = q.data
    fp8_bits = False
    if (
        q.kind in (QuantKind.SOFT_FP8, QuantKind.FP8)
        and q.data.dtype == jnp.float8_e4m3fn
    ):
        data = jax.lax.bitcast_convert_type(data, jnp.int8)
        scale_rows = scale_rows * jnp.float32(2.0**120)
        fp8_bits = True
    if q.kind == QuantKind.W4A16:
        zero_rows = q.zeros.astype(jnp.float32)
        asym = True
    else:
        zero_rows = jnp.zeros_like(scale_rows)
        asym = False
    y = _quant_gemm_stacked(
        x2, layer, data, scale_rows, zero_rows, asym=asym,
        fp8_bits=fp8_bits, int4_packed=int4_packed, interpret=interpret,
    )
    return y.reshape(*lead, -1)


def _expand_scale_rows_stacked(q: QTensor) -> jnp.ndarray:
    """[L, ...] scales -> rowwise [L, K//QBLK, N] f32 (cheap views only —
    per-call materialization would defeat the point)."""
    L, K = q.data.shape[0], q.data.shape[1]
    N = q.scale.shape[-1]
    nk = K // QBLK
    if q.kind in (QuantKind.SOFT_FP8, QuantKind.FP8):
        assert q.scale.shape[-1] == N and q.scale.ndim == 3, (
            "stacked fp8 needs pre-expanded rowwise scales "
            "(quantize.requantize_fp8_storage)"
        )
        return q.scale.astype(jnp.float32)
    if q.kind == QuantKind.W4A16:
        return q.scale.astype(jnp.float32)
    # W8A16/W8A8 stay on the sliced path (their per-channel scales would
    # materialize L x rowwise copies per call here)
    raise ValueError(q.kind)


def _matmul_impl(x: jnp.ndarray, q: QTensor, interpret: bool = False):
    from chitu_tpu.quantize.transforms import is_packed_int4

    *lead, K = x.shape
    x2 = x.reshape(-1, K)
    scale_rows = _expand_scale_rows(q)
    data = q.data
    fp8_bits = False
    int4_packed = is_packed_int4(q)
    if (
        q.kind in (QuantKind.SOFT_FP8, QuantKind.FP8)
        and q.data.dtype == jnp.float8_e4m3fn
    ):
        # raw fp8 bytes: bit-placement dequant with the 2^120 exponent
        # re-bias folded into the scales (requantize_fp8_storage converts
        # to the faster int8 lanes at engine load on v5e)
        data = jax.lax.bitcast_convert_type(data, jnp.int8)
        scale_rows = scale_rows * jnp.float32(2.0**120)
        fp8_bits = True
    if q.kind == QuantKind.W4A16:
        zero_rows = q.zeros.astype(jnp.float32)  # (w - z) * s
        asym = True
    else:
        zero_rows = jnp.zeros_like(scale_rows)
        asym = False
    y = _quant_gemm(
        x2, data, scale_rows, zero_rows, asym=asym, fp8_bits=fp8_bits,
        int4_packed=int4_packed, interpret=interpret,
    )
    return y.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# W8A8: dynamic per-token int8 activations + int8 weights on the int8 MXU
# (reference: quantize/w8a8.py:18-35 per-token dynamic quant + int8 GEMM)
# ---------------------------------------------------------------------------


def _w8a8_kernel(
    x_ref,  # [bm, BK] int8 activations
    w_ref,  # [BK, bn] int8 weights
    o_ref,  # [bm, bn] int32 partial
    acc,  # [bm, bn] int32 scratch
    *,
    n_k: int,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(
        x_ref[...],
        w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _w8a8_matmul(x: jnp.ndarray, q: QTensor, interpret: bool = False):
    """y = dequant(int8(x) @ int8(w)): per-token dynamic act scales x
    per-out-channel weight scales."""
    *lead, K = x.shape
    x2 = x.reshape(-1, K).astype(jnp.float32)
    N = q.data.shape[-1]
    # per-token symmetric quant
    x_scale = jnp.maximum(jnp.max(jnp.abs(x2), axis=-1), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x2 / x_scale[:, None]), -127, 127).astype(jnp.int8)
    y = _w8a8_matmul_pre(xq, x_scale, q, interpret=interpret)
    return y.reshape(*lead, N)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _w8a8_matmul_pre(
    xq: jnp.ndarray,  # [T, K] int8 (pre-quantized, e.g. fused norm+quant)
    x_scale: jnp.ndarray,  # [T] f32
    q: QTensor,
    interpret: bool = False,
):
    """int8 GEMM with externally quantized activations — the consumer of
    the fused RMSNorm+quant kernel (reference: quantize/muxi_w8a8.py
    (int8, scale) tuples between layers)."""
    T, K = xq.shape
    N = q.data.shape[-1]

    bm = min(BM_MAX, max(32, (T + 31) // 32 * 32))  # int8 sublane tile = 32
    bn = _pick_bn(N)
    xp = _pad_to(_pad_to(xq, bm, 0), BK, 1)
    dp = _pad_to(_pad_to(q.data, BK, 0), bn, 1)
    Tp, Kp = xp.shape
    Np = dp.shape[1]
    n_k = Kp // BK
    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((Tp, Np), jnp.int32),
        grid=(Tp // bm, Np // bn, n_k),
        in_specs=[
            pl.BlockSpec(
                (bm, BK), lambda i, j, k: (i, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BK, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(xp, dp)
    return (
        out[:T, :N].astype(jnp.float32)
        * x_scale[:, None]
        * q.scale[None, :].astype(jnp.float32)
    )


def _wrap(kind):
    def fn(x, q: QTensor):
        from chitu_tpu.ops.pallas_norm_quant import QuantizedActs

        interpret = jax.default_backend() != "tpu"
        if isinstance(x, QuantizedActs):
            assert kind == QuantKind.W8A8 and q.data.ndim == 2
            return _w8a8_matmul_pre(x.data, x.scale, q, interpret=interpret)
        if kind == QuantKind.W8A8 and q.data.ndim == 2:
            return _w8a8_matmul(x, q, interpret=interpret)
        if q.data.ndim != 2 or q.block != QBLK:
            # stacked/odd-block weights fall back to XLA dequant
            return jnp.dot(
                x,
                q.dequantize(jnp.bfloat16).astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
        return _matmul_impl(x, q, interpret=interpret)

    return fn


for _kind in (
    QuantKind.SOFT_FP8,
    QuantKind.FP8,
    QuantKind.W8A16,
    QuantKind.W8A8,
    QuantKind.W4A16,
):
    register(_kind)(_wrap(_kind))


# ---------------------------------------------------------------------------
# Dense stacked-layer GEMM: same kernel-side layer indexing for plain bf16
# weights (A/B path vs XLA's matmul; enable with CHITU_TPU_DENSE_KERNEL=1)
# ---------------------------------------------------------------------------


def _dense_kernel_stacked(layer_ref, x_ref, w_ref, o_ref, acc, *, n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    w = w_ref.at[0] if w_ref.ndim == 3 else w_ref
    acc[...] += jax.lax.dot_general(
        x_ref[...].astype(jnp.bfloat16),
        w[...].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def dense_matmul_stacked(
    x: jnp.ndarray,  # [T, K]
    layer,  # scalar i32
    w: jnp.ndarray,  # [L, K, N] bf16
    interpret: bool = False,
    out_dtype=jnp.float32,
):
    T, K = x.shape
    L, _, N = w.shape
    bm = min(BM_MAX, max(8, (T + 7) // 8 * 8))
    bn = _pick_bn(N)
    while N % bn:
        bn //= 2
    bk = BK
    while K % bk:
        bk //= 2
    if bn < 128 or bk < 128:
        # fall back for non-128-multiple dims
        return jnp.dot(
            x, w[layer].astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(out_dtype)
    xp = _pad_to(x, bm, 0)
    Tp = xp.shape[0]
    n_k = K // bk
    layer_arr = jnp.reshape(jnp.asarray(layer, jnp.int32), (1,))
    out = pl.pallas_call(
        functools.partial(_dense_kernel_stacked, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((Tp, N), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Tp // bm, N // bn, n_k),
            in_specs=[
                pl.BlockSpec(
                    (bm, bk), lambda i, j, k, s: (i, k),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, bk, bn), lambda i, j, k, s: (s[0], k, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j, k, s: (i, j),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(layer_arr, xp, w)
    return out[:T]
