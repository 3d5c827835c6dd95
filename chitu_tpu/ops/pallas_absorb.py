"""Pallas MLA absorb projections over the stacked wkv_b leaf.

The XLA lowering of the absorb einsums was the biggest remaining MLA
glue cost (r5 xplane attribution, BENCH_LOCAL_r05 mla_bs1_attribution):
the lax.scan slices wkv_b into an 8 MiB per-layer COPY
(constant_dynamic-slice fusion running at memory rate — doubling the
leaf's HBM traffic), and `einsum('thd,chd->thc')` at decode batch sizes
lowers to VPU multiply-reduce fusions instead of MXU dots (the
reference re-dequants + einsums per call too,
chitu/models/model_deepseek_v3.py:516-532).

This kernel streams exactly the half of w[layer] each projection needs
(per-head [C, D] slices, double-buffered cross-step DMA like the
grouped MoE kernel) and runs one MXU dot per head:

- kind="uk" (q absorb):   out[t,h,c] = sum_d x[t,h,d] * w[l,c,h*S+d]
- kind="uv" (v un-absorb): out[t,h,d] = sum_c x[t,h,c] * w[l,c,h*S+dn+d]

with S = dn + dv the per-head lane stride of the packed
[L, C, H*(dn+dv)] leaf. The whole leaf stays OUT of the scan
(models/llama.split_scan_leaves static_names), so no per-layer slice
copy exists at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def absorb_kernel_ok(w, dn: int, dv: int, dc: int) -> bool:
    """Dense whole-stacked [L, dc, H*(dn+dv)] bf16 leaf with lane-aligned
    per-head halves (the flagship's 128/128) and sublane-aligned dc."""
    return (
        hasattr(w, "ndim")
        and not hasattr(w, "data")  # QTensor leaves keep the dequant path
        and w.ndim == 3
        and dn % 128 == 0
        and dv % 128 == 0
        and dc % 8 == 0
        and w.shape[-1] % (dn + dv) == 0
    )


def _absorb_body(
    layer_ref,  # [1] i32 (scalar prefetch)
    x_ref,  # [1, T, Din] VMEM block (head h's slice; head-major)
    w_ref,  # [L, C, H*S] ANY/HBM
    o_ref,  # [1, T, Dout] VMEM block
    wbuf,  # [2, C, D] VMEM
    sems,  # [2] DMA semaphores
    *,
    stride: int,
    off: int,
    dsl: int,
    contract_rows: bool,
    n_heads: int,
):
    h = pl.program_id(0)

    def dma(hh):
        src = w_ref.at[
            layer_ref[0], :, pl.ds(hh * stride + off, dsl)
        ]
        return pltpu.make_async_copy(
            src, wbuf.at[jax.lax.rem(hh, 2)], sems.at[jax.lax.rem(hh, 2)]
        )

    @pl.when(h == 0)
    def _():
        dma(0).start()

    @pl.when(h + 1 < n_heads)
    def _():
        dma(h + 1).start()

    dma(h).wait()
    w = wbuf[jax.lax.rem(h, 2)].astype(jnp.bfloat16)  # [C, D]
    x = x_ref[0].astype(jnp.bfloat16)
    if contract_rows:
        # x [T, C] . w [C, D] -> [T, D]
        out = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        # x [T, D] . w [C, D]^T -> [T, C]
        out = jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kind", "dn", "dv", "interpret"),
)
def absorb_matmul(
    x: jnp.ndarray,  # uk: [T, H, dn]; uv: [T, H, C]
    w: jnp.ndarray,  # [L, C, H*(dn+dv)] bf16 stacked leaf
    layer,  # scalar i32
    kind: str,  # "uk" | "uv"
    dn: int,
    dv: int,
    interpret: bool = False,
) -> jnp.ndarray:
    T, H = x.shape[0], x.shape[1]
    L, C, _ = w.shape
    stride = dn + dv
    if kind == "uk":
        off, dsl, contract_rows, dout = 0, dn, False, C
    else:
        off, dsl, contract_rows, dout = dn, dv, True, dv
    # head-major layout: Mosaic block shapes constrain only the LAST TWO
    # dims, so the per-head block must be (1, T, D) not (T, 1, D)
    Tp = max(8, -(-T // 8) * 8)
    xp = x if Tp == T else jnp.pad(x, ((0, Tp - T), (0, 0), (0, 0)))
    xh = jnp.transpose(xp, (1, 0, 2))  # [H, Tp, Din]
    layer_arr = jnp.reshape(jnp.asarray(layer, jnp.int32), (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H,),
        in_specs=[
            pl.BlockSpec(
                (1, Tp, x.shape[-1]), lambda h, *_: (h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, Tp, dout), lambda h, *_: (h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, C, dsl), w.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _absorb_body, stride=stride, off=off, dsl=dsl,
        contract_rows=contract_rows, n_heads=H,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, Tp, dout), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(layer_arr, xh, w)
    return jnp.transpose(out, (1, 0, 2))[:T]
