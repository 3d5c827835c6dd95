"""Token-sorted ragged MoE dispatch + grouped Pallas GEMM.

The moe_align_block_size contract (reference: chitu/fused_moe.py:314-610)
and the in-kernel-dequant fused MoE (reference: fused_moe.py:62-307) —
validated against the dense per-expert oracle (moe_ffn_ref, the reference
Mixtral loop semantics)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chitu_tpu.config import MoEArgs
from chitu_tpu.models.moe import (
    dispatch_geometry,
    moe_ffn_auto,
    moe_ffn_ref,
    moe_ffn_sorted,
    sorted_dispatch,
)
from chitu_tpu.ops.qtensor import QuantKind
from chitu_tpu.quantize import quantize_weight, requantize_fp8_storage

T, K, E, D, F = 16, 2, 8, 128, 256


def _setup(seed=0):
    x = (jax.random.normal(jax.random.PRNGKey(seed), (T, D)) * 0.5).astype(
        jnp.bfloat16
    )
    sel = jax.random.randint(jax.random.PRNGKey(seed + 1), (T, K), 0, E)
    w = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(seed + 2), (T, K)), -1
    )
    wg = jax.random.normal(jax.random.PRNGKey(3), (E, D, F)) * 0.05
    wu = jax.random.normal(jax.random.PRNGKey(4), (E, D, F)) * 0.05
    wd = jax.random.normal(jax.random.PRNGKey(5), (E, F, D)) * 0.05
    return x, sel, w, wg, wu, wd


def _q(w):
    return requantize_fp8_storage(
        {"w": quantize_weight(w, QuantKind.SOFT_FP8)}
    )["w"]


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))


def test_sorted_dispatch_invariants():
    """Every assignment placed exactly once; every live block holds one
    expert's rows; dead blocks hold none (the moe-align contract)."""
    _, sel, *_ = _setup()
    bm, NB = dispatch_geometry(T, K, E)
    ra, be = sorted_dispatch(sel, E, bm)
    ra, be = np.asarray(ra), np.asarray(be)
    A = T * K
    ef = np.asarray(sel).reshape(A)
    placed = ra[ra < A]
    assert sorted(placed.tolist()) == list(range(A))
    for b in range(NB):
        rows = ra[b * bm : (b + 1) * bm]
        exps = {ef[r] for r in rows if r < A}
        if be[b] < 0:
            assert not exps
        else:
            assert exps <= {be[b]}


def test_sorted_skewed_load_no_drops():
    """All tokens routed to ONE expert — the case that overflowed the
    capacity path — must be exact."""
    x, _, w, wg, wu, wd = _setup()
    sel = jnp.zeros((T, K), jnp.int32).at[:, 1].set(3)
    ref = moe_ffn_ref(x.astype(jnp.float32), wg, wu, wd, w, sel)
    got = moe_ffn_sorted(
        x, wg.astype(jnp.bfloat16), wu.astype(jnp.bfloat16),
        wd.astype(jnp.bfloat16), w, sel, E, interpret=True,
    )
    assert _rel(got, ref) < 0.05


def test_sorted_dense_matches_oracle():
    x, sel, w, wg, wu, wd = _setup()
    ref = moe_ffn_ref(x.astype(jnp.float32), wg, wu, wd, w, sel)
    got = moe_ffn_sorted(
        x, wg.astype(jnp.bfloat16), wu.astype(jnp.bfloat16),
        wd.astype(jnp.bfloat16), w, sel, E, interpret=True,
    )
    assert _rel(got, ref) < 0.05


def test_sorted_quantized_in_kernel_dequant():
    """soft-fp8 experts run through the grouped kernel without a
    dequantized expert stack ever materializing (VERDICT r1 item 1)."""
    x, sel, w, wg, wu, wd = _setup()
    ref = moe_ffn_ref(x.astype(jnp.float32), wg, wu, wd, w, sel)
    got = moe_ffn_sorted(
        x, _q(wg), _q(wu), _q(wd), w, sel, E, interpret=True
    )
    assert _rel(got, ref) < 0.12


def test_sorted_stacked_layer_indexing():
    """[L, E, ...] stacks index (layer, expert) inside the kernel."""
    x, sel, w, *_ = _setup()
    L = 3
    wgL = jax.random.normal(jax.random.PRNGKey(6), (L, E, D, F)) * 0.05
    wuL = jax.random.normal(jax.random.PRNGKey(7), (L, E, D, F)) * 0.05
    wdL = jax.random.normal(jax.random.PRNGKey(8), (L, E, F, D)) * 0.05
    qg, qu, qd = _q(wgL), _q(wuL), _q(wdL)
    for layer in (0, 2):
        ref = moe_ffn_ref(
            x.astype(jnp.float32), wgL[layer], wuL[layer], wdL[layer], w, sel
        )
        got = moe_ffn_sorted(
            x, qg, qu, qd, w, sel, E,
            layer=jnp.int32(layer), interpret=True,
        )
        assert _rel(got, ref) < 0.12


def test_sorted_dense_stacked_layer_indexing():
    """DENSE [L, E, ...] bf16 stacks also index (layer, expert) inside
    the kernel — they stay out of the layer scan whole
    (split_scan_leaves), since scan-slicing a stack that feeds a pallas
    operand materializes a full per-layer copy (r4: 2.4x bf16 MoE decode
    cost at the deepseek-mini-bench geometry)."""
    x, sel, w, *_ = _setup()
    L = 3
    wgL = jax.random.normal(jax.random.PRNGKey(6), (L, E, D, F)) * 0.05
    wuL = jax.random.normal(jax.random.PRNGKey(7), (L, E, D, F)) * 0.05
    wdL = jax.random.normal(jax.random.PRNGKey(8), (L, E, F, D)) * 0.05
    for layer in (0, 2):
        ref = moe_ffn_ref(
            x.astype(jnp.float32), wgL[layer], wuL[layer], wdL[layer], w, sel
        )
        got = moe_ffn_sorted(
            x, wgL.astype(jnp.bfloat16), wuL.astype(jnp.bfloat16),
            wdL.astype(jnp.bfloat16), w, sel, E,
            layer=jnp.int32(layer), interpret=True,
        )
        assert _rel(got, ref) < 0.03


def test_split_scan_leaves_keeps_expert_stacks_static():
    """Dense ndim-4 expert stacks and stacked QTensors stay out of the
    scan xs; per-layer dense matrices ride it."""
    from chitu_tpu.models.llama import split_scan_leaves

    leaves = {
        "w_gate_dense": jnp.zeros((4, 8, 16, 32), jnp.bfloat16),  # stack
        "wq": jnp.zeros((4, 16, 32), jnp.bfloat16),  # per-layer matrix
        "norm": jnp.zeros((4, 16), jnp.bfloat16),
        "w_gate_q": _q(jnp.zeros((4, 8, 128, 128))),
    }
    xs, static = split_scan_leaves(leaves)
    assert set(static) == {"w_gate_dense", "w_gate_q"}
    assert set(xs) == {"wq", "norm"}


def test_capacity_fallback_slices_dense_stacks():
    """The capacity-einsum fallback must slice whole dense stacks to this
    layer's [E, ...] (pp>1 layouts reach it with stacked leaves)."""
    x, sel, w, *_ = _setup()
    L = 3
    wgL = jax.random.normal(jax.random.PRNGKey(6), (L, E, D, F)) * 0.05
    wuL = jax.random.normal(jax.random.PRNGKey(7), (L, E, D, F)) * 0.05
    wdL = jax.random.normal(jax.random.PRNGKey(8), (L, E, F, D)) * 0.05
    moe = MoEArgs(
        n_routed_experts=E, n_activated_experts=K, capacity_factor=4.0
    )
    # interpret=False on CPU makes _sorted_eligible irrelevant: force the
    # fallback by using a non-kernel-eligible width
    wg_bad = wgL[..., : F - 8]
    wu_bad = wuL[..., : F - 8]
    wd_bad = wdL[:, :, : F - 8, :]
    for layer in (0, 2):
        ref = moe_ffn_ref(
            x.astype(jnp.float32), wg_bad[layer], wu_bad[layer],
            wd_bad[layer], w, sel,
        )
        got = moe_ffn_auto(
            x, wg_bad.astype(jnp.bfloat16), wu_bad.astype(jnp.bfloat16),
            wd_bad.astype(jnp.bfloat16), w, sel, moe,
            layer=jnp.int32(layer),
        )
        assert _rel(got, ref) < 0.03


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_expert_parallel_shard_map():
    """EP over 'tp' (and dp x tp): per-shard sorted dispatch + psum must
    match the single-device path."""
    from jax.sharding import Mesh

    x, sel, w, wg, wu, wd = _setup()
    qg, qu, qd = _q(wg), _q(wu), _q(wd)
    moe = MoEArgs(n_routed_experts=E, n_activated_experts=K)
    ref = moe_ffn_auto(x, qg, qu, qd, w, sel, moe)

    for shape, names in (
        ((1, 4, 1), ("dp", "tp", "pp")),
        ((2, 2, 1), ("dp", "tp", "pp")),
    ):
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(shape), names)
        f = jax.jit(functools.partial(moe_ffn_auto, moe=moe, mesh=mesh))
        got = f(x, qg, qu, qd, w, sel)
        assert _rel(got, ref) < 2e-2, (shape, _rel(got, ref))


def test_auto_falls_back_under_pp():
    """pp>1 meshes take the capacity-einsum fallback (GSPMD-partitionable)."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    x, sel, w, wg, wu, wd = _setup()
    moe = MoEArgs(
        n_routed_experts=E, n_activated_experts=K, capacity_factor=4.0
    )
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 1, 2), ("dp", "tp", "pp"))
    ref = moe_ffn_ref(x.astype(jnp.float32), wg, wu, wd, w, sel)
    got = jax.jit(functools.partial(moe_ffn_auto, moe=moe, mesh=mesh))(
        x, wg.astype(jnp.bfloat16), wu.astype(jnp.bfloat16),
        wd.astype(jnp.bfloat16), w, sel,
    )
    assert _rel(got, ref) < 0.05
