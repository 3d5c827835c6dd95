"""Quantization ladder: round-trip accuracy and engine integration
(reference accuracy gates: test/pytest/test_w8a8.py tolerances 5e-3;
BASELINE.md per-bit-width accuracy)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chitu_tpu.engine import Engine
from chitu_tpu.ops.linear import linear
from chitu_tpu.ops.qtensor import QuantKind
from chitu_tpu.quantize import quantize_weight
from chitu_tpu.task import SampleParams

from helpers import tiny_cfg


@pytest.mark.parametrize(
    "kind,tol",
    [
        (QuantKind.SOFT_FP8, 0.06),
        (QuantKind.FP8, 0.06),
        (QuantKind.W8A16, 0.02),
        (QuantKind.W8A8, 0.02),
        (QuantKind.W4A16, 0.12),
    ],
)
def test_weight_roundtrip(kind, tol):
    w = jax.random.normal(jax.random.PRNGKey(0), (200, 300)) * 0.1
    q = quantize_weight(w, kind)
    wd = q.dequantize(jnp.float32)
    assert wd.shape == w.shape
    err = float(jnp.max(jnp.abs(wd - w)))
    scale = float(jnp.max(jnp.abs(w)))
    assert err <= tol * scale, f"{kind}: err {err} vs scale {scale}"


@pytest.mark.parametrize(
    "kind", [QuantKind.SOFT_FP8, QuantKind.W8A16, QuantKind.W4A16]
)
def test_quantized_matmul(kind):
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (8, 256), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(2), (256, 128)) * 0.05
    q = quantize_weight(w, kind)
    y_ref = jnp.dot(x.astype(jnp.float32), w)
    y_q = linear(x, q, out_dtype=jnp.float32)
    rel = float(
        jnp.linalg.norm(y_q - y_ref) / jnp.maximum(jnp.linalg.norm(y_ref), 1e-6)
    )
    assert rel < 0.15, f"{kind}: rel err {rel}"


def test_stacked_layer_quantization():
    """Stacked [L, in, out] weights quantize per-layer-blockwise."""
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 200, 140)) * 0.1
    q = quantize_weight(w, QuantKind.SOFT_FP8)
    assert q.data.shape == (3, 200, 140)
    assert q.scale.shape == (3, 2, 2)
    wd = q.dequantize(jnp.float32)
    assert float(jnp.max(jnp.abs(wd - w))) < 0.06 * float(jnp.max(jnp.abs(w)))


@pytest.mark.parametrize("method", ["soft_fp8", "w8a16", "w8a8", "w4a16_awq"])
def test_engine_with_quantized_model(method):
    """Full engine runs with quantized weights; greedy tokens mostly match
    the bf16 engine (random weights -> logits are near-uniform, so require
    generation to complete and first tokens to agree loosely)."""
    cfg = tiny_cfg()
    base = Engine(cfg)
    p = SampleParams(temperature=0.0, max_new_tokens=5)
    want = base.generate("quantization test prompt", p)

    qcfg = dataclasses.replace(
        cfg,
        quant=dataclasses.replace(cfg.quant, method=method, quant_on_load=True),
    )
    eng = Engine(qcfg)
    # params actually quantized
    from chitu_tpu.ops.qtensor import QTensor

    wq_key = "wqkv" if "wqkv" in eng.params["layers"] else "wq"
    assert isinstance(eng.params["layers"][wq_key], QTensor)
    assert not isinstance(eng.params["layers"]["attn_norm"], QTensor)
    assert not isinstance(eng.params["embed"], QTensor)

    got = eng.generate("quantization test prompt", p)
    assert len(got) == 5


def test_requantize_fp8_storage_accuracy():
    """fp8->int8 requantized storage (v5e fast path) stays within ~1% of
    the fp8 dequant and runs through the GEMM."""
    import jax.numpy as jnp
    from chitu_tpu.quantize import requantize_fp8_storage

    w = jax.random.normal(jax.random.PRNGKey(11), (256, 256)) * 0.1
    q = quantize_weight(w, QuantKind.SOFT_FP8)
    # requantize donates its input buffers (engine path); give it a copy
    from chitu_tpu.ops.qtensor import QTensor
    q_copy = QTensor(
        data=jnp.copy(q.data), scale=jnp.copy(q.scale), kind=q.kind,
        block=q.block,
    )
    q8 = requantize_fp8_storage({"layers": {"w": q_copy}})["layers"]["w"]
    assert q8.data.dtype == jnp.int8
    w_fp8 = q.dequantize(jnp.float32)
    w_i8 = q8.dequantize(jnp.float32)
    scale = float(jnp.max(jnp.abs(w)))
    assert float(jnp.max(jnp.abs(w_fp8 - w_i8))) < 0.02 * scale
    # matmul path
    x = (jax.random.normal(jax.random.PRNGKey(12), (4, 256)) * 0.5).astype(
        jnp.bfloat16
    )
    y8 = linear(x, q8, out_dtype=jnp.float32)
    yf = linear(x, q, out_dtype=jnp.float32)
    rel = float(jnp.linalg.norm(y8 - yf) / jnp.linalg.norm(yf))
    assert rel < 0.03


def test_llmint8_outlier_decomposition():
    """Outlier input channels stay dense (reference: bitsandbytes
    Linear8bitLt, quantizer.py:14-50): with planted huge rows, llmint8
    must beat plain W8A16 by a wide margin."""
    import jax
    import numpy as np

    from chitu_tpu.ops.linear import linear
    from chitu_tpu.quantize.transforms import quantize_llmint8

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    w = jax.random.normal(ks[0], (256, 128)) * 0.02
    rows = jax.random.choice(ks[1], 256, (8,), replace=False)
    w = w.at[rows].mul(100.0)  # planted outlier channels
    x = (jax.random.normal(ks[2], (4, 256)) * 0.5).astype(jnp.bfloat16)
    y_ref = jnp.dot(x.astype(jnp.float32), w)

    q8 = quantize_weight(w, QuantKind.W8A16)
    qo = quantize_llmint8(w, frac=8 / 256)
    assert qo.oc_idx is not None and qo.oc_w.shape == (8, 128)
    err8 = float(jnp.linalg.norm(linear(x, q8, out_dtype=jnp.float32) - y_ref))
    erro = float(jnp.linalg.norm(linear(x, qo, out_dtype=jnp.float32) - y_ref))
    assert erro < err8 * 0.2, (erro, err8)
    # dequantize() reconstructs the outlier rows
    np.testing.assert_allclose(
        np.asarray(qo.dequantize(jnp.float32)), np.asarray(w),
        atol=float(jnp.max(jnp.abs(w))) * 0.02,
    )


def test_llmint8_engine_end_to_end():
    import dataclasses as dc
    import sys
    sys.path.insert(0, "tests")
    from helpers import tiny_cfg
    from chitu_tpu.engine import Engine
    from chitu_tpu.task import SampleParams
    from chitu_tpu.ops.qtensor import QTensor

    cfg = tiny_cfg()
    cfg = dc.replace(
        cfg, quant=dc.replace(cfg.quant, method="llmint8", quant_on_load=True)
    )
    eng = Engine(cfg)
    name = "wqkv" if "wqkv" in eng.params["layers"] else "wq"
    q = eng.params["layers"][name]
    assert isinstance(q, QTensor) and q.oc_idx is not None
    toks = eng.generate("llmint8", SampleParams(temperature=0.0, max_new_tokens=4))
    assert len(toks) == 4


def test_merge_moe_gate_up_transform():
    """Gate+up expert stacks merge into [.., D, 2F]; quantized scales
    concat along the out dim; dequantized halves match the originals."""
    import numpy as np

    from chitu_tpu.quantize import merge_moe_gate_up, requantize_fp8_storage
    from chitu_tpu.ops.qtensor import QTensor

    L, E, D, F = 2, 4, 128, 256
    ks = jax.random.split(jax.random.PRNGKey(11), 2)
    wg = jax.random.normal(ks[0], (L, E, D, F)) * 0.05
    wu = jax.random.normal(ks[1], (L, E, D, F)) * 0.05

    # dense stacks stay split (merging regressed the bf16 grouped GEMM)
    tree = merge_moe_gate_up({"layers": {"exp_gate": wg, "exp_up": wu}})
    assert "exp_gu" not in tree["layers"]

    # quantized merge (rowwise fp8 scales)
    qg = requantize_fp8_storage(
        {"w": quantize_weight(wg, QuantKind.SOFT_FP8)}
    )["w"]
    qu = requantize_fp8_storage(
        {"w": quantize_weight(wu, QuantKind.SOFT_FP8)}
    )["w"]
    tree = merge_moe_gate_up({"layers": {"exp_gate": qg, "exp_up": qu}})
    qgu = tree["layers"]["exp_gu"]
    assert isinstance(qgu, QTensor) and qgu.data.shape[-1] == 2 * F
    np.testing.assert_allclose(
        np.asarray(qgu.dequantize(jnp.float32)[..., :F]),
        np.asarray(qg.dequantize(jnp.float32)),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(qgu.dequantize(jnp.float32)[..., F:]),
        np.asarray(qu.dequantize(jnp.float32)),
        rtol=1e-5, atol=1e-5,
    )


def test_fp8_act_roundtrip_semantics():
    """fp8_act_roundtrip == the reference's act_quant: per-(row, 128-block)
    absmax/448 scales, values exactly on the e4m3 grid
    (reference: chitu/ops.py:329-353)."""
    import numpy as np

    from chitu_tpu.quantize.transforms import F8_MAX, fp8_act_roundtrip

    x = jax.random.normal(jax.random.PRNGKey(3), (4, 256), jnp.float32) * 5.0
    y = np.asarray(fp8_act_roundtrip(x, block=128), np.float32)
    xs = np.asarray(x, np.float32).reshape(4, 2, 128)
    s = np.maximum(np.abs(xs).max(-1, keepdims=True), 1e-8) / F8_MAX
    want = (
        np.asarray(
            jnp.asarray(xs / s).astype(jnp.float8_e4m3fn), np.float32
        )
        * s
    ).reshape(4, 256)
    np.testing.assert_array_equal(y, want)
    # quantization error bounded by the e4m3 relative step (~2^-3)
    assert np.abs(y - np.asarray(x)).max() <= np.abs(np.asarray(x)).max() * 0.0625
    # odd (non-multiple-of-128) widths round-trip through padding
    x2 = jax.random.normal(jax.random.PRNGKey(4), (3, 200), jnp.bfloat16)
    y2 = fp8_act_roundtrip(x2)
    assert y2.shape == x2.shape and y2.dtype == x2.dtype


def test_w4a16_pack_awq_roundtrip_exact():
    """quantize_weight emits INTEGER zero-points, so the packed AWQ
    checkpoint round-trip must be bit-exact (review finding: float /
    negative zeros were silently truncated or wrapped by the uint cast)."""
    from chitu_tpu.quantize.packed import pack_awq, unpack_awq

    key = jax.random.PRNGKey(3)
    # include an all-positive block so the zero-point anchors at 0
    w = jnp.abs(jax.random.normal(key, (256, 128), jnp.float32)) + 0.1
    w = w.at[128:].set(jax.random.normal(jax.random.fold_in(key, 1), (128, 128)))
    q = quantize_weight(w, QuantKind.W4A16)
    assert jnp.all(q.zeros == jnp.round(q.zeros))  # integer grid
    packed = pack_awq(q)
    q2 = unpack_awq(packed["qweight"], packed["qzeros"], packed["scales"])
    np.testing.assert_array_equal(np.asarray(q.data), np.asarray(q2.data))
    np.testing.assert_allclose(
        np.asarray(q.dequantize(jnp.float32)),
        np.asarray(q2.dequantize(jnp.float32)),
        rtol=2e-3, atol=2e-3,  # fp16 scales in the AWQ format
    )


def test_w4a16_tail_group_ignores_padding():
    """in_features not a multiple of the group: the tail group's range
    must come from REAL rows (plus the 0 anchor), not the zero padding
    (review finding: padding polluted min/max)."""
    w = jnp.ones((200, 64), jnp.float32) * 3.0  # all-positive
    q = quantize_weight(w, QuantKind.W4A16, block=128)
    d = np.asarray(q.dequantize(jnp.float32))
    np.testing.assert_allclose(d, 3.0, rtol=0.05)


def test_stacked_packed_int4_dequantize():
    """Stacked [L, K, N] W4A16 leaves survive the pack_int4_storage /
    dequantize round-trip (review finding: the unpacker only handled
    2-D data and crashed the XLA fallback on stacked weights)."""
    from chitu_tpu.quantize.transforms import (
        pack_int4_storage,
        unpack_int4_storage,
    )

    key = jax.random.PRNGKey(7)
    w = jax.random.normal(key, (2, 256, 512), jnp.float32)
    q = quantize_weight(w, QuantKind.W4A16)
    packed = pack_int4_storage({"w": q})["w"]
    assert packed.data.shape == (2, 256, 256)
    un = unpack_int4_storage(packed)
    np.testing.assert_array_equal(np.asarray(un.data), np.asarray(q.data))
    np.testing.assert_allclose(
        np.asarray(packed.dequantize(jnp.float32)),
        np.asarray(q.dequantize(jnp.float32)),
    )


def test_stacked_w4a16_group64_falls_back(monkeypatch):
    """Stacked W4A16 with a non-kernel group size (e.g. group-64 GPTQ)
    must take the XLA dequant fallback instead of crashing the stacked
    Pallas kernel's scale reshape (review finding)."""
    import importlib

    # ops/__init__ re-exports the linear FUNCTION, shadowing the module
    linmod = importlib.import_module("chitu_tpu.ops.linear")

    key = jax.random.PRNGKey(9)
    w = jax.random.normal(key, (2, 256, 128), jnp.float32)
    q = quantize_weight(w, QuantKind.W4A16, block=64)
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 256), jnp.bfloat16)
    monkeypatch.setattr(linmod, "_OP_IMPL", "pallas")
    got = linear(x, q, layer=1)
    want = jnp.dot(
        x, q[1].dequantize(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_fp8_e4m3_acts_reach_moe_gemms(monkeypatch):
    """quant.fp8_act='e4m3' must round the MoE expert GEMM activations
    too (review finding: the expert path bypasses linear(), so the
    flagship MoE case silently kept int8 acts)."""
    from chitu_tpu.models import moe as moe_mod
    from chitu_tpu.ops.linear import set_fp8_act, get_fp8_act
    from chitu_tpu.quantize import transforms as tr

    calls = {"n": 0}
    real = tr.fp8_act_roundtrip

    def counting(x):
        calls["n"] += 1
        return real(x)

    monkeypatch.setattr(tr, "fp8_act_roundtrip", counting)
    key = jax.random.PRNGKey(11)
    E, D, F, T, k = 4, 128, 128, 8, 2
    wg = quantize_weight(
        jax.random.normal(key, (E, D, F), jnp.float32), QuantKind.FP8
    )
    wu = quantize_weight(
        jax.random.normal(jax.random.fold_in(key, 1), (E, D, F), jnp.float32),
        QuantKind.FP8,
    )
    wd = quantize_weight(
        jax.random.normal(jax.random.fold_in(key, 2), (E, F, D), jnp.float32),
        QuantKind.FP8,
    )
    x = jax.random.normal(jax.random.fold_in(key, 3), (T, D), jnp.bfloat16)
    weights = jnp.ones((T, k), jnp.float32) / k
    sel = jnp.tile(jnp.arange(k, dtype=jnp.int32), (T, 1))
    prev = get_fp8_act()
    try:
        set_fp8_act("e4m3")
        moe_mod.moe_ffn_sorted(
            x, wg, wu, wd, weights, sel, E, interpret=True
        )
    finally:
        set_fp8_act(prev)
    assert calls["n"] >= 2  # entry acts + mid-FFN acts


def test_quantize_head_option():
    """quant.quantize_head (r5, opt-in): lm_head becomes a QTensor, the
    engine still serves, and logits stay close to the dense-head engine
    (the quantization error itself, not a wiring bug)."""
    import dataclasses as dc

    import numpy as np

    from chitu_tpu.engine import Engine
    from chitu_tpu.ops.qtensor import QTensor
    from chitu_tpu.task import SampleParams

    import sys
    sys.path.insert(0, "tests")
    from helpers import tiny_cfg

    base_cfg = tiny_cfg(**{"infer.stop_with_eos": False})
    base_cfg = dc.replace(
        base_cfg,
        quant=dc.replace(
            base_cfg.quant, method="soft_fp8", quant_on_load=True
        ),
    )
    dense_head = Engine(base_cfg)
    want = dense_head.generate(
        "head quant check", SampleParams(temperature=0.0, max_new_tokens=6)
    )

    qcfg = dc.replace(
        base_cfg,
        quant=dc.replace(base_cfg.quant, quantize_head=True),
    )
    eng = Engine(qcfg)
    assert isinstance(eng.params["lm_head"], QTensor)
    got = eng.generate(
        "head quant check", SampleParams(temperature=0.0, max_new_tokens=6)
    )
    assert len(got) == 6
    agree = sum(a == b for a, b in zip(got, want)) / 6
    assert agree >= 0.5, (got, want)
