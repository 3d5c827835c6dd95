"""AWQ/GPTQ packed-format unpacking (reference: awq/qmodule.py packing,
AutoGPTQ QuantLinear layout)."""

import jax
import jax.numpy as jnp
import numpy as np

from chitu_tpu.ops.qtensor import QuantKind
from chitu_tpu.quantize import quantize_weight
from chitu_tpu.quantize.packed import (
    pack_awq,
    unpack_awq,
    unpack_gptq,
)


def test_awq_pack_unpack_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 64)) * 0.1
    q = quantize_weight(w, QuantKind.W4A16)
    packed = pack_awq(q)
    assert packed["qweight"].shape == (256, 8)
    assert packed["qzeros"].shape == (2, 8)
    q2 = unpack_awq(packed["qweight"], packed["qzeros"], packed["scales"])
    np.testing.assert_array_equal(np.asarray(q.data), np.asarray(q2.data))
    # zeros go through nibble rounding; compare the dequantized weights
    w1 = np.asarray(q.dequantize(jnp.float32))
    w2 = np.asarray(q2.dequantize(jnp.float32))
    scale = float(jnp.max(jnp.abs(w)))
    assert np.max(np.abs(w1 - w2)) < 0.15 * scale


def test_gptq_unpack_layout():
    """Sequential in-dim packing; +1 zero-point quirk."""
    rng = np.random.default_rng(0)
    data = rng.integers(0, 16, (16, 8), dtype=np.int64)  # [in, out]
    qweight = np.zeros((2, 8), np.int64)  # [in/8, out]
    for r in range(16):
        qweight[r // 8] |= (data[r] & 0xF) << ((r % 8) * 4)
    zeros = rng.integers(0, 15, (1, 8), dtype=np.int64)
    qzeros = np.zeros((1, 1), np.int64)
    for c in range(8):
        qzeros[0, 0] |= (zeros[0, c] & 0xF) << (c * 4)
    scales = np.full((1, 8), 0.5, np.float32)
    q = unpack_gptq(
        qweight.astype(np.int32), qzeros.astype(np.int32), scales,
        group_size=16,
    )
    np.testing.assert_array_equal(np.asarray(q.data), data.astype(np.int8))
    np.testing.assert_allclose(
        np.asarray(q.zeros)[0], zeros[0] + 1.0
    )


def test_unpacked_qtensor_runs_through_gemm():
    from chitu_tpu.ops.linear import linear

    w = jax.random.normal(jax.random.PRNGKey(1), (256, 128)) * 0.05
    q = quantize_weight(w, QuantKind.W4A16)
    q2 = unpack_awq(**{k: np.asarray(v) for k, v in pack_awq(q).items()})
    x = (jax.random.normal(jax.random.PRNGKey(2), (4, 256)) * 0.5).astype(
        jnp.bfloat16
    )
    y = linear(x, q2, out_dtype=jnp.float32)
    y_ref = jnp.dot(x.astype(jnp.float32), w)
    rel = float(jnp.linalg.norm(y - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.2


def test_awq_checkpoint_loads_into_engine(tmp_path):
    """A synthetic AWQ-quantized HF checkpoint loads as W4A16 QTensors and
    serves (reference: backend.py:321-333 quant_ckpt_dir path)."""
    import dataclasses
    import sys
    sys.path.insert(0, "tests")
    from helpers import tiny_cfg
    from safetensors.numpy import save_file
    from chitu_tpu.engine import Engine
    from chitu_tpu.task import SampleParams

    cfg = tiny_cfg(**{"infer.stop_with_eos": False, "infer.merge_qkv_gate_up": "off"})
    base = Engine(cfg)
    params = base.params

    tensors = {
        "model.embed_tokens.weight": np.ascontiguousarray(
            np.asarray(params["embed"].astype(jnp.float32))
        ),
        "model.norm.weight": np.asarray(params["norm"].astype(jnp.float32)),
        "lm_head.weight": np.ascontiguousarray(
            np.asarray(params["lm_head"].astype(jnp.float32)).T
        ),
    }
    L = cfg.models.n_layers
    for i in range(L):
        lp = {k: v[i] for k, v in params["layers"].items()}
        pre = f"model.layers.{i}"
        tensors[f"{pre}.input_layernorm.weight"] = np.asarray(
            lp["attn_norm"].astype(jnp.float32)
        )
        tensors[f"{pre}.post_attention_layernorm.weight"] = np.asarray(
            lp["ffn_norm"].astype(jnp.float32)
        )
        for ours, hf, grp in (
            ("wq", "self_attn.q_proj", 64),
            ("wk", "self_attn.k_proj", 64),
            ("wv", "self_attn.v_proj", 64),
            ("wo", "self_attn.o_proj", 64),
            ("w_gate", "mlp.gate_proj", 64),
            ("w_up", "mlp.up_proj", 64),
            ("w_down", "mlp.down_proj", 64),
        ):
            q = quantize_weight(lp[ours].astype(jnp.float32), QuantKind.W4A16, block=grp)
            packed = pack_awq(q)
            for part, val in packed.items():
                tensors[f"{pre}.{hf}.{part}"] = np.ascontiguousarray(val)
    save_file(tensors, str(tmp_path / "model.safetensors"))

    margs = dataclasses.replace(cfg.models, ckpt_dir=str(tmp_path))
    cfg2 = dataclasses.replace(
        cfg, models=margs, infer=dataclasses.replace(cfg.infer, do_load=True)
    )
    eng = Engine(cfg2)
    from chitu_tpu.ops.qtensor import QTensor

    assert isinstance(eng.params["layers"]["wq"], QTensor)
    assert eng.params["layers"]["wq"].kind == QuantKind.W4A16
    toks = eng.generate("awq ckpt", SampleParams(temperature=0.0, max_new_tokens=4))
    assert len(toks) == 4


def test_int4_tile_packed_storage():
    """2-nibbles/byte storage: pack/unpack roundtrip exact, GEMM matches."""
    from chitu_tpu.quantize import (
        is_packed_int4,
        pack_int4_storage,
        unpack_int4_storage,
    )
    from chitu_tpu.ops.pallas_quant_gemm import _matmul_impl

    w = jax.random.normal(jax.random.PRNGKey(7), (256, 1024)) * 0.1
    q = quantize_weight(w, QuantKind.W4A16)
    qp = pack_int4_storage({"layers": {"w": q}})["layers"]["w"]
    assert is_packed_int4(qp)
    assert qp.data.shape == (256, 512)  # half the bytes
    np.testing.assert_array_equal(
        np.asarray(unpack_int4_storage(qp).data), np.asarray(q.data)
    )
    x = (jax.random.normal(jax.random.PRNGKey(8), (8, 256)) * 0.5).astype(
        jnp.bfloat16
    )
    got = _matmul_impl(x, qp, interpret=jax.default_backend() != "tpu")
    want = _matmul_impl(x, q, interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-2, rtol=1e-2
    )


def test_int4_pack_skips_odd_dims():
    from chitu_tpu.quantize import pack_int4_storage, is_packed_int4

    w = jax.random.normal(jax.random.PRNGKey(9), (256, 300)) * 0.1
    q = quantize_weight(w, QuantKind.W4A16)
    qp = pack_int4_storage({"w": q})["w"]
    assert not is_packed_int4(qp)  # 300 not a tile multiple: unchanged


def test_gptq_act_order_g_idx():
    """desc_act GPTQ: g_idx permutes the group assignment of input rows;
    the unpacked QTensor must dequantize exactly and the GEMM must honor
    the permutation (ADVICE r1: silently-skipped g_idx produced garbage)."""
    from chitu_tpu.ops.linear import linear

    rng = np.random.default_rng(3)
    K, N, G = 32, 8, 16  # 2 groups
    data = rng.integers(0, 16, (K, N), dtype=np.int64)
    qweight = np.zeros((K // 8, N), np.int64)
    for r in range(K):
        qweight[r // 8] |= (data[r] & 0xF) << ((r % 8) * 4)
    zeros = rng.integers(0, 15, (K // G, N), dtype=np.int64)
    qzeros = np.zeros((K // G, N // 8), np.int64)
    for g in range(K // G):
        for c in range(N):
            qzeros[g, c // 8] |= (zeros[g, c] & 0xF) << ((c % 8) * 4)
    scales = rng.uniform(0.1, 0.5, (K // G, N)).astype(np.float32)
    # act-order: interleave rows between the two groups
    g_idx = (np.arange(K) % 2).astype(np.int32)

    q = unpack_gptq(
        qweight.astype(np.int32), qzeros.astype(np.int32), scales,
        group_size=G, g_idx=g_idx,
    )
    assert q.in_perm is not None

    # ground truth dequant honoring g_idx per-row
    w_ref = (data.astype(np.float32) - (zeros[g_idx] + 1.0)) * scales[g_idx]
    np.testing.assert_allclose(
        np.asarray(q.dequantize(jnp.float32)), w_ref, rtol=1e-5, atol=1e-5
    )

    x = (np.asarray(rng.standard_normal((4, K)), np.float32) * 0.5).astype(
        np.float32
    )
    y = linear(jnp.asarray(x, jnp.bfloat16), q, out_dtype=jnp.float32)
    y_ref = x @ w_ref
    rel = float(np.linalg.norm(np.asarray(y) - y_ref) / np.linalg.norm(y_ref))
    assert rel < 0.05


def test_gptq_identity_g_idx_no_perm():
    rng = np.random.default_rng(4)
    K, N, G = 32, 8, 16
    qweight = rng.integers(0, 2**31 - 1, (K // 8, N), dtype=np.int64)
    qzeros = rng.integers(0, 2**31 - 1, (K // G, N // 8), dtype=np.int64)
    scales = np.full((K // G, N), 0.5, np.float32)
    g_idx = (np.arange(K) // G).astype(np.int32)
    q = unpack_gptq(
        qweight.astype(np.int32), qzeros.astype(np.int32), scales,
        group_size=G, g_idx=g_idx,
    )
    assert q.in_perm is None
