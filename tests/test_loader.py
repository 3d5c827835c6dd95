"""Checkpoint loading: HF-safetensors round trip through a synthetic
checkpoint (reference: backend.py:311-394 load paths)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chitu_tpu.engine import Engine
from chitu_tpu.loader import (
    load_llama_params,
    load_preprocessed,
    save_preprocessed,
)
from chitu_tpu.models import build_model
from chitu_tpu.task import SampleParams

from helpers import tiny_cfg


def _write_hf_checkpoint(params, tmpdir):
    """Write our param tree back out in HF-llama naming/layout."""
    from safetensors.numpy import save_file

    tensors = {}

    def put(key, arr, transpose=False):
        a = np.asarray(arr.astype(jnp.float32))
        tensors[key] = a.T.copy() if transpose else a

    put("model.embed_tokens.weight", params["embed"])
    put("model.norm.weight", params["norm"])
    put("lm_head.weight", params["lm_head"], transpose=True)
    L = params["layers"]["wq"].shape[0]
    for i in range(L):
        lp = {k: v[i] for k, v in params["layers"].items()}
        put(f"model.layers.{i}.input_layernorm.weight", lp["attn_norm"])
        put(f"model.layers.{i}.post_attention_layernorm.weight", lp["ffn_norm"])
        put(f"model.layers.{i}.self_attn.q_proj.weight", lp["wq"], True)
        put(f"model.layers.{i}.self_attn.k_proj.weight", lp["wk"], True)
        put(f"model.layers.{i}.self_attn.v_proj.weight", lp["wv"], True)
        put(f"model.layers.{i}.self_attn.o_proj.weight", lp["wo"], True)
        put(f"model.layers.{i}.mlp.gate_proj.weight", lp["w_gate"], True)
        put(f"model.layers.{i}.mlp.up_proj.weight", lp["w_up"], True)
        put(f"model.layers.{i}.mlp.down_proj.weight", lp["w_down"], True)
    save_file(tensors, os.path.join(tmpdir, "model.safetensors"))


def test_hf_safetensors_roundtrip(tmp_path):
    cfg = tiny_cfg(**{"infer.merge_qkv_gate_up": "off"})
    model = build_model(cfg.models, cfg)
    params = model.init_params(jax.random.PRNGKey(7))
    _write_hf_checkpoint(params, str(tmp_path))

    margs = dataclasses.replace(cfg.models, ckpt_dir=str(tmp_path))
    cfg2 = dataclasses.replace(cfg, models=margs)
    model2 = build_model(margs, cfg2)
    loaded = load_llama_params(model2, cfg2)

    for key in ("embed", "norm", "lm_head"):
        np.testing.assert_allclose(
            np.asarray(params[key], np.float32),
            np.asarray(loaded[key], np.float32),
            atol=1e-2,
        )
    for key, val in params["layers"].items():
        np.testing.assert_allclose(
            np.asarray(val, np.float32),
            np.asarray(loaded["layers"][key], np.float32),
            atol=1e-2,
            err_msg=key,
        )


def test_engine_loads_checkpoint_and_matches(tmp_path):
    """do_load=True through the engine reproduces the random-weight
    engine's greedy tokens (same weights via checkpoint)."""
    cfg = tiny_cfg(**{"infer.stop_with_eos": False, "infer.merge_qkv_gate_up": "off"})
    base = Engine(cfg)
    _write_hf_checkpoint(base.params, str(tmp_path))
    p = SampleParams(temperature=0.0, max_new_tokens=6)
    want = base.generate("checkpoint check", p)

    margs = dataclasses.replace(cfg.models, ckpt_dir=str(tmp_path))
    infer = dataclasses.replace(cfg.infer, do_load=True)
    cfg2 = dataclasses.replace(cfg, models=margs, infer=infer)
    eng = Engine(cfg2)
    got = eng.generate("checkpoint check", p)
    assert got == want


def test_preprocessed_save_load(tmp_path):
    cfg = tiny_cfg()
    model = build_model(cfg.models, cfg)
    params = model.init_params(jax.random.PRNGKey(9))
    out = str(tmp_path / "pre")
    save_preprocessed(params, out)
    loaded = load_preprocessed(out)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(loaded)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )


def test_preprocessed_preserves_qtensors(tmp_path):
    """Quantized trees survive the preprocess round trip as QTensors
    (reference: skip_preprocess fast startup with quantized weights)."""
    import jax.numpy as jnp
    from chitu_tpu.ops.qtensor import QTensor, QuantKind
    from chitu_tpu.quantize import quantize_params

    cfg = tiny_cfg()
    model = build_model(cfg.models, cfg)
    params = model.init_params(jax.random.PRNGKey(2))
    qargs = dataclasses.replace(cfg.quant, method="soft_fp8")
    params = quantize_params(params, qargs, model)
    out = str(tmp_path / "pre")
    save_preprocessed(params, out)
    loaded = load_preprocessed(out)
    wq = loaded["layers"]["wqkv"]
    assert isinstance(wq, QTensor)
    assert wq.kind == QuantKind.SOFT_FP8
    orig = params["layers"]["wqkv"]
    np.testing.assert_array_equal(
        np.asarray(orig.data.astype(jnp.float32)),
        np.asarray(wq.data.astype(jnp.float32)),
    )
    np.testing.assert_array_equal(np.asarray(orig.scale), np.asarray(wq.scale))


def test_preprocessed_preserves_llmint8_outliers(tmp_path):
    """llmint8 QTensors round-trip through preprocess-and-save with
    their outlier decomposition intact (review finding: oc_idx/oc_w were
    silently dropped — the zeroed int8 rows lose the correction term)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chitu_tpu.ops.qtensor import QuantKind
    from chitu_tpu.quantize.transforms import quantize_llmint8

    w = jax.random.normal(jax.random.PRNGKey(2), (128, 64), jnp.float32)
    q = quantize_llmint8(w)
    assert q.oc_idx is not None
    out = str(tmp_path / "pre")
    save_preprocessed({"layers": {"wq": q}}, out)
    back = load_preprocessed(out)["layers"]["wq"]
    assert back.kind == QuantKind.LLMINT8 if hasattr(QuantKind, "LLMINT8") else True
    assert back.oc_idx is not None and back.oc_w is not None
    np.testing.assert_array_equal(np.asarray(back.oc_idx), np.asarray(q.oc_idx))
    np.testing.assert_allclose(
        np.asarray(back.dequantize(jnp.float32)),
        np.asarray(q.dequantize(jnp.float32)),
        rtol=1e-5, atol=1e-5,
    )
