"""MoE routing + dispatch vs the dense oracle, and the Mixtral engine
(reference semantics: model_hf_mixtral.py:51-96 softmax-top2 renorm;
model_deepseek_v3.py:774-842 sigmoid group-limited)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chitu_tpu.config import MoEArgs, load_config
from chitu_tpu.engine import Engine
from chitu_tpu.models.moe import (
    expert_capacity,
    moe_ffn,
    moe_ffn_ref,
    route,
)
from chitu_tpu.task import SampleParams

from helpers import tiny_cfg


def _setup(T=16, D=32, E=8, F=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (T, D)) * 0.5
    gate_w = jax.random.normal(ks[1], (D, E)) * 0.5
    w_gate = jax.random.normal(ks[2], (E, D, F)) * 0.1
    w_up = jax.random.normal(ks[3], (E, D, F)) * 0.1
    w_down = jax.random.normal(ks[4], (E, F, D)) * 0.1
    return x, gate_w, w_gate, w_up, w_down


def test_softmax_route_properties():
    moe = MoEArgs(n_routed_experts=8, n_activated_experts=2, norm_topk_prob=True)
    x, gate_w, *_ = _setup()
    w, sel = route(x, gate_w, moe)
    assert w.shape == (16, 2) and sel.shape == (16, 2)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
    assert (np.asarray(sel) >= 0).all() and (np.asarray(sel) < 8).all()
    # top-1 weight >= top-2 weight
    assert (np.asarray(w[:, 0]) >= np.asarray(w[:, 1]) - 1e-6).all()


def test_sigmoid_group_limited_route():
    moe = MoEArgs(
        n_routed_experts=16,
        n_activated_experts=4,
        n_expert_groups=4,
        n_limited_groups=2,
        score_func="sigmoid",
        route_scale=2.5,
        norm_topk_prob=True,
    )
    x, _, *_ = _setup(D=32, E=16)
    gate_w = jax.random.normal(jax.random.PRNGKey(3), (32, 16)) * 0.5
    bias = jax.random.normal(jax.random.PRNGKey(4), (16,)) * 0.1
    w, sel = route(x, gate_w, moe, gate_bias=bias)
    # selected experts come from at most n_limited_groups groups per token
    groups = np.asarray(sel) // 4
    for t in range(groups.shape[0]):
        assert len(set(groups[t])) <= 2
    # route_scale applied after renorm
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 2.5, atol=1e-4)


def test_dispatch_matches_dense_oracle():
    moe = MoEArgs(n_routed_experts=8, n_activated_experts=2, norm_topk_prob=True)
    x, gate_w, w_gate, w_up, w_down = _setup()
    w, sel = route(x, gate_w, moe)
    want = moe_ffn_ref(x, w_gate, w_up, w_down, w, sel)
    got = moe_ffn(x, w_gate, w_up, w_down, w, sel, capacity=16)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_dispatch_capacity_overflow_drops():
    """With capacity 1 and all tokens forced to expert 0, only the first
    token keeps its expert-0 contribution."""
    x, gate_w, w_gate, w_up, w_down = _setup(T=4)
    sel = jnp.zeros((4, 1), jnp.int32)
    w = jnp.ones((4, 1), jnp.float32)
    out = moe_ffn(x, w_gate, w_up, w_down, w, sel, capacity=1)
    want = moe_ffn_ref(x, w_gate, w_up, w_down, w, sel)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(want[0]), atol=1e-4)
    assert np.abs(np.asarray(out[1:])).max() < 1e-6


def test_expert_capacity_decode_exact():
    assert expert_capacity(16, 8, 2) == 16  # decode batches exact
    assert expert_capacity(512, 8, 2) == 256
    assert expert_capacity(512, 256, 8) == 32


def _mixtral_cfg():
    cfg = load_config(
        overrides=[
            "models=tiny-mixtral-debug",
            "infer.merge_qkv_gate_up=off",
            "infer.max_seq_len=128",
            "infer.max_reqs=4",
            "infer.page_size=16",
            "infer.stop_with_eos=false",
        ]
    )
    m = dataclasses.replace(cfg.models, n_layers=2)
    return dataclasses.replace(cfg, models=m)


def test_mixtral_engine_end_to_end():
    eng = Engine(_mixtral_cfg())
    p = SampleParams(temperature=0.0, max_new_tokens=6)
    t1 = eng.generate("mixtral check", p)
    t2 = eng.generate("mixtral check", p)
    assert t1 == t2 and len(t1) == 6


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_mixtral_ep_sharding():
    from chitu_tpu.parallel import make_mesh

    cfg = _mixtral_cfg()
    base = Engine(cfg)
    p = SampleParams(temperature=0.0, max_new_tokens=5)
    want = base.generate("expert parallel check", p)

    cfg2 = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, tp_size=4)
    )
    eng = Engine(cfg2)
    ly = eng.params["layers"]
    wg = ly.get("w_gu", ly.get("w_gate"))  # quantized engines merge gate+up
    assert wg.sharding.shard_shape(wg.shape)[1] == wg.shape[1] // 4
    got = eng.generate("expert parallel check", p)
    assert got == want
