"""DeepSeek-V3: MLA absorb consistency + engine end-to-end
(reference: chitu/models/model_deepseek_v3.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chitu_tpu.config import load_config
from chitu_tpu.engine import Engine
from chitu_tpu.kvcache import PagedKVCache
from chitu_tpu.models import build_model
from chitu_tpu.task import SampleParams


def _ds_cfg(**over):
    overrides = [
        "models=tiny-deepseek-debug",
        "infer.max_seq_len=128",
        "infer.max_reqs=4",
        "infer.page_size=16",
        "infer.stop_with_eos=false",
    ] + [f"{k}={v}" for k, v in over.items()]
    return load_config(overrides=overrides)


@pytest.fixture(scope="module")
def ds_model():
    cfg = _ds_cfg()
    model = build_model(cfg.models, cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, model, params


def _cache(model, cfg):
    spec = model.kv_cache_spec()
    return PagedKVCache(
        spec["n_layers"],
        16,
        cfg.infer.page_size,
        spec["kv_heads"],
        spec["head_dim"],
        kv_dim=spec["kv_dim"],
        layer_groups=spec["layer_groups"],
    )


def test_mla_decode_matches_prefill(ds_model):
    cfg, model, params = ds_model
    page = cfg.infer.page_size
    bt = jnp.array([0, 1, 2, 3, -1, -1, -1, -1], jnp.int32)
    tokens = jnp.arange(10, dtype=jnp.int32) % 7

    cache = _cache(model, cfg)
    _, arrs = model.prefill(
        params,
        cache.arrays,
        jnp.pad(tokens, (0, 6)),
        bt,
        jnp.int32(0),
        jnp.int32(10),
        page,
    )
    dec, _ = model.decode(
        params,
        arrs,
        jnp.array([5], jnp.int32),
        jnp.array([10], jnp.int32),
        bt[None],
        jnp.array([True]),
        page,
    )
    cache2 = _cache(model, cfg)
    tok11 = jnp.pad(jnp.concatenate([tokens, jnp.array([5], jnp.int32)]), (0, 5))
    pre, _ = model.prefill(
        params, cache2.arrays, tok11, bt, jnp.int32(0), jnp.int32(11), page
    )
    assert int(jnp.argmax(dec[0])) == int(jnp.argmax(pre))
    np.testing.assert_allclose(
        np.asarray(dec[0]), np.asarray(pre), atol=0.08, rtol=0.08
    )


def test_mla_cache_is_compact(ds_model):
    """MLA cache must hold kv_dim (576-equivalent) floats/token, not
    per-head KV (the reference's headline memory win, backend.py:186-197)."""
    cfg, model, params = ds_model
    cache = _cache(model, cfg)
    m = cfg.models.mla
    # layer groups partition layers; per-token cost is the (padded) minor
    assert sum(a.shape[0] for a in cache.arrays.values()) == cfg.models.n_layers
    per_token = cache.minor
    assert per_token <= 2 * (m.kv_lora_rank + m.qk_rope_head_dim)
    # well below per-head caching (n_heads * (nope+rope+v))
    full_kv = cfg.models.n_heads * (
        m.qk_nope_head_dim + m.qk_rope_head_dim + m.v_head_dim
    )
    assert per_token < full_kv / 4


def test_deepseek_engine_end_to_end():
    eng = Engine(_ds_cfg())
    p = SampleParams(temperature=0.0, max_new_tokens=6)
    t1 = eng.generate("deepseek check", p)
    t2 = eng.generate("deepseek check", p)
    assert t1 == t2 and len(t1) == 6


def test_deepseek_soft_fp8_engine():
    cfg = _ds_cfg(**{"quant.method": "soft_fp8", "quant.quant_on_load": "true"})
    eng = Engine(cfg)
    from chitu_tpu.ops.qtensor import QTensor

    ml = eng.params["moe_layers"]
    assert isinstance(ml.get("exp_gu", ml.get("exp_gate")), QTensor)
    # wkv_b stays bf16 under absorb: the absorb einsums dequantize it per
    # call, so quant-on-load would only ADD traffic (~2.5x for that leaf)
    import jax.numpy as jnp

    assert ml["wkv_b"].dtype == jnp.bfloat16
    assert isinstance(ml["wo"], QTensor)
    t = eng.generate("fp8 deepseek", SampleParams(temperature=0.0, max_new_tokens=4))
    assert len(t) == 4


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_deepseek_tp4_matches():
    p = SampleParams(temperature=0.0, max_new_tokens=5)
    base = Engine(_ds_cfg())
    want = base.generate("tensor parallel mla", p)
    eng = Engine(_ds_cfg(**{"infer.tp_size": 4}))
    got = eng.generate("tensor parallel mla", p)
    assert got == want


def test_mla_absorb_none_matches_absorb():
    """mla_absorb=none (dense per-head K/V) must produce the same greedy
    tokens as the absorb path (reference: model_deepseek_v3.py:612-670
    dense vs :475-536 absorb — mathematically identical attention)."""
    import dataclasses as dc

    from chitu_tpu.engine import Engine
    from chitu_tpu.task import SampleParams

    p = SampleParams(temperature=0.0, max_new_tokens=5)
    base = Engine(_ds_cfg())
    want = base.generate("absorb equivalence", p)

    cfg = _ds_cfg()
    cfg = dc.replace(cfg, infer=dc.replace(cfg.infer, mla_absorb="none"))
    eng = Engine(cfg)
    assert not eng.model.absorb
    # dense cache is per-head (bigger rows than the 576-float latent)
    assert eng.cache.arrays["kv_moe"].shape[-1] > base.cache.arrays["kv_moe"].shape[-1]
    got = eng.generate("absorb equivalence", p)
    assert got == want


def test_deepseek_hybrid_step_logits_match_pure_paths():
    """step_hybrid over the merged-MLA cache: prefill-row logits must be
    EXACT vs prefill_packed, decode-row logits close to pure decode (the
    deepseek forward is shape-dependent at bf16 — pure decode itself
    wobbles ~1e-2 between batch buckets), and the engine drains a
    mid-flight-arrival burst through the hybrid jit."""
    import numpy as np
    from chitu_tpu.kvcache import PagedKVCache

    cfg = _ds_cfg()
    model = build_model(cfg.models, cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    page = cfg.infer.page_size
    cache = _cache(model, cfg)
    toks = jnp.arange(10, dtype=jnp.int32) % 7
    bt0 = jnp.array([0, 1, -1, -1, -1, -1, -1, -1], jnp.int32)
    _, arrs = model.prefill(
        params, cache.arrays, jnp.pad(toks, (0, 6)), bt0,
        jnp.int32(0), jnp.int32(10), page_size=page,
    )
    dec_tokens = jnp.array([5], jnp.int32)
    dec_seq = jnp.array([10], jnp.int32)
    dec_bts = bt0[None, :]
    dec_valid = jnp.array([True])
    want, _ = model.decode(
        params, dict(arrs), dec_tokens, dec_seq, dec_bts, dec_valid,
        page_size=page,
    )

    T, Tq = 64, 32
    pf_tokens = np.zeros((T,), np.int32)
    pf_seg = np.full((T,), -1, np.int32)
    pf_pos = np.full((T,), -1, np.int32)
    pf_bts = np.full((2, 8), -1, np.int32)
    pf_total = np.zeros((2,), np.int32)
    pf_last = np.zeros((2,), np.int32)
    block_seg = np.full((T // Tq,), -1, np.int32)
    block_qs = np.zeros((T // Tq,), np.int32)
    off = 0
    for r, (n, pages) in enumerate([(5, [2, 3]), (7, [4, 5])]):
        pf_tokens[off : off + n] = (np.arange(n) + 3) % 7
        pf_seg[off : off + n] = r
        pf_pos[off : off + n] = np.arange(n)
        pf_total[r] = n
        pf_last[r] = off + n - 1
        pf_bts[r, :2] = pages
        block_seg[off // Tq] = r
        off += Tq

    pf_args = (
        jnp.asarray(pf_tokens), jnp.asarray(pf_seg), jnp.asarray(pf_pos),
        jnp.asarray(pf_bts), jnp.asarray(pf_total), jnp.asarray(pf_last),
        jnp.asarray(block_seg), jnp.asarray(block_qs),
    )
    dec_l, pf_l, _ = model.step_hybrid(
        params, dict(arrs), dec_tokens, dec_seq, dec_bts, dec_valid,
        *pf_args, page_size=page,
    )
    pf_only, _ = model.prefill_packed(
        params, dict(arrs), *pf_args, page_size=page
    )
    np.testing.assert_array_equal(np.asarray(pf_l), np.asarray(pf_only))
    np.testing.assert_allclose(
        np.asarray(dec_l, np.float32), np.asarray(want, np.float32),
        atol=5e-2, rtol=5e-2,
    )

    # engine-level: a burst arriving mid-decode drains through the hybrid
    p = SampleParams(temperature=0.0, max_new_tokens=24)
    eng = Engine(_ds_cfg(**{"infer.decode_window": 4}))
    r1 = eng.submit("first request keeps decoding", p)
    eng.step()
    eng.step()
    r2 = eng.submit("second arrives mid flight", p)
    r3 = eng.submit("third shows up too", p)
    eng.run_until_complete()
    assert any(
        isinstance(k, tuple) and k and k[0] == "hybrid"
        for k in eng.executor._jit_prefill
    )
    for r in (r1, r2, r3):
        assert len(r.async_stream.tokens) == 24
