"""Model numerics: decode-vs-prefill and chunked-prefill consistency.

The pure-jnp attention path is the correctness oracle (the RefAttnBackend
role, reference: chitu/attn_backend.py:246-501); these tests pin the
prefill/decode/cache contract itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chitu_tpu.kvcache import PagedKVCache
from chitu_tpu.models import build_model

from helpers import tiny_cfg


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_cfg()
    model = build_model(cfg.models, cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, model, params


def fresh_cache(model, pages=16, page=16):
    spec = model.kv_cache_spec()
    return PagedKVCache(
        spec["n_layers"], pages, page, spec["kv_heads"], spec["head_dim"]
    )


def test_decode_matches_prefill(model_and_params):
    cfg, model, params = model_and_params
    page = 16
    bt = jnp.array([0, 1, 2, 3, -1, -1, -1, -1], jnp.int32)
    tokens = jnp.arange(10, dtype=jnp.int32)

    cache = fresh_cache(model)
    tok_pad = jnp.pad(tokens, (0, 6))
    _, arrs = model.prefill(
        params, cache.arrays, tok_pad, bt, jnp.int32(0), jnp.int32(10), page
    )
    dec_logits, _ = model.decode(
        params,
        arrs,
        jnp.array([5], jnp.int32),
        jnp.array([10], jnp.int32),
        bt[None],
        jnp.array([True]),
        page,
    )

    cache2 = fresh_cache(model)
    tok11 = jnp.pad(jnp.concatenate([tokens, jnp.array([5], jnp.int32)]), (0, 5))
    pre_logits, _ = model.prefill(
        params, cache2.arrays, tok11, bt, jnp.int32(0), jnp.int32(11), page
    )
    np.testing.assert_allclose(
        np.asarray(dec_logits[0]), np.asarray(pre_logits), atol=0.05, rtol=0.05
    )
    # same argmax -> same greedy token
    assert int(jnp.argmax(dec_logits[0])) == int(jnp.argmax(pre_logits))


def test_chunked_prefill_matches_full(model_and_params):
    cfg, model, params = model_and_params
    page = 16
    bt = jnp.array([0, 1, 2, 3, -1, -1, -1, -1], jnp.int32)
    tokens = jnp.arange(20, dtype=jnp.int32) % 7

    cache = fresh_cache(model)
    full, _ = model.prefill(
        params,
        cache.arrays,
        jnp.pad(tokens, (0, 12)),
        bt,
        jnp.int32(0),
        jnp.int32(20),
        page,
    )

    cache2 = fresh_cache(model)
    arrs = cache2.arrays
    _, arrs = model.prefill(
        params, arrs, tokens[:16], bt, jnp.int32(0), jnp.int32(16), page
    )
    last, _ = model.prefill(
        params,
        arrs,
        jnp.pad(tokens[16:], (0, 12)),
        bt,
        jnp.int32(16),
        jnp.int32(4),
        page,
    )
    np.testing.assert_allclose(
        np.asarray(last), np.asarray(full), atol=1e-2, rtol=1e-2
    )


def test_padding_invariance(model_and_params):
    """Extra padding rows must not change valid-token logits."""
    cfg, model, params = model_and_params
    page = 16
    bt = jnp.array([0, 1, 2, 3, -1, -1, -1, -1], jnp.int32)
    tokens = (jnp.arange(9, dtype=jnp.int32) * 3) % 11

    outs = []
    for T in (16, 32):
        cache = fresh_cache(model)
        lg, _ = model.prefill(
            params,
            cache.arrays,
            jnp.pad(tokens, (0, T - 9)),
            bt,
            jnp.int32(0),
            jnp.int32(9),
            page,
        )
        outs.append(np.asarray(lg))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-2, rtol=2e-2)


def test_all_logits_mode(model_and_params):
    cfg, model, params = model_and_params
    page = 16
    bt = jnp.array([0, 1, -1, -1], jnp.int32)
    tokens = jnp.arange(8, dtype=jnp.int32)
    cache = fresh_cache(model)
    all_lg, _ = model.prefill(
        params,
        cache.arrays,
        jnp.pad(tokens, (0, 8)),
        bt,
        jnp.int32(0),
        jnp.int32(8),
        page,
        return_all_logits=True,
    )
    assert all_lg.shape[0] == 16
    cache2 = fresh_cache(model)
    last, _ = model.prefill(
        params,
        cache2.arrays,
        jnp.pad(tokens, (0, 8)),
        bt,
        jnp.int32(0),
        jnp.int32(8),
        page,
    )
    np.testing.assert_allclose(
        np.asarray(all_lg[7]), np.asarray(last), atol=1e-3, rtol=1e-3
    )
