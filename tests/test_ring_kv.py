"""Ring-sharded KV cache (infer.ring_kv): pages stripe over the 'dp'
axis, appends are owner-writes, attention combines per-shard flash
stats over the ring (ops/attention_ring.py). ADDITIVE over the reference
(no sequence/capacity sharding there — SURVEY.md §5 long-context).

Contracts pinned here:
- op-level: ring decode/prefill attention == the replicated-pool oracle
- engine-level: dp=4 ring engine emits the same greedy tokens as the
  single-device engine, with per-device pool bytes == total / 4
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chitu_tpu.engine import Engine
from chitu_tpu.parallel import make_mesh
from chitu_tpu.task import SampleParams

from helpers import tiny_cfg


def _ring_cfg(dp=1, **kw):
    cfg = tiny_cfg(**kw)
    m = dataclasses.replace(
        cfg.models,
        n_layers=2,
        dim=256,
        n_heads=8,
        n_kv_heads=4,
        inter_dim=512,
        vocab_size=512,
    )
    infer = dataclasses.replace(
        cfg.infer, dp_size=dp, ring_kv=dp > 1, merge_qkv_gate_up="off"
    )
    return dataclasses.replace(cfg, models=m, infer=infer)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_ring_decode_attention_matches_oracle():
    from chitu_tpu.ops import attention as attn_ops
    from chitu_tpu.ops import attention_ring as ring_ops

    L, P, page, KV, Dh, H, B, mp = 2, 8, 16, 2, 32, 4, 3, 4
    M = 2 * KV * Dh  # 128: lane-aligned split-KV minor
    key = jax.random.PRNGKey(0)
    pool = jax.random.normal(key, (L, P, page, M), jnp.float32).astype(
        jnp.bfloat16
    )
    q = jax.random.normal(
        jax.random.PRNGKey(1), (B, H, Dh), jnp.float32
    ).astype(jnp.bfloat16)
    bt = jnp.asarray(
        [[0, 3, 5, -1], [1, 2, -1, -1], [4, 6, 7, 2]], jnp.int32
    )
    seq_lens = jnp.asarray([40, 17, 33], jnp.int32)
    layer = jnp.int32(1)

    want = attn_ops.attend_decode(
        q, pool, layer, bt, seq_lens, page, KV, Dh, True, impl="xla"
    )
    mesh = make_mesh(dp=4, devices=jax.devices()[:4])
    got = ring_ops.attend_decode_ring(
        q, pool, layer, bt, seq_lens, page, KV, Dh, True, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_ring_append_owner_writes():
    from chitu_tpu.ops import attention as attn_ops
    from chitu_tpu.ops import attention_ring as ring_ops

    L, P, page, KV, Dh, B, mp = 1, 8, 16, 2, 32, 2, 4
    M = 2 * KV * Dh
    pool = jnp.zeros((L, P, page, M), jnp.bfloat16)
    k = jnp.ones((B, KV, Dh), jnp.bfloat16)
    v = jnp.full((B, KV, Dh), 2.0, jnp.bfloat16)
    bt = jnp.asarray([[2, 5, -1, -1], [7, 1, 3, -1]], jnp.int32)
    seq_lens = jnp.asarray([17, 35], jnp.int32)  # pages 1 and 2
    valid = jnp.asarray([True, True])

    want = attn_ops.append_decode(
        pool, jnp.int32(0), k, v, bt, seq_lens, valid, page
    )
    mesh = make_mesh(dp=4, devices=jax.devices()[:4])
    got = ring_ops.append_decode_ring(
        pool, jnp.int32(0), k, v, bt, seq_lens, valid, page, mesh
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_ring_kv_engine_matches_single_device():
    p = SampleParams(temperature=0.0, max_new_tokens=6)
    base = Engine(_ring_cfg())
    want = base.generate("the quick brown fox jumps over", p)

    eng = Engine(_ring_cfg(dp=4))
    assert eng.executor.ring_kv_axis == "dp"
    got = eng.generate("the quick brown fox jumps over", p)
    assert got == want

    # capacity actually scales: per-device pool bytes = total / dp
    pool = next(iter(eng.cache.arrays.values()))
    shard = pool.sharding.shard_shape(pool.shape)
    assert shard[1] == pool.shape[1] // 4

    # and a concurrent burst drains cleanly through the ring pool
    reqs = [
        eng.submit(f"prompt number {i}", p) for i in range(4)
    ]
    eng.run_until_complete()
    for r in reqs:
        assert len(r.async_stream.tokens) == 6


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_ring_kv_chunked_prefill_matches():
    """Long prompt crosses page boundaries -> chunked prefill reads
    earlier chunks' pages from their owner shards."""
    p = SampleParams(temperature=0.0, max_new_tokens=4)
    kw = {"infer.prefill_chunk": 32}
    base = Engine(_ring_cfg(**kw))
    prompt = "one two three four five six seven eight " * 2
    want = base.generate(prompt, p)

    eng = Engine(_ring_cfg(dp=4, **kw))
    got = eng.generate(prompt, p)
    assert got == want


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_ring_kv_composes_with_tp():
    """dp=2 ring x tp=2 heads: pages stripe over 'dp' AND the pool minor
    shards over 'tp' (per-device bytes = total/4); tokens match the
    single-device engine."""
    p = SampleParams(temperature=0.0, max_new_tokens=6)
    base = Engine(_ring_cfg())
    want = base.generate("ring and tensor parallel together", p)

    cfg = _ring_cfg(dp=2)
    infer = dataclasses.replace(cfg.infer, tp_size=2)
    eng = Engine(dataclasses.replace(cfg, infer=infer))
    assert eng.executor.ring_kv_axis == "dp"
    assert eng.model.kv_tp_shard
    got = eng.generate("ring and tensor parallel together", p)
    assert got == want

    pool = next(iter(eng.cache.arrays.values()))
    shard = pool.sharding.shard_shape(pool.shape)
    assert shard[1] == pool.shape[1] // 2  # pages over dp
    assert shard[3] == pool.shape[3] // 2  # minor over tp


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_ring_decode_window_softcap_matches_oracle():
    from chitu_tpu.ops import attention as attn_ops
    from chitu_tpu.ops import attention_ring as ring_ops

    L, P, page, KV, Dh, H, B = 2, 8, 16, 2, 32, 4, 3
    M = 2 * KV * Dh
    pool = jax.random.normal(
        jax.random.PRNGKey(0), (L, P, page, M), jnp.float32
    ).astype(jnp.bfloat16)
    q = jax.random.normal(
        jax.random.PRNGKey(1), (B, H, Dh), jnp.float32
    ).astype(jnp.bfloat16)
    bt = jnp.asarray(
        [[0, 3, 5, -1], [1, 2, -1, -1], [4, 6, 7, 2]], jnp.int32
    )
    seq_lens = jnp.asarray([40, 17, 33], jnp.int32)
    mesh = make_mesh(dp=4, devices=jax.devices()[:4])
    for window, softcap in [(24, 0.0), (0, 8.0), (24, 8.0)]:
        want = attn_ops.attend_decode(
            q, pool, jnp.int32(1), bt, seq_lens, page, KV, Dh, True,
            impl="xla", window=window, softcap=softcap,
        )
        got = ring_ops.attend_decode_ring(
            q, pool, jnp.int32(1), bt, seq_lens, page, KV, Dh, True,
            mesh=mesh, window=window, softcap=softcap,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2,
        )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_ring_kv_deepseek_mla_matches_single_device():
    """DeepSeek merged-MLA latent pool over the 'dp' ring: the flagship
    long-context regime (576B/token latent pages stripe over the ring)."""
    from test_deepseek import _ds_cfg

    p = SampleParams(temperature=0.0, max_new_tokens=6)
    base = Engine(_ds_cfg())
    want = base.generate("latent pages around the ring", p)

    cfg = _ds_cfg(**{"infer.dp_size": 4, "infer.ring_kv": "true"})
    eng = Engine(cfg)
    assert eng.executor.ring_kv_axis == "dp"
    got = eng.generate("latent pages around the ring", p)
    assert got == want

    pool = next(iter(eng.cache.arrays.values()))
    shard = pool.sharding.shard_shape(pool.shape)
    assert shard[1] == pool.shape[1] // 4


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_ring_kv_composes_with_pp():
    """dp=2 ring x pp=2 stages: pages stripe over 'dp' AND the pool's
    layer dim shards over 'pp' — a stage that does not own the current
    layer contributes zero pages and the flash-stat combine folds over
    ('dp', 'pp'). Tokens match the single-device engine and per-device
    pool bytes = total / 4."""
    p = SampleParams(temperature=0.0, max_new_tokens=6)
    base = Engine(_ring_cfg())
    want = base.generate("ring and pipeline parallel together", p)

    cfg = _ring_cfg(dp=2)
    infer = dataclasses.replace(cfg.infer, pp_size=2)
    eng = Engine(dataclasses.replace(cfg, infer=infer))
    assert eng.executor.ring_kv_axis == "dp"
    got = eng.generate("ring and pipeline parallel together", p)
    assert got == want

    pool = next(iter(eng.cache.arrays.values()))
    shard = pool.sharding.shard_shape(pool.shape)
    assert shard[0] == pool.shape[0] // 2  # layers over pp
    assert shard[1] == pool.shape[1] // 2  # pages over dp

    # chunked prefill reads earlier chunks' pages across both axes
    reqs = [eng.submit(f"burst item number {i}", p) for i in range(4)]
    eng.run_until_complete()
    for r in reqs:
        assert len(r.async_stream.tokens) == 6
