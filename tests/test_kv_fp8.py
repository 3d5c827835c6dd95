"""fp8 KV cache (infer.kv_dtype=fp8): e4m3 bits stored in int8 lanes,
dequantized on load (oracle: unpack_pool; pallas: in-kernel bit trick).

ADDITIVE over the reference (bf16/fp16 caches only there). Correctness
strategy: values already ON the e4m3 grid roundtrip exactly, so the
fp8 pool must reproduce the bf16 pool's attention bit-for-bit on such
inputs; arbitrary values are covered by an engine-level logits-delta
gate (quantization error is bounded, not zero).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chitu_tpu.engine import Engine
from chitu_tpu.models.common import kv_decode, kv_encode
from chitu_tpu.ops import attention as attn_ops
from chitu_tpu.task import SampleParams

from helpers import tiny_cfg


def _e4m3_grid(key, shape):
    x = jax.random.normal(key, shape, jnp.bfloat16)
    return kv_decode(kv_encode(x, jnp.int8))  # snap to the e4m3 grid


def test_encode_decode_roundtrip():
    x = _e4m3_grid(jax.random.PRNGKey(0), (16, 4, 8))
    y = kv_decode(kv_encode(x, jnp.int8))
    assert jnp.array_equal(x, y)
    # bf16 pools pass through untouched
    assert kv_encode(x, jnp.bfloat16).dtype == jnp.bfloat16


def test_fp8_pool_attention_matches_bf16_on_grid_values():
    """append + decode-attend over both pool dtypes with e4m3-grid K/V:
    outputs must match exactly (the fp8 path adds no error for
    representable values)."""
    KV, D, page, mp = 2, 8, 16, 2
    M = 2 * KV * D  # unpadded minor for simplicity (< 128 ok on oracle)
    from chitu_tpu.models.common import kv_pool_minor

    M = kv_pool_minor(KV, D)
    key = jax.random.PRNGKey(1)
    T = 20
    k = _e4m3_grid(key, (T, KV, D))
    v = _e4m3_grid(jax.random.fold_in(key, 1), (T, KV, D))
    q = jax.random.normal(jax.random.fold_in(key, 2), (1, 4, D), jnp.bfloat16)
    bt = jnp.array([[0, 1]], jnp.int32)

    outs = {}
    for dt in (jnp.bfloat16, jnp.int8):
        pool = jnp.zeros((1, 2, page, M), dt)
        pool = attn_ops.append_prefill(
            pool, jnp.int32(0), k, v, bt[0], jnp.arange(T), jnp.int32(T),
            page,
        )
        outs[str(dt)] = attn_ops.attend_decode(
            q, pool, jnp.int32(0), bt, jnp.array([T], jnp.int32), page,
            KV, D, split_kv=True, impl="xla",
        )
    np.testing.assert_array_equal(
        np.asarray(outs[str(jnp.bfloat16)], np.float32),
        np.asarray(outs[str(jnp.int8)], np.float32),
    )


@pytest.fixture(scope="module")
def engines():
    base = tiny_cfg(**{"infer.stop_with_eos": False})
    fp8 = tiny_cfg(
        **{"infer.stop_with_eos": False, "infer.kv_dtype": "fp8"}
    )
    return Engine(base), Engine(fp8)


def test_engine_fp8_kv_generates(engines):
    base, fp8 = engines
    assert next(iter(fp8.cache.arrays.values())).dtype == jnp.int8
    p = SampleParams(temperature=0.0, max_new_tokens=8)
    out = fp8.generate("the lighthouse keeper", p)
    assert len(out) == 8
    # deterministic across runs
    assert fp8.generate("the lighthouse keeper", p) == out


def test_engine_fp8_kv_logits_close(engines):
    """Teacher-forced prefill logits with the fp8 cache stay close to the
    bf16 cache (e4m3 has ~2^-3 relative mantissa error; the output
    distribution must not be distorted)."""
    base, fp8 = engines
    rng = np.random.default_rng(0)
    prompt = rng.integers(300, 500, 48).tolist()
    p = SampleParams(temperature=0.0, max_new_tokens=2)

    def logits_of(e):
        # run a prefill; grab the last-token logits via the executor's
        # all-logits prefill program
        ex = e.executor
        from chitu_tpu.task import Task, UserRequest

        req = e.submit("", p, prompt_tokens=prompt)
        t = e.pool[f"task-{req.request_id}"]
        ex.slots.alloc(t.task_id)
        e.cache.allocator.ensure(t.task_id, len(prompt) + 1)
        fn = ex._prefill_fn(64, 2, all_logits=True)
        bt = e.cache.allocator.block_table([t.task_id], 2)[0]
        chunk = np.zeros((64,), np.int32)
        chunk[: len(prompt)] = prompt
        logits, e.cache.arrays = fn(
            ex.params, e.cache.arrays, jnp.asarray(chunk),
            jnp.asarray(bt), jnp.int32(0), jnp.int32(len(prompt)),
        )
        e.terminate()
        return np.asarray(logits[: len(prompt)], np.float32)

    lb = logits_of(Engine(tiny_cfg(**{"infer.stop_with_eos": False})))
    lf = logits_of(
        Engine(
            tiny_cfg(
                **{"infer.stop_with_eos": False, "infer.kv_dtype": "fp8"}
            )
        )
    )
    # cosine similarity per position
    num = (lb * lf).sum(-1)
    den = np.linalg.norm(lb, axis=-1) * np.linalg.norm(lf, axis=-1)
    cos = num / np.maximum(den, 1e-9)
    assert cos.min() > 0.98, cos.min()


def test_deepseek_mla_fp8_latent_cache():
    """fp8 KV with DeepSeek MLA: the merged 576-dim latent pages round
    through e4m3 lanes (kernel + oracle dequant) and greedy decode stays
    deterministic and close to the bf16-cache output."""
    from chitu_tpu.config import load_config

    def ds_cfg(kvd):
        return load_config(
            overrides=[
                "models=tiny-deepseek-debug",
                "infer.max_seq_len=128",
                "infer.max_reqs=4",
                "infer.page_size=16",
                "infer.stop_with_eos=false",
                f"infer.kv_dtype={kvd}",
            ]
        )

    p = SampleParams(temperature=0.0, max_new_tokens=8)
    fp8 = Engine(ds_cfg("fp8"))
    assert next(iter(fp8.cache.arrays.values())).dtype == jnp.int8
    out = fp8.generate("mla latent probe", p)
    assert len(out) == 8
    assert fp8.generate("mla latent probe", p) == out
    bf16 = Engine(ds_cfg("bf16"))
    ref = bf16.generate("mla latent probe", p)
    # same argmax path for at least the first tokens (random weights give
    # near-tied logits; full-sequence equality is not guaranteed)
    assert out[:2] == ref[:2]


def test_fp8_kv_composes_with_prefix_cache_and_spec_decode():
    """fp8 pool + prefix caching + n-gram speculative decoding in one
    engine: shared prompt pages hold e4m3 bits, the verify step's K+1
    appends encode through the same path, outputs stay deterministic."""
    eng = Engine(
        tiny_cfg(
            **{
                "infer.stop_with_eos": False,
                "infer.kv_dtype": "fp8",
                "infer.prefix_cache": True,
                "infer.spec_decode": "ngram",
            }
        )
    )
    p = SampleParams(temperature=0.0, max_new_tokens=10)
    shared = "the same system prompt for every request in this batch"
    outs = [eng.generate(shared + f" user {i}", p) for i in range(3)]
    assert all(len(o) == 10 for o in outs)
    # repeat run hits the prefix cache for the shared pages; tokens match
    outs2 = [eng.generate(shared + f" user {i}", p) for i in range(3)]
    assert outs == outs2
