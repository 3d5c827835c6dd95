"""Packed varlen prefill: R ragged prompts in one jitted call must match
per-request prefill exactly (reference: chitu/utils.py:84-100 VarLens,
executor.py:118-131 flash_attn_varlen path)."""

import dataclasses as dc

import jax
import pytest

from chitu_tpu.engine import Engine
from chitu_tpu.task import SampleParams

from helpers import tiny_cfg


def _cfg(**kw):
    cfg = tiny_cfg(**kw)
    m = dc.replace(
        cfg.models, n_layers=2, dim=256, n_heads=8, n_kv_heads=4,
        inter_dim=512, vocab_size=512,
    )
    return dc.replace(cfg, models=m)


def _ragged_batch(eng, p):
    prompts = [
        "short",
        "a somewhat longer prompt with more words in it",
        "mid size prompt here",
        "x",
        "another mid one",
    ]
    reqs = [eng.submit(s, p) for s in prompts]
    eng.run_until_complete()
    return [list(r.async_stream.tokens) for r in reqs]


def test_packed_prefill_matches_sequential():
    p = SampleParams(temperature=0.0, max_new_tokens=5)
    packed = Engine(_cfg())
    got = _ragged_batch(packed, p)

    # oracle: one request at a time goes through the single-request
    # prefill path (no packing possible)
    seq = Engine(_cfg())
    want = [
        seq.generate(s, p)
        for s in [
            "short",
            "a somewhat longer prompt with more words in it",
            "mid size prompt here",
            "x",
            "another mid one",
        ]
    ]
    assert got == want


def test_packed_prefill_single_and_burst_mix():
    """Mixed burst: some long (chunked path) + many short (packed)."""
    cfg = _cfg(**{"infer.prefill_chunk": 32})
    eng = Engine(cfg)
    p = SampleParams(temperature=0.0, max_new_tokens=4)
    long_prompt = "w " * 40  # > chunk cap -> chunked per-request path
    reqs = [eng.submit(long_prompt, p)] + [
        eng.submit(f"prompt {i}", p) for i in range(4)
    ]
    eng.run_until_complete()
    assert all(len(r.async_stream.tokens) == 4 for r in reqs)


def test_deepseek_packed_prefill_matches_sequential():
    """DeepSeek (merged-MLA cache) packed prefill logits == per-request
    prefill logits (numeric gate: greedy-token equality is not well-
    defined across batch compositions because the MoE combine's f32
    scatter-add order depends on co-batched tokens' routing — the same
    property as the reference's atomics-based fused MoE)."""
    import sys

    import numpy as np

    sys.path.insert(0, "tests")
    from test_deepseek import _ds_cfg
    from chitu_tpu.kvcache import PagedKVCache
    from chitu_tpu.ops.pallas_attention import packed_q_block

    import jax.numpy as jnp

    eng = Engine(_ds_cfg())
    model, params, cfg = eng.model, eng.params, eng.cfg
    page = cfg.infer.page_size
    tok = eng.tokenizer
    idss = [
        tok.encode(s, bos=True)
        for s in ["mla packed a", "a somewhat longer mla prompt", "b"]
    ]
    spec = model.kv_cache_spec()

    def fresh(npages):
        return PagedKVCache(
            spec["n_layers"], npages, page, spec["kv_heads"],
            spec["head_dim"], kv_dim=spec.get("kv_dim", 0),
            layer_groups=spec.get("layer_groups"),
        )

    seq_logits = []
    for ids in idss:
        c = fresh(8)
        T = 16
        while T < len(ids):
            T *= 2
        t = jnp.zeros((T,), jnp.int32).at[: len(ids)].set(jnp.asarray(ids))
        lg, _ = model.prefill(
            params, c.arrays, t, jnp.arange(8, dtype=jnp.int32),
            jnp.int32(0), jnp.int32(len(ids)), page_size=page,
            attn_impl="xla",
        )
        seq_logits.append(np.asarray(lg, np.float32))

    M = next(iter(fresh(8).arrays.values())).shape[-1]
    Tq = packed_q_block(model.args.n_heads, M, page, model.head_dim)
    lens = [len(i) for i in idss]
    padded = [(n + Tq - 1) // Tq * Tq for n in lens]
    Tb = Tq
    while Tb < sum(padded):
        Tb *= 2
    NB, R, mp = Tb // Tq, len(idss), 8
    tokens = np.zeros((Tb,), np.int32)
    seg = np.full((Tb,), -1, np.int32)
    pos = np.full((Tb,), -1, np.int32)
    bseg = np.full((NB,), -1, np.int32)
    bq = np.zeros((NB,), np.int32)
    bts = np.zeros((R, mp), np.int32)
    tls = np.zeros((R,), np.int32)
    last = np.zeros((R,), np.int32)
    off = 0
    for r, ids in enumerate(idss):
        n = len(ids)
        tokens[off : off + n] = ids
        seg[off : off + n] = r
        pos[off : off + n] = np.arange(n)
        tls[r], last[r] = n, off + n - 1
        bts[r] = np.arange(r * 8, (r + 1) * 8)
        nb, b0 = padded[r] // Tq, off // Tq
        bseg[b0 : b0 + nb] = r
        bq[b0 : b0 + nb] = np.arange(nb) * Tq
        off += padded[r]
    lg, _ = model.prefill_packed(
        params, fresh(8 * R).arrays, jnp.asarray(tokens), jnp.asarray(seg),
        jnp.asarray(pos), jnp.asarray(bts), jnp.asarray(tls),
        jnp.asarray(last), jnp.asarray(bseg), jnp.asarray(bq),
        page_size=page, attn_impl="xla",
    )
    lg = np.asarray(lg, np.float32)
    for r in range(R):
        rel = np.linalg.norm(lg[r] - seq_logits[r]) / np.linalg.norm(
            seq_logits[r]
        )
        assert rel < 1e-4, (r, rel)
        assert lg[r].argmax() == seq_logits[r].argmax()


def test_hybrid_fused_append_matches_scatter(monkeypatch):
    """The hybrid step's fused in-kernel appends (r5) must produce the
    same tokens as the XLA-scatter hybrid on the same pallas kernels."""
    import dataclasses as dc

    from chitu_tpu.config import load_config
    from chitu_tpu.engine import Engine
    from chitu_tpu.ops import pallas_attention as pk
    from chitu_tpu.task import SampleParams

    def cfg_of():
        cfg = load_config(
            overrides=[
                "models=tiny-llama-debug",
                "infer.max_seq_len=256",
                "infer.max_reqs=4",
                "infer.page_size=64",
                "infer.stop_with_eos=false",
                "infer.attn_type=pallas",
                "infer.merge_qkv_gate_up=off",
            ]
        )
        m = dc.replace(
            cfg.models, n_layers=2, dim=512, n_heads=4, n_kv_heads=2,
            head_dim=128, inter_dim=256, vocab_size=512,
        )
        return dc.replace(cfg, models=m)

    def run(fused_on):
        if not fused_on:
            monkeypatch.setattr(
                pk, "prefill_packed_fused_ok", lambda *a, **k: False
            )
        eng = Engine(cfg_of())
        keeper = eng.submit(
            "keeper runs long", SampleParams(temperature=0.0, max_new_tokens=24)
        )
        eng.step()  # prefill the keeper
        eng.step()  # it decodes now
        burst = [
            eng.submit(f"hybrid row {i}", SampleParams(temperature=0.0, max_new_tokens=6))
            for i in range(3)
        ]
        eng.run_until_complete()
        if not fused_on:
            monkeypatch.undo()
        return [list(keeper.async_stream.tokens)] + [
            list(r.async_stream.tokens) for r in burst
        ]

    want = run(False)
    got = run(True)
    assert got == want, (got, want)
