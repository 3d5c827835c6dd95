"""Real-checkpoint accuracy gate: engine logits vs HF transformers.

Builds tiny HF-format checkpoints *with transformers on CPU*, loads them
through the full loader.py path (safetensors, name remaps, transposes,
merged splits), and asserts the engine's teacher-forced logits match
transformers' forward — the gate VERDICT r1 demanded (every loader
transpose/remap/merge fails this test if wrong). Reference analogue:
test/test_eval.py:105-194 done against ground truth.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chitu_tpu.engine import Engine
from chitu_tpu.kvcache import PagedKVCache

from helpers import tiny_cfg

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _engine_all_logits(eng, ids):
    """Teacher-forced prefill logits [n, V] through the engine's model."""
    model, params, cfg = eng.model, eng.params, eng.cfg
    page = cfg.infer.page_size
    spec = model.kv_cache_spec()
    n = len(ids)
    T = 16
    while T < n:
        T *= 2
    cache = PagedKVCache(
        spec["n_layers"], T // page + 1, page, spec["kv_heads"],
        spec["head_dim"], kv_dim=spec.get("kv_dim", 0),
        layer_groups=spec.get("layer_groups"),
    )
    bt = jnp.arange(T // page + 1, dtype=jnp.int32)
    tok = jnp.zeros((T,), jnp.int32).at[:n].set(jnp.asarray(ids))
    logits, _ = model.prefill(
        params, cache.arrays, tok, bt, jnp.int32(0), jnp.int32(n),
        page_size=page, attn_impl="xla", return_all_logits=True,
    )
    return np.asarray(logits[:n], np.float32)


def _check_parity(eng, hf_model, ids, top1_frac=0.95, rel_tol=0.05):
    got = _engine_all_logits(eng, ids)
    with torch.no_grad():
        want = hf_model(torch.tensor([ids])).logits[0].float().numpy()
    # bf16 engine vs f32 torch: compare argmax agreement + relative error
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree >= top1_frac, f"top-1 agreement {agree}"
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < rel_tol, f"logits rel err {rel}"


def _mk_cfg(tmp_path, margs_kw, infer_kw=None):
    cfg = tiny_cfg(**(infer_kw or {}))
    m = dc.replace(cfg.models, ckpt_dir=str(tmp_path), **margs_kw)
    infer = dc.replace(cfg.infer, do_load=True)
    return dc.replace(cfg, models=m, infer=infer)


IDS = list(np.random.default_rng(0).integers(5, 500, 48))


def test_llama_checkpoint_parity(tmp_path):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    cfg = _mk_cfg(
        tmp_path,
        dict(
            type="hf-llama", dim=128, inter_dim=256, n_layers=2, n_heads=8,
            n_kv_heads=4, vocab_size=512, rope_theta=10000.0,
            rotary_type="hf-llama",
        ),
    )
    _check_parity(Engine(cfg), hf, IDS)


def test_llama_checkpoint_parity_merged_qkv(tmp_path):
    """merge_qkv_gate_up=on exercises the merge transform."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    cfg = _mk_cfg(
        tmp_path,
        dict(
            type="hf-llama", dim=128, inter_dim=256, n_layers=2, n_heads=8,
            n_kv_heads=4, vocab_size=512, rotary_type="hf-llama",
        ),
        {"infer.merge_qkv_gate_up": "on"},
    )
    _check_parity(Engine(cfg), hf, IDS)


def test_qwen2_checkpoint_parity(tmp_path):
    """Qwen2: qkv bias quirk through the loader."""
    hf_cfg = transformers.Qwen2Config(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    hf = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    cfg = _mk_cfg(
        tmp_path,
        dict(
            type="hf-llama", dim=128, inter_dim=256, n_layers=2, n_heads=8,
            n_kv_heads=4, vocab_size=512, rotary_type="hf-llama",
            attn_bias=True,
        ),
        {"infer.merge_qkv_gate_up": "off"},
    )
    _check_parity(Engine(cfg), hf, IDS)


def test_mixtral_checkpoint_parity(tmp_path):
    """Mixtral: expert stacking + router through loaders_moe."""
    hf_cfg = transformers.MixtralConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    hf = transformers.MixtralForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    from chitu_tpu.config import MoEArgs

    cfg = tiny_cfg()
    m = dc.replace(
        cfg.models, type="mixtral", ckpt_dir=str(tmp_path), dim=128,
        inter_dim=256, n_layers=2, n_heads=8, n_kv_heads=4, vocab_size=512,
        rotary_type="hf-llama",
        moe=MoEArgs(
            n_routed_experts=4, n_activated_experts=2, score_func="softmax",
            moe_inter_dim=256, norm_topk_prob=True,
        ),
    )
    cfg = dc.replace(
        cfg, models=m, infer=dc.replace(cfg.infer, do_load=True)
    )
    _check_parity(Engine(cfg), hf, IDS)


def test_deepseek_v3_checkpoint_parity(tmp_path):
    """DeepSeek-V3 (the flagship): MLA q-lora/kv-lora projections, the
    interleaved-pair rotary on the rope dims, sigmoid group-limited
    routing with e_score_correction_bias, shared expert, and dense-first
    layers — ALL through the real loaders_moe.load_deepseek_params path
    against transformers' DeepseekV3ForCausalLM forward."""
    hf_cfg = transformers.DeepseekV3Config(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        moe_intermediate_size=128, num_hidden_layers=3,
        first_k_dense_replace=1, num_attention_heads=4,
        num_key_value_heads=4, n_routed_experts=8, num_experts_per_tok=2,
        n_shared_experts=1, n_group=4, topk_group=2,
        routed_scaling_factor=2.5, norm_topk_prob=True,
        q_lora_rank=32, kv_lora_rank=64, qk_nope_head_dim=32,
        qk_rope_head_dim=16, v_head_dim=32, rope_interleave=True,
        max_position_embeddings=256, tie_word_embeddings=False,
        rope_scaling=None,
    )
    torch.manual_seed(5)
    hf = transformers.DeepseekV3ForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    from chitu_tpu.config import MLAArgs, MoEArgs

    cfg = tiny_cfg()
    m = dc.replace(
        cfg.models, type="deepseek-v3", ckpt_dir=str(tmp_path), dim=128,
        inter_dim=256, n_layers=3, n_heads=4, n_kv_heads=4, vocab_size=512,
        moe=MoEArgs(
            n_routed_experts=8, n_shared_experts=1, n_activated_experts=2,
            n_expert_groups=4, n_limited_groups=2, score_func="sigmoid",
            route_scale=2.5, moe_inter_dim=128, n_dense_layers=1,
            norm_topk_prob=True,
        ),
        mla=MLAArgs(
            q_lora_rank=32, kv_lora_rank=64, qk_nope_head_dim=32,
            qk_rope_head_dim=16, v_head_dim=32,
        ),
    )
    cfg = dc.replace(
        cfg, models=m, infer=dc.replace(cfg.infer, do_load=True)
    )
    # thresholds: measured profile is ~0.01 per-position rel error with
    # 2-3 near-tied argmax flips out of 48 (random-init logits tie; a
    # single sigmoid-routing flip is a discrete jump at one position).
    # Any loader transpose/remap bug drops agreement to ~chance (1/512).
    _check_parity(Engine(cfg), hf, IDS, top1_frac=0.9, rel_tol=0.08)


def test_glm4_checkpoint_parity(tmp_path):
    """GLM-4 (THUDM checkpoint format): fused query_key_value split,
    fused dense_h_to_4h gate/up split, qkv bias, and the glm4
    partial-rotary (interleaved pairs over the first half of each head)
    through loaders_moe.load_glm4_params — checked against transformers'
    GlmForCausalLM, whose rotary is the same interleaved-pair rotation
    (verified channel-mixing: pairs (2i, 2i+1) over rotary_dim)."""
    from safetensors.torch import save_file

    hf_cfg = transformers.GlmConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        head_dim=16, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=256, tie_word_embeddings=False,
        pad_token_id=0,
    )
    torch.manual_seed(6)
    hf = transformers.GlmForCausalLM(hf_cfg).eval()

    # write the ORIGINAL THUDM glm-4 tensor layout (what our glm4 adapter
    # parses): fused qkv / gate-up under transformer.encoder.layers.*
    sd = hf.state_dict()
    out = {
        "transformer.embedding.word_embeddings.weight":
            sd["model.embed_tokens.weight"],
        "transformer.encoder.final_layernorm.weight": sd["model.norm.weight"],
        "transformer.output_layer.weight": sd["lm_head.weight"],
    }
    for i in range(hf_cfg.num_hidden_layers):
        s, d = f"model.layers.{i}", f"transformer.encoder.layers.{i}"
        out[f"{d}.input_layernorm.weight"] = sd[f"{s}.input_layernorm.weight"]
        out[f"{d}.post_attention_layernorm.weight"] = sd[
            f"{s}.post_attention_layernorm.weight"
        ]
        out[f"{d}.self_attention.query_key_value.weight"] = torch.cat(
            [sd[f"{s}.self_attn.{p}_proj.weight"] for p in "qkv"], dim=0
        )
        out[f"{d}.self_attention.query_key_value.bias"] = torch.cat(
            [sd[f"{s}.self_attn.{p}_proj.bias"] for p in "qkv"], dim=0
        )
        out[f"{d}.self_attention.dense.weight"] = sd[f"{s}.self_attn.o_proj.weight"]
        out[f"{d}.mlp.dense_h_to_4h.weight"] = sd[f"{s}.mlp.gate_up_proj.weight"]
        out[f"{d}.mlp.dense_4h_to_h.weight"] = sd[f"{s}.mlp.down_proj.weight"]
    save_file({k: v.contiguous() for k, v in out.items()},
              str(tmp_path / "model.safetensors"))

    cfg = _mk_cfg(
        tmp_path,
        dict(
            type="hf-llama", dim=128, inter_dim=256, n_layers=2, n_heads=8,
            n_kv_heads=4, vocab_size=512, rotary_type="glm4",
            partial_rotary_factor=0.5, attn_bias=True,
        ),
    )
    _check_parity(Engine(cfg), hf, IDS)


def test_meta_llama_pth_checkpoint_parity(tmp_path):
    """Meta-Llama consolidated .pth format (type=llama): Meta tensor
    names, the interleaved 'llama' rotary layout, and the .pth reader —
    against transformers. HF's conversion permutes q/k rows from Meta's
    interleaved layout to the rotate_half layout
    (view(H, d/2, 2, in).transpose(1, 2)); writing Meta format from HF
    weights applies the inverse, so a wrong rotary layout or loader rule
    breaks parity."""

    def unpermute(w, n_heads):
        out, din = w.shape
        return (
            w.view(n_heads, 2, out // n_heads // 2, din)
            .transpose(1, 2)
            .reshape(out, din)
        )

    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(7)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = hf.state_dict()
    out = {
        "tok_embeddings.weight": sd["model.embed_tokens.weight"],
        "norm.weight": sd["model.norm.weight"],
        "output.weight": sd["lm_head.weight"],
    }
    for i in range(2):
        s, d = f"model.layers.{i}", f"layers.{i}"
        out[f"{d}.attention_norm.weight"] = sd[f"{s}.input_layernorm.weight"]
        out[f"{d}.ffn_norm.weight"] = sd[f"{s}.post_attention_layernorm.weight"]
        out[f"{d}.attention.wq.weight"] = unpermute(
            sd[f"{s}.self_attn.q_proj.weight"], 8
        )
        out[f"{d}.attention.wk.weight"] = unpermute(
            sd[f"{s}.self_attn.k_proj.weight"], 4
        )
        out[f"{d}.attention.wv.weight"] = sd[f"{s}.self_attn.v_proj.weight"]
        out[f"{d}.attention.wo.weight"] = sd[f"{s}.self_attn.o_proj.weight"]
        out[f"{d}.feed_forward.w1.weight"] = sd[f"{s}.mlp.gate_proj.weight"]
        out[f"{d}.feed_forward.w3.weight"] = sd[f"{s}.mlp.up_proj.weight"]
        out[f"{d}.feed_forward.w2.weight"] = sd[f"{s}.mlp.down_proj.weight"]
    torch.save(out, tmp_path / "consolidated.00.pth")

    cfg = _mk_cfg(
        tmp_path,
        dict(
            type="llama", dim=128, inter_dim=256, n_layers=2, n_heads=8,
            n_kv_heads=4, vocab_size=512, rope_theta=10000.0,
            rotary_type="llama",
        ),
    )
    _check_parity(Engine(cfg), hf, IDS)


def test_quantized_ppl_vs_hf_ground_truth(tmp_path):
    """soft-fp8 quantization of a REAL checkpoint must track the bf16
    engine's logits closely (the quant accuracy gate grounded in HF
    weights instead of the engine's own output)."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(4)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    margs = dict(
        type="hf-llama", dim=128, inter_dim=256, n_layers=2, n_heads=8,
        n_kv_heads=4, vocab_size=512, rotary_type="hf-llama",
    )
    cfg = _mk_cfg(tmp_path, margs)
    qcfg = dc.replace(
        cfg, quant=dc.replace(cfg.quant, method="soft_fp8", quant_on_load=True)
    )
    got = _engine_all_logits(Engine(qcfg), IDS)
    with torch.no_grad():
        want = hf(torch.tensor([IDS])).logits[0].float().numpy()
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree >= 0.9, f"quantized top-1 agreement {agree}"


# thresholds are loose on purpose: random-init logits are near-tied so
# quantization noise flips many argmaxes; the gate catches catastrophic
# loader/scale bugs (which drop agreement to chance, ~1/512)
@pytest.mark.parametrize("method,min_agree", [
    ("soft_fp8", 0.8), ("w8a16", 0.85), ("w8a8", 0.75),
    ("awq", 0.5), ("llmint8", 0.8),
])
def test_quant_ladder_accuracy_vs_hf(tmp_path, method, min_agree):
    """Every quantization scheme, loaded over a REAL HF checkpoint, must
    keep teacher-forced top-1 agreement with the f32 transformers forward
    (the per-bit-width accuracy gate BASELINE.md demands)."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(10)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    cfg = _mk_cfg(
        tmp_path,
        dict(
            type="hf-llama", dim=256, inter_dim=512, n_layers=2, n_heads=8,
            n_kv_heads=4, vocab_size=512, rotary_type="hf-llama",
        ),
    )
    qcfg = dc.replace(
        cfg, quant=dc.replace(cfg.quant, method=method, quant_on_load=True)
    )
    got = _engine_all_logits(Engine(qcfg), IDS)
    with torch.no_grad():
        want = hf(torch.tensor([IDS])).logits[0].float().numpy()
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree >= min_agree, (method, agree)


def test_fp8_true_act_accuracy_vs_hf(tmp_path):
    """method=fp8 with quant.fp8_act="e4m3": activations round through the
    TRUE fp8 grid (reference act_quant, chitu/ops.py:329-353) and the
    engine still tracks the f32 transformers forward."""
    from chitu_tpu.ops.linear import get_fp8_act, set_fp8_act

    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(10)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    cfg = _mk_cfg(
        tmp_path,
        dict(
            type="hf-llama", dim=256, inter_dim=512, n_layers=2, n_heads=8,
            n_kv_heads=4, vocab_size=512, rotary_type="hf-llama",
        ),
    )
    qcfg = dc.replace(
        cfg,
        quant=dc.replace(
            cfg.quant, method="fp8", quant_on_load=True, fp8_act="e4m3"
        ),
    )
    prev = get_fp8_act()
    try:
        eng = Engine(qcfg)
        assert get_fp8_act() == "e4m3"
        got = _engine_all_logits(eng, IDS)
    finally:
        set_fp8_act(prev)
    with torch.no_grad():
        want = hf(torch.tensor([IDS])).logits[0].float().numpy()
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree >= 0.8, agree


def test_fp8_llama_checkpoint_parity(tmp_path):
    """FP8 llama-family checkpoints (fp8 weights + blockwise
    weight_scale_inv): the loader must wrap them into soft-fp8 QTensors
    — it used to keep the raw fp8 bytes and silently DROP the scales,
    generating garbage (review finding)."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(11)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()

    # quantize the projections to blockwise fp8 (128x128 absmax / 448)
    from safetensors.torch import save_file

    sd = dict(hf.state_dict())
    out = {}
    for k, v in sd.items():
        import re as _re

        if _re.fullmatch(
            r"model\.layers\.\d+\.(self_attn|mlp)\.\w+_proj\.weight", k
        ):
            w = v.float()
            O, I = w.shape
            bo, bi = -(-O // 128), -(-I // 128)
            wp = torch.zeros(bo * 128, bi * 128)
            wp[:O, :I] = w
            blocks = wp.reshape(bo, 128, bi, 128)
            absmax = blocks.abs().amax(dim=(1, 3)).clamp(min=1e-8)
            scale = absmax / 448.0
            q = (blocks / scale[:, None, :, None]).reshape(
                bo * 128, bi * 128
            )[:O, :I]
            out[k] = q.to(torch.float8_e4m3fn)
            out[k[: -len(".weight")] + ".weight_scale_inv"] = scale
        else:
            out[k] = v
    save_file(out, str(tmp_path / "model.safetensors"))

    cfg = _mk_cfg(
        tmp_path,
        dict(
            type="hf-llama", dim=256, inter_dim=512, n_layers=2, n_heads=8,
            n_kv_heads=4, vocab_size=512, rotary_type="hf-llama",
        ),
        {"infer.merge_qkv_gate_up": "off"},
    )
    eng = Engine(cfg)
    from chitu_tpu.ops.qtensor import QTensor

    assert isinstance(eng.params["layers"]["wq"], QTensor)
    got = _engine_all_logits(eng, IDS)
    with torch.no_grad():
        want = hf(torch.tensor([IDS])).logits[0].float().numpy()
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree >= 0.85, agree  # fp8 quantization noise on random init


def test_meta_llama_mp_sharded_checkpoint_parity(tmp_path):
    """MP-sharded Meta checkpoints (consolidated.00/01.pth holding
    tensor-parallel slices) must concatenate along each family's
    parallel dim — later shards used to silently overwrite earlier ones
    (review finding)."""

    def unpermute(w, n_heads):
        out, din = w.shape
        return (
            w.view(n_heads, 2, out // n_heads // 2, din)
            .transpose(1, 2)
            .reshape(out, din)
        )

    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(12)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = hf.state_dict()
    full = {
        "tok_embeddings.weight": sd["model.embed_tokens.weight"],
        "norm.weight": sd["model.norm.weight"],
        "output.weight": sd["lm_head.weight"],
    }
    for i in range(2):
        s, d = f"model.layers.{i}", f"layers.{i}"
        full[f"{d}.attention_norm.weight"] = sd[f"{s}.input_layernorm.weight"]
        full[f"{d}.ffn_norm.weight"] = sd[f"{s}.post_attention_layernorm.weight"]
        full[f"{d}.attention.wq.weight"] = unpermute(
            sd[f"{s}.self_attn.q_proj.weight"], 8
        )
        full[f"{d}.attention.wk.weight"] = unpermute(
            sd[f"{s}.self_attn.k_proj.weight"], 4
        )
        full[f"{d}.attention.wv.weight"] = sd[f"{s}.self_attn.v_proj.weight"]
        full[f"{d}.attention.wo.weight"] = sd[f"{s}.self_attn.o_proj.weight"]
        full[f"{d}.feed_forward.w1.weight"] = sd[f"{s}.mlp.gate_proj.weight"]
        full[f"{d}.feed_forward.w3.weight"] = sd[f"{s}.mlp.up_proj.weight"]
        full[f"{d}.feed_forward.w2.weight"] = sd[f"{s}.mlp.down_proj.weight"]

    from chitu_tpu.loader import _meta_mp_dim

    shards = [{}, {}]
    for k, v in full.items():
        dim = _meta_mp_dim(k)
        if dim is None:
            shards[0][k] = v
            shards[1][k] = v
        else:
            halves = torch.chunk(v, 2, dim=dim)
            shards[0][k], shards[1][k] = halves[0], halves[1]
    torch.save(shards[0], tmp_path / "consolidated.00.pth")
    torch.save(shards[1], tmp_path / "consolidated.01.pth")

    cfg = _mk_cfg(
        tmp_path,
        dict(
            type="llama", dim=128, inter_dim=256, n_layers=2, n_heads=8,
            n_kv_heads=4, vocab_size=512, rotary_type="llama",
        ),
    )
    _check_parity(Engine(cfg), hf, IDS)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_llama_checkpoint_parity_merged_qkv_tp4(tmp_path):
    """Rank-major merged qkv/gate_up under tp=4 (VERDICT r2 missing 3;
    reference splits->chunks->re-merges merged checkpoints per rank,
    model_hf_llama.py:598-602): the loader must assemble the merged
    layout so column shards land on whole (q_r|k_r|v_r) chunks — logits
    still match transformers, and per-device merged weight bytes are 1/4."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(7)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    cfg = _mk_cfg(
        tmp_path,
        dict(
            type="hf-llama", dim=128, inter_dim=256, n_layers=2, n_heads=8,
            n_kv_heads=4, vocab_size=512, rotary_type="hf-llama",
        ),
        {"infer.merge_qkv_gate_up": "on", "infer.tp_size": 4},
    )
    eng = Engine(cfg)
    assert eng.model.merge_tp == 4
    wqkv = eng.params["layers"]["wqkv"]
    ss = wqkv.sharding.shard_shape(wqkv.shape)
    assert ss[-1] == wqkv.shape[-1] // 4, "merged qkv not tp-sharded"
    gu = eng.params["layers"]["w_gate_up"]
    assert gu.sharding.shard_shape(gu.shape)[-1] == gu.shape[-1] // 4
    _check_parity(eng, hf, IDS)
