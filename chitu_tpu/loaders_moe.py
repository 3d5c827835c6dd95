"""Checkpoint adapters for the MoE families (Mixtral, DeepSeek-V3) and
GLM-4 fused layouts.

Capability parity with the reference's per-family checkpoint transforms:
- Mixtral w1/w3/w2 -> gate/up/down remap + expert stacking
  (reference: chitu/models/model_hf_mixtral.py:171-178)
- DeepSeek key remap + expert/qkv merges into stacked tensors
  (reference: chitu/backend.py:449-477, model_deepseek_v3.py:1167-1288),
  including native-FP8 weights + `weight_scale_inv` blockwise scales which
  load directly as soft-fp8 QTensors (keep_dtype_in_checkpoint,
  reference: backend.py:388-393)
- GLM-4 fused query_key_value / dense_h_to_4h splitting
  (reference: chitu/models/model_hf_llama.py:577-596)
"""

from __future__ import annotations

import re
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from chitu_tpu.loader import iter_checkpoint
from chitu_tpu.ops.qtensor import QTensor, QuantKind
from chitu_tpu.utils import get_logger

logger = get_logger()


def _stack(vals: List[Any]):
    """Stack values or QTensors along a new leading axis."""
    if isinstance(vals[0], QTensor):
        if any(v.in_perm is not None for v in vals):
            # act-order GPTQ: every layer needs a perm row (identity where
            # a layer happened to be in natural order)
            perms = jnp.stack([
                v.in_perm
                if v.in_perm is not None
                else jnp.arange(v.data.shape[-2], dtype=jnp.int32)
                for v in vals
            ])
        else:
            perms = None
        return QTensor(
            data=jnp.stack([v.data for v in vals]),
            scale=jnp.stack([v.scale for v in vals]),
            zeros=(
                jnp.stack([v.zeros for v in vals])
                if vals[0].zeros is not None
                else None
            ),
            kind=vals[0].kind,
            block=vals[0].block,
            in_perm=perms,
        )
    return jnp.stack([jnp.asarray(v) for v in vals])


def _to_bf16(arr: np.ndarray) -> jnp.ndarray:
    out = jnp.asarray(arr)
    if jnp.issubdtype(out.dtype, jnp.floating) and out.dtype != jnp.bfloat16:
        out = out.astype(jnp.bfloat16)
    return out


class _Staging:
    """Collects per-layer tensors then stacks along a leading axis."""

    def __init__(self):
        self.flat: Dict[str, Any] = {}
        self.per_layer: Dict[str, Dict[int, Any]] = {}

    def put(self, name: str, layer: Optional[int], value):
        if layer is None:
            self.flat[name] = value
        else:
            self.per_layer.setdefault(name, {})[layer] = value

    def stack(self, name: str, layers: List[int], required: bool = True):
        slot = self.per_layer.get(name)
        if slot is None:
            if required:
                # a None leaf would crash far from the cause (concat /
                # sharding) — name the missing tensor family here
                raise ValueError(
                    f"checkpoint missing {name} for every layer"
                )
            return None
        missing = [i for i in layers if i not in slot]
        if missing:
            raise ValueError(f"checkpoint missing {name} for layers {missing}")
        return _stack([slot[i] for i in layers])


# ---------------------------------------------------------------------------
# Mixtral
# ---------------------------------------------------------------------------


def load_mixtral_params(model, cfg, mesh=None) -> Any:
    a = model.args
    E = a.moe.n_routed_experts
    st = _Staging()
    experts: Dict[tuple, np.ndarray] = {}  # (layer, e, kind) -> [D, F]/[F, D]

    for key, t in iter_checkpoint(a.ckpt_dir):
        m = re.fullmatch(r"model\.embed_tokens\.weight", key)
        if m:
            st.put("embed", None, _to_bf16(t))
            continue
        if key == "model.norm.weight":
            st.put("norm", None, _to_bf16(t))
            continue
        if key == "lm_head.weight":
            st.put("lm_head", None, _to_bf16(t.T))
            continue
        m = re.fullmatch(r"model\.layers\.(\d+)\.(.+)", key)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        if rest == "input_layernorm.weight":
            st.put("attn_norm", i, _to_bf16(t))
        elif rest == "post_attention_layernorm.weight":
            st.put("ffn_norm", i, _to_bf16(t))
        elif rest.startswith("self_attn."):
            proj = rest.split(".")[1]
            name = {"q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo"}[
                proj
            ]
            st.put(name, i, _to_bf16(t.T))
        elif rest == "block_sparse_moe.gate.weight":
            st.put("moe_gate", i, _to_bf16(t.T))  # [D, E]
        else:
            me = re.fullmatch(
                r"block_sparse_moe\.experts\.(\d+)\.(w[123])\.weight", rest
            )
            if me:
                e, w = int(me.group(1)), me.group(2)
                # w1 -> gate, w3 -> up ([F, D] -> [D, F]); w2 -> down
                kind = {"w1": "w_gate", "w3": "w_up", "w2": "w_down"}[w]
                experts[(i, e, kind)] = _to_bf16(t.T)

    layers = list(range(a.n_layers))
    params = {
        "embed": st.flat["embed"],
        "norm": st.flat["norm"],
        "layers": {},
    }
    if "lm_head" in st.flat:
        params["lm_head"] = st.flat["lm_head"]
    for name in ("attn_norm", "ffn_norm", "wq", "wk", "wv", "wo", "moe_gate"):
        params["layers"][name] = st.stack(name, layers)
    for kind in ("w_gate", "w_up", "w_down"):
        stacked = jnp.stack(
            [
                jnp.stack([experts[(i, e, kind)] for e in range(E)])
                for i in layers
            ]
        )  # [L, E, ., .]
        params["layers"][kind] = stacked
    return params


# ---------------------------------------------------------------------------
# GLM-4 (fused checkpoint layout)
# ---------------------------------------------------------------------------


def load_glm4_params(model, cfg, mesh=None) -> Any:
    a = model.args
    H, KV, Dh = a.n_heads, a.n_kv_heads, model.head_dim
    st = _Staging()
    for key, t in iter_checkpoint(a.ckpt_dir):
        if key == "transformer.embedding.word_embeddings.weight":
            st.put("embed", None, _to_bf16(t))
            continue
        if key == "transformer.encoder.final_layernorm.weight":
            st.put("norm", None, _to_bf16(t))
            continue
        if key == "transformer.output_layer.weight":
            st.put("lm_head", None, _to_bf16(t.T))
            continue
        m = re.fullmatch(r"transformer\.encoder\.layers\.(\d+)\.(.+)", key)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        if rest == "input_layernorm.weight":
            st.put("attn_norm", i, _to_bf16(t))
        elif rest == "post_attention_layernorm.weight":
            st.put("ffn_norm", i, _to_bf16(t))
        elif rest == "self_attention.query_key_value.weight":
            # fused [(H + 2KV) * Dh, D] -> wq/wk/wv (transposed to [D, .])
            q, k, v = np.split(t, [H * Dh, (H + KV) * Dh], axis=0)
            st.put("wq", i, _to_bf16(q.T))
            st.put("wk", i, _to_bf16(k.T))
            st.put("wv", i, _to_bf16(v.T))
        elif rest == "self_attention.query_key_value.bias":
            q, k, v = np.split(t, [H * Dh, (H + KV) * Dh], axis=0)
            st.put("bq", i, _to_bf16(q))
            st.put("bk", i, _to_bf16(k))
            st.put("bv", i, _to_bf16(v))
        elif rest == "self_attention.dense.weight":
            st.put("wo", i, _to_bf16(t.T))
        elif rest == "mlp.dense_h_to_4h.weight":
            # fused [2F, D] -> gate, up
            g, u = np.split(t, 2, axis=0)
            st.put("w_gate", i, _to_bf16(g.T))
            st.put("w_up", i, _to_bf16(u.T))
        elif rest == "mlp.dense_4h_to_h.weight":
            st.put("w_down", i, _to_bf16(t.T))

    layers = list(range(a.n_layers))
    params = {"embed": st.flat["embed"], "norm": st.flat["norm"], "layers": {}}
    if "lm_head" in st.flat:
        params["lm_head"] = st.flat["lm_head"]
    names = ["attn_norm", "ffn_norm", "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"]
    if a.attn_bias:
        names += ["bq", "bk", "bv"]
    for name in names:
        params["layers"][name] = st.stack(name, layers)
    if getattr(model, "merged", False):
        from chitu_tpu.models.llama import rank_major_merge

        mtp = getattr(model, "merge_tp", 1)
        ly = params["layers"]
        ly["wqkv"] = rank_major_merge(
            [ly.pop("wq"), ly.pop("wk"), ly.pop("wv")], mtp
        )
        if a.attn_bias:
            ly["b_qkv"] = rank_major_merge(
                [ly.pop("bq"), ly.pop("bk"), ly.pop("bv")], mtp
            )
        ly["w_gate_up"] = rank_major_merge(
            [ly.pop("w_gate"), ly.pop("w_up")], mtp
        )
    return params


# ---------------------------------------------------------------------------
# DeepSeek-V3 / R1
# ---------------------------------------------------------------------------


def _maybe_fp8(t: np.ndarray, scale_inv: Optional[np.ndarray]):
    """fp8 weight + blockwise scale_inv -> soft-fp8 QTensor (transposed to
    [in, out]); bf16 otherwise."""
    if scale_inv is None:
        return _to_bf16(t.T if t.ndim == 2 else t)
    data = jnp.asarray(t.T).view(jnp.float8_e4m3fn) if t.dtype == np.uint8 else jnp.asarray(t.T)
    return QTensor(
        data=data.astype(jnp.float8_e4m3fn),
        scale=jnp.asarray(scale_inv.T, jnp.float32),
        kind=QuantKind.SOFT_FP8,
        block=128,
    )


def load_deepseek_params(model, cfg, mesh=None) -> Any:
    a = model.args
    mo, ml = a.moe, a.mla
    E = mo.n_routed_experts
    n_dense = mo.n_dense_layers

    raw: Dict[str, np.ndarray] = {}
    scales: Dict[str, np.ndarray] = {}
    t0 = time.time()
    for key, t in iter_checkpoint(a.ckpt_dir):
        if key.endswith(".weight_scale_inv"):
            scales[key[: -len(".weight_scale_inv")]] = t
        else:
            raw[key] = t
    logger.info("read %d tensors in %.1fs", len(raw), time.time() - t0)

    def get(name, transpose=True, quantable=False):
        t = raw[name + ".weight"] if not name.endswith("bias") else raw[name]
        if quantable:
            return _maybe_fp8(t, scales.get(name))
        if t.ndim == 2 and transpose:
            return _to_bf16(t.T)
        return _to_bf16(t)

    def attn_tree(prefix_fmt: str, layers: List[int]) -> Dict[str, Any]:
        st = _Staging()
        for i in layers:
            p = prefix_fmt.format(i)
            st.put("attn_norm", i, get(f"{p}.input_layernorm", transpose=False))
            st.put("ffn_norm", i, get(f"{p}.post_attention_layernorm", transpose=False))
            sa = f"{p}.self_attn"
            if ml.q_lora_rank > 0:
                st.put("wq_a", i, get(f"{sa}.q_a_proj", quantable=True))
                st.put("q_norm", i, get(f"{sa}.q_a_layernorm", transpose=False))
                st.put("wq_b", i, get(f"{sa}.q_b_proj", quantable=True))
            else:
                st.put("wq", i, get(f"{sa}.q_proj", quantable=True))
            st.put("wkv_a", i, get(f"{sa}.kv_a_proj_with_mqa", quantable=True))
            st.put("kv_norm", i, get(f"{sa}.kv_a_layernorm", transpose=False))
            st.put("wkv_b", i, get(f"{sa}.kv_b_proj", quantable=True))
            st.put("wo", i, get(f"{sa}.o_proj", quantable=True))
        return st

    dense_layers = list(range(n_dense))
    moe_layers = list(range(n_dense, a.n_layers))

    st = attn_tree("model.layers.{}", dense_layers)
    dense = {
        name: st.stack(name, dense_layers)
        for name in st.per_layer
    }
    for hf, ours in (("gate_proj", "w_gate"), ("up_proj", "w_up"), ("down_proj", "w_down")):
        dense[ours] = _stack(
            [get(f"model.layers.{i}.mlp.{hf}", quantable=True) for i in dense_layers]
        )

    stm = attn_tree("model.layers.{}", moe_layers)
    moe_p = {name: stm.stack(name, moe_layers) for name in stm.per_layer}
    moe_p["moe_gate"] = jnp.stack(
        [get(f"model.layers.{i}.mlp.gate") for i in moe_layers]
    )
    bias_key = "model.layers.{}.mlp.gate.e_score_correction_bias"
    if bias_key.format(moe_layers[0]) in raw:
        moe_p["gate_bias"] = jnp.stack(
            [
                jnp.asarray(raw[bias_key.format(i)], dtype=jnp.float32)
                for i in moe_layers
            ]
        )
    else:
        moe_p["gate_bias"] = jnp.zeros((len(moe_layers), E), jnp.float32)
    if mo.n_shared_experts > 0:
        for hf, ours in (
            ("gate_proj", "shared_gate"),
            ("up_proj", "shared_up"),
            ("down_proj", "shared_down"),
        ):
            moe_p[ours] = _stack(
                [
                    get(f"model.layers.{i}.mlp.shared_experts.{hf}", quantable=True)
                    for i in moe_layers
                ]
            )
    # routed experts: stack [L, E, ...] (merge transform of
    # reference: model_deepseek_v3.py:1167-1288)
    for hf, ours in (
        ("gate_proj", "exp_gate"),
        ("up_proj", "exp_up"),
        ("down_proj", "exp_down"),
    ):
        moe_p[ours] = _stack(
            [
                _stack(
                    [
                        get(f"model.layers.{i}.mlp.experts.{e}.{hf}", quantable=True)
                        for e in range(E)
                    ]
                )
                for i in moe_layers
            ]
        )

    return {
        "embed": get("model.embed_tokens", transpose=False),
        "norm": get("model.norm", transpose=False),
        "lm_head": get("lm_head"),
        "dense_layers": dense,
        "moe_layers": moe_p,
    }
