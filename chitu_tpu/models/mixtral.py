"""Mixtral sparse-MoE model.

Capability parity with the reference's HF-Mixtral
(reference: chitu/models/model_hf_mixtral.py:1-182): llama attention +
softmax-top-2 renormalized router + 8 experts. The reference iterates
experts as dense modules with index_add combine; here experts are stacked
weights [L, E, D, F] run through the capacity-dispatch MoE
(chitu_tpu/models/moe.py) — the fused-MoE path the reference only gives
DeepSeek — and shardable over the mesh 'tp' axis on the expert dim (EP).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from chitu_tpu.models import register_model
from chitu_tpu.models.llama import LlamaForCausalLM
from chitu_tpu.models.moe import moe_ffn_auto, route


@register_model("mixtral")
class MixtralForCausalLM(LlamaForCausalLM):
    def __init__(self, args, cfg):
        assert args.moe is not None, "mixtral requires moe args"
        super().__init__(args, cfg)
        self.moe = args.moe

    def init_params(self, key: jax.Array, dtype=jnp.bfloat16):
        a = self.args
        m = self.moe
        params = super().init_params(key, dtype)
        L, D = a.n_layers, a.dim
        E, F = m.n_routed_experts, m.moe_inter_dim or self.inter_dim
        ks = jax.random.split(jax.random.fold_in(key, 17), 4)

        def init(k, shape, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(
                dtype
            )

        layers = params["layers"]
        for k in ("w_gate", "w_up", "w_down", "w_gate_up"):
            layers.pop(k, None)
        layers["moe_gate"] = init(ks[0], (L, D, E))
        layers["w_gate"] = init(ks[1], (L, E, D, F))
        layers["w_up"] = init(ks[2], (L, E, D, F))
        layers["w_down"] = init(ks[3], (L, E, F, D))
        return params

    def param_partition_specs(self, params) -> Any:
        specs = super().param_partition_specs(params)
        ls = specs["layers"]
        for k in ("w_gate", "w_up", "w_down", "w_gate_up"):
            ls.pop(k, None)
        # expert parallelism: shard the expert dim over 'tp'
        # (realizes the EP the reference stubbed, SURVEY.md §2.7)
        ls["moe_gate"] = P("pp", None, None)
        for name in ("w_gate", "w_up", "w_gu", "w_down"):
            if name in params["layers"]:
                ls[name] = P("pp", "tp", None, None)
        return specs

    def load_params(self, cfg, mesh=None):
        from chitu_tpu.loaders_moe import load_mixtral_params

        return load_mixtral_params(self, cfg, mesh)

    def _ffn(
        self, x: jnp.ndarray, layers, layer, mesh=None, tp_axis: str = ""
    ) -> jnp.ndarray:
        from chitu_tpu.models.llama import _layer_leaf

        g = lambda name: _layer_leaf(layers, name, layer)
        weights, sel = route(x, g("moe_gate"), self.moe)
        gate_w, up_w = (
            (g("w_gu"), None)
            if "w_gu" in layers
            else (g("w_gate"), g("w_up"))
        )
        if tp_axis:
            # manual ('pp','tp') pipeline: local expert chunk + psum
            # (parallel/pipeline.py; the EP contract of models/moe.py)
            from chitu_tpu.models.common import psum_f32
            from chitu_tpu.models.moe import moe_ffn_manual_ep

            return psum_f32(
                moe_ffn_manual_ep(
                    x, gate_w, up_w, g("w_down"), weights, sel, tp_axis,
                    layer=layer,
                ),
                tp_axis,
            )
        return moe_ffn_auto(
            x, gate_w, up_w, g("w_down"), weights, sel, self.moe,
            layer=layer, mesh=mesh,
        )
