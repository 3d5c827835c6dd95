"""DeepSeek-V3 / R1: MLA attention + group-limited sparse MoE.

Capability parity with the reference's flagship model
(reference: chitu/models/model_deepseek_v3.py, 1445 LoC):

- **MLA absorb** (reference: :475-536, :564-602): queries are absorbed
  through W_uk so the KV cache holds only kv_lora_rank(512) + rope(64)
  floats per token, *shared across all 128 heads*; both prefill and decode
  then run as 1-head MQA over the merged cache with head dim 576 (padded
  to 640 lanes). This is the FlashMLA-equivalent formulation and uses the
  same paged kernels as every other model.
- **MoE** (reference: :774-1061): sigmoid gate with score-correction bias,
  group-limited top-k (n_groups/topk_groups), route_scale, one shared
  expert fused as a dense FFN + 256 routed experts through the
  capacity-dispatch MoE (models/moe.py), expert dim shardable over 'tp'
  (real EP; the reference hardcodes moe_world_size=1, :870-879).
- **YaRN rope** with correction range + mscale softmax scaling
  (reference: :1353-1445) via models/common.rope_tables.
- First n_dense_layers use a dense SwiGLU FFN (reference model card).

Weight dtype: bf16 natively; FP8/soft-FP8 checkpoints map onto QTensor
leaves (quantize/transforms.py) with blockwise scales, matching the
reference's native-fp8 LinearDeepSeekV3 (:109-226).
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from chitu_tpu.models import register_model
from chitu_tpu.models.common import (
    apply_rope,
    pad_kv_minor,
    psum_f32,
    rms_norm,
    rope_tables,
)
from chitu_tpu.models.moe import moe_ffn_auto, route
from chitu_tpu.ops import attention as attn_ops
from chitu_tpu.ops.linear import linear


@register_model("deepseek-v3")
class DeepSeekV3ForCausalLM:
    supports_ring_kv = True  # infer.ring_kv (ops/attention_ring.py)

    def __init__(self, args, cfg):
        assert args.mla is not None and args.moe is not None
        self.args = args
        self.cfg = cfg
        self.mla = args.mla
        self.moe = args.moe
        m = self.mla
        self.qk_head_dim = m.qk_nope_head_dim + m.qk_rope_head_dim  # 192
        self.kv_dim = m.kv_lora_rank + m.qk_rope_head_dim  # 576
        self.kv_minor = pad_kv_minor(1, self.kv_dim)  # 640
        self.n_dense = self.moe.n_dense_layers
        self.n_moe = args.n_layers - self.n_dense
        # mla_absorb=none: the dense per-head path — cache holds full
        # per-head K (nope|pe = 192) and V (padded to 192); absorb is the
        # production path (576-float latent cache)
        # (reference: model_deepseek_v3.py:612-670 dense decode)
        self.absorb = cfg.infer.mla_absorb != "none"
        # attention head width seen by the kernels (executor geometry)
        self.head_dim = self.kv_minor if self.absorb else self.qk_head_dim

        # softmax scale with yarn mscale correction
        # (reference: model_deepseek_v3.py:1420-1445)
        scale = 1.0 / math.sqrt(self.qk_head_dim)
        rs = args.rope_scaling
        if (
            rs is not None
            and rs.kind == "yarn"
            and cfg.infer.max_seq_len > rs.original_max_position
            and rs.factor > 1.0
            and rs.mscale_all_dim > 0
        ):
            ms = 0.1 * rs.mscale_all_dim * math.log(rs.factor) + 1.0
            scale = scale * ms * ms
        self.attn_scale = scale
        self.cos, self.sin = rope_tables(
            m.qk_rope_head_dim, cfg.infer.max_seq_len, args.rope_theta, rs
        )
        self.rotary_layout = "llama"  # deepseek uses interleaved pairs

    # -- cache geometry -----------------------------------------------------

    def kv_cache_spec(self) -> Dict[str, Any]:
        if not self.absorb:
            # dense MLA: per-head K/V rows (V padded to qk_head_dim)
            return dict(
                n_layers=self.args.n_layers,
                kv_heads=self.args.n_heads,
                head_dim=self.qk_head_dim,
                kv_dim=0,
                layer_groups={
                    "kv_dense": self.n_dense,
                    "kv_moe": self.n_moe,
                },
            )
        # merged-MLA cache: 576 floats/token shared across heads
        # (reference: backend.py:186-197)
        return dict(
            n_layers=self.args.n_layers,
            kv_heads=0,
            head_dim=0,
            kv_dim=self.kv_dim,
            layer_groups={
                "kv_dense": self.n_dense,
                "kv_moe": self.n_moe,
            },
        )

    def kv_cache_partition_spec(self, tp_size: int = 1):
        # latent cache is head-shared: replicated over tp (TP shards heads
        # via wq_b). The MoE stack's cache follows the PP stage layout;
        # the dense-first stack's cache REPLICATES over pp — the few
        # dense layers (3/61 on the flagship) run entirely on stage 0 in
        # the pipelined decode (parallel/pipeline.py), and n_dense rarely
        # divides pp anyway. Memory cost: n_dense/n_layers of KV per
        # extra stage (~5% flagship).
        return {
            "kv_dense": P(None, None, None, None),
            "kv_moe": P("pp", None, None, None),
        }

    def _ring_layer_axis(self) -> str:
        """pp composition for the ring-sharded latent pool (see
        LlamaForCausalLM._ring_layer_axis)."""
        return "pp" if self.cfg.infer.pp_size > 1 else ""

    def quantizable_keys(self):
        keys = {
            "wq",
            "wq_a",
            "wq_b",
            "wkv_a",
            "wkv_b",
            "wo",
            "w_gate",
            "w_up",
            "w_down",
            "shared_gate",
            "shared_up",
            "shared_down",
            "exp_gate",
            "exp_up",
            "exp_down",
        }
        if self.absorb:
            # the absorb einsums DEQUANTIZE wkv_b per layer per call
            # (reference also re-dequants, model_deepseek_v3.py:516-532):
            # quantizing it turns one 2-byte read into an fp8 read + a
            # bf16 dequant write + read (~2.5x the traffic) — measured
            # 0.3 ms/step at the deepseek-mini-bench geometry. It is
            # ~2% of weights; keep it bf16 on the quant-on-load path.
            # (Native-fp8 CHECKPOINTS still load it quantized.)
            keys = keys - {"wkv_b"}
        return keys

    # -- parameters ---------------------------------------------------------

    def _init_attn(self, key, L, dtype):
        a, m = self.args, self.mla
        D, H = a.dim, a.n_heads
        ks = jax.random.split(key, 8)

        def init(k, shape, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(
                dtype
            )

        p = {
            "attn_norm": jnp.ones((L, D), dtype),
            "ffn_norm": jnp.ones((L, D), dtype),
            "wkv_a": init(ks[0], (L, D, self.kv_dim)),
            "kv_norm": jnp.ones((L, m.kv_lora_rank), dtype),
            "wkv_b": init(
                ks[1],
                (L, m.kv_lora_rank, H * (m.qk_nope_head_dim + m.v_head_dim)),
            ),
            "wo": init(ks[2], (L, H * m.v_head_dim, D)),
        }
        if m.q_lora_rank > 0:
            p["wq_a"] = init(ks[3], (L, D, m.q_lora_rank))
            p["q_norm"] = jnp.ones((L, m.q_lora_rank), dtype)
            p["wq_b"] = init(ks[4], (L, m.q_lora_rank, H * self.qk_head_dim))
        else:
            p["wq"] = init(ks[5], (L, D, H * self.qk_head_dim))
        return p

    def init_params(self, key: jax.Array, dtype=jnp.bfloat16):
        a = self.args
        mo = self.moe
        D, V = a.dim, a.vocab_size
        ks = jax.random.split(key, 12)

        def init(k, shape, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale).astype(
                dtype
            )

        dense = self._init_attn(ks[0], self.n_dense, dtype)
        dense["w_gate"] = init(ks[1], (self.n_dense, D, a.inter_dim))
        dense["w_up"] = init(ks[2], (self.n_dense, D, a.inter_dim))
        dense["w_down"] = init(ks[3], (self.n_dense, a.inter_dim, D))

        Lm = self.n_moe
        E, Fm = mo.n_routed_experts, mo.moe_inter_dim
        Fs = mo.moe_inter_dim * max(mo.n_shared_experts, 1)
        moe_l = self._init_attn(ks[4], Lm, dtype)
        moe_l["moe_gate"] = init(ks[5], (Lm, D, E))
        moe_l["gate_bias"] = jnp.zeros((Lm, E), jnp.float32)
        if mo.n_shared_experts > 0:
            moe_l["shared_gate"] = init(ks[6], (Lm, D, Fs))
            moe_l["shared_up"] = init(ks[7], (Lm, D, Fs))
            moe_l["shared_down"] = init(ks[8], (Lm, Fs, D))
        moe_l["exp_gate"] = init(ks[9], (Lm, E, D, Fm))
        moe_l["exp_up"] = init(ks[10], (Lm, E, D, Fm))
        moe_l["exp_down"] = init(ks[11], (Lm, E, Fm, D))

        return {
            "embed": init(jax.random.fold_in(key, 100), (V, D)),
            "norm": jnp.ones((D,), dtype),
            "lm_head": init(jax.random.fold_in(key, 101), (D, V)),
            "dense_layers": dense,
            "moe_layers": moe_l,
        }

    def param_partition_specs(self, params) -> Any:
        def attn_specs(p):
            out = {
                "attn_norm": P("pp", None),
                "ffn_norm": P("pp", None),
                "kv_norm": P("pp", None),
                "wkv_b": P("pp", None, "tp"),  # shard heads
                "wo": P("pp", "tp", None),
            }
            if "wkv_a" in p:  # absent when merged into wq_kv_a
                out["wkv_a"] = P("pp", None, None)  # latent: tp-replicated
            if "wq_a" in p:
                out["wq_a"] = P("pp", None, None)
            if "wq_kv_a" in p:
                out["wq_kv_a"] = P("pp", None, None)
            if "wq_a" in p or "wq_kv_a" in p:
                out["q_norm"] = P("pp", None)
                out["wq_b"] = P("pp", None, "tp")
            if "wq" in p:
                out["wq"] = P("pp", None, "tp")
            return out

        dense = attn_specs(params["dense_layers"])
        dense["w_gate"] = P("pp", None, "tp")
        dense["w_up"] = P("pp", None, "tp")
        dense["w_down"] = P("pp", "tp", None)

        moe_l = attn_specs(params["moe_layers"])
        moe_l["moe_gate"] = P("pp", None, None)
        moe_l["gate_bias"] = P("pp", None)
        if "shared_gate" in params["moe_layers"]:
            moe_l["shared_gate"] = P("pp", None, "tp")
            moe_l["shared_up"] = P("pp", None, "tp")
        if "shared_gu" in params["moe_layers"]:
            # merged gate|up exists on tp==1 layouts only (the plain
            # concat would shard-split at the wrong boundary)
            moe_l["shared_gu"] = P("pp", None, None)
        if "shared_down" in params["moe_layers"]:
            moe_l["shared_down"] = P("pp", "tp", None)
        # expert parallelism over 'tp'
        for name in ("exp_gate", "exp_up", "exp_gu", "exp_down"):
            if name in params["moe_layers"]:
                moe_l[name] = P("pp", "tp", None, None)

        return {
            "embed": P("tp", None),
            "norm": P(None),
            "lm_head": P(None, "tp"),
            "dense_layers": dense,
            "moe_layers": moe_l,
        }

    def load_params(self, cfg, mesh=None):
        from chitu_tpu.loaders_moe import load_deepseek_params

        return load_deepseek_params(self, cfg, mesh)

    # -- attention ----------------------------------------------------------

    def _mla_qkv(self, x, layers, layer, cos, sin):
        """Shared MLA prologue for the absorb and dense paths: q (lora or
        direct) with rope on the pe dims, the latent c_kv + roped k_pe,
        and the materialized per-layer W_kv_b (the reference also
        re-dequants per call, model_deepseek_v3.py:516-532)."""
        from chitu_tpu.models.llama import _layer_leaf
        from chitu_tpu.ops.qtensor import QTensor

        a, m = self.args, self.mla
        T = x.shape[0]
        H = a.n_heads
        dn, dc = m.qk_nope_head_dim, m.kv_lora_rank
        g = lambda name: _layer_leaf(layers, name, layer)

        if "wq_kv_a" in layers:
            # merged lora down-projections (r5 bs=1 dispatch cut,
            # quantize/transforms.merge_moe_gate_up): ONE GEMM yields
            # [q_a | kv_a]; both halves replicate over tp so the global
            # split is shard-local everywhere
            qkv_a = linear(x, g("wq_kv_a"), layer=layer)
            q = linear(
                rms_norm(
                    qkv_a[:, : m.q_lora_rank], g("q_norm"), a.norm_eps
                ),
                g("wq_b"),
                layer=layer,
            )
            kv_a = qkv_a[:, m.q_lora_rank :]  # [T, dc + dr]
        elif m.q_lora_rank > 0:
            q = linear(
                rms_norm(
                    linear(x, g("wq_a"), layer=layer), g("q_norm"), a.norm_eps
                ),
                g("wq_b"),
                layer=layer,
            )
            kv_a = linear(x, g("wkv_a"), layer=layer)  # [T, dc + dr]
        else:
            q = linear(x, g("wq"), layer=layer)
            kv_a = linear(x, g("wkv_a"), layer=layer)  # [T, dc + dr]
        # head count from the projection width, not args: under a manual
        # 'tp' shard_map (pipelined pp x tp) wq_b is a LOCAL column shard
        # holding H/tp heads (parallel/pipeline.py)
        q = q.reshape(T, -1, self.qk_head_dim)
        q_nope, q_pe = q[..., :dn], q[..., dn:]
        q_pe = apply_rope(q_pe, cos, sin, self.rotary_layout)

        c_kv = rms_norm(kv_a[:, :dc], g("kv_norm"), a.norm_eps)
        k_pe = apply_rope(
            kv_a[:, None, dc:], cos, sin, self.rotary_layout
        )  # [T, 1, dr]

        wkv_b = layers["wkv_b"]
        if isinstance(wkv_b, QTensor):
            # whole-stacked quantized leaf: slice + dequant
            wkv_b_d = wkv_b[layer].dequantize(x.dtype)
        elif wkv_b.ndim == 3:
            # whole stacked DENSE leaf (split_scan_leaves static_names):
            # the pallas absorb kernel indexes [layer, :, head-slices]
            # straight from HBM — pass it through un-materialized
            wkv_b_d = wkv_b
        else:
            wkv_b_d = wkv_b.astype(x.dtype)  # already scan-sliced
        return q_nope, q_pe, c_kv, k_pe, wkv_b_d, g

    def _absorb_static_names(self, stack_params, mesh, tp_axis):
        """Keep wkv_b OUT of the scan when the pallas absorb kernel can
        consume the whole stacked leaf (r5; see ops/pallas_absorb.py):
        single chip, or inside the manual-('pp','tp') pipeline where the
        local shard is a plain local array. GSPMD meshes keep the scan
        slice (pallas_call cannot be auto-partitioned)."""
        from chitu_tpu.ops.linear import get_op_impl
        from chitu_tpu.ops.pallas_absorb import absorb_kernel_ok

        m = self.mla
        if not self.absorb or get_op_impl() != "pallas":
            return frozenset()
        if mesh is not None and not tp_axis:
            return frozenset()
        w = stack_params.get("wkv_b")
        if w is None or not absorb_kernel_ok(
            w, m.qk_nope_head_dim, m.v_head_dim, m.kv_lora_rank
        ):
            return frozenset()
        return frozenset({"wkv_b"})

    def _mla(
        self, x, layers, kv_pool, layer, cos, sin, append, attend,
        fused=None, tp_axis: str = "",
    ):
        """MLA absorb forward for a [T, D] slab.

        `fused` (fn(q, pool, layer, new_kv) -> (o, pool)) replaces the
        separate append+attend with the in-kernel RMW append
        (pallas_attention.attend_decode_fused) — kills the per-layer XLA
        scatter on the single-chip decode path.

        (reference absorb paths: model_deepseek_v3.py:475-536 decode,
        :564-602 prefill-as-MQA)"""
        from chitu_tpu.models.llama import _layer_leaf

        a, m = self.args, self.mla
        T = x.shape[0]
        H = a.n_heads
        dn, dr, dv, dc = (
            m.qk_nope_head_dim,
            m.qk_rope_head_dim,
            m.v_head_dim,
            m.kv_lora_rank,
        )
        q_nope, q_pe, c_kv, k_pe, wkv_b_d, g = self._mla_qkv(
            x, layers, layer, cos, sin
        )
        k_pe = k_pe[:, 0]  # [T, dr]
        # whole stacked leaf (r5): the pallas absorb kernel wins at
        # decode-sized T (it exists to kill the per-layer slice copy and
        # the VPU multiply-reduce lowering); at prefill slab sizes the
        # einsum lowers to proper MXU dots and the slice copy amortizes
        # over T, while the kernel's head-major transposes would not
        absorb_kernel = wkv_b_d.ndim == 3 and T <= 128
        if wkv_b_d.ndim == 3 and not absorb_kernel:
            wkv_b_d = jax.lax.dynamic_index_in_dim(
                wkv_b_d, layer, 0, keepdims=False
            ).astype(x.dtype)
        if absorb_kernel:
            from chitu_tpu.ops.pallas_absorb import absorb_matmul

            interp = jax.default_backend() != "tpu"
            q_abs = absorb_matmul(
                q_nope, wkv_b_d, layer, "uk", dn, dv, interpret=interp
            ).astype(x.dtype)
        else:
            # -1: under manual tp the wkv_b column shard holds H/tp
            # heads, aligned with wq_b's local heads and wo's local rows
            w_b = wkv_b_d.reshape(dc, -1, dn + dv)
            w_uk = w_b[..., :dn]  # [512, H, 128]
            w_uv = w_b[..., dn:]  # [512, H, 128]
            # bf16 operands with f32 accumulation: an f32xf32 MXU matmul
            # on this per-layer hot path costs several bf16 passes for
            # the same accumulator precision
            q_abs = jnp.einsum(
                "thd,chd->thc", q_nope, w_uk,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)  # [T, H, 512]

        # merged cache row: [c_kv || k_pe], one shared "kv head"
        new_kv = jnp.concatenate([c_kv, k_pe], axis=-1)[:, None, :]  # [T,1,576]

        # MQA over the merged cache with padded head dim
        q_full = jnp.concatenate([q_abs, q_pe], axis=-1)  # [T, H, 576]
        pad = self.kv_minor - self.kv_dim
        if pad:
            q_full = jnp.pad(q_full, ((0, 0), (0, 0), (0, pad)))
        if fused is not None:
            o, kv_pool = fused(q_full, kv_pool, layer, new_kv)
        else:
            kv_pool = append(kv_pool, layer, new_kv)
            o = attend(q_full, kv_pool, layer)  # [T, H, kv_minor]
        out_c = o[..., :dc]  # latent-weighted sum

        if absorb_kernel:
            from chitu_tpu.ops.pallas_absorb import absorb_matmul

            v_out = absorb_matmul(
                out_c, wkv_b_d, layer, "uv", dn, dv, interpret=interp
            ).astype(x.dtype)
        else:
            v_out = jnp.einsum(
                "thc,chd->thd", out_c, w_uv,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)  # [T, H(/tp), 128]
        o = linear(v_out.reshape(T, -1), g("wo"), layer=layer)
        if tp_axis:
            # wo is row-parallel (in-dim = heads sharded over tp): local
            # products are partial sums (reference RowParallelLinear
            # all-reduce, chitu/tensor_parallel.py:157-169)
            o = psum_f32(o, tp_axis)
        return o, kv_pool

    def _mla_dense(
        self, x, layers, kv_pool, layer, cos, sin, append, attend,
        fused=None, tp_axis: str = "",
    ):
        assert not tp_axis, (
            "manual-tp needs mla_absorb (per-head K/V cannot shard the "
            "replicated dense pool); supports_pipeline gates on absorb"
        )
        """mla_absorb=none: materialize per-head K/V and run standard MHA
        (reference dense paths: model_deepseek_v3.py:612-670). The cache
        holds [k_nope | k_pe] (192) and V padded to 192 per head."""
        from chitu_tpu.models.llama import _layer_leaf

        a, m = self.args, self.mla
        T = x.shape[0]
        H = a.n_heads
        dn, dr, dv, dc = (
            m.qk_nope_head_dim,
            m.qk_rope_head_dim,
            m.v_head_dim,
            m.kv_lora_rank,
        )
        q_nope, q_pe, c_kv, k_pe, wkv_b_d, g = self._mla_qkv(
            x, layers, layer, cos, sin
        )
        q = jnp.concatenate([q_nope, q_pe], axis=-1)  # [T, H, 192]
        kv = linear(c_kv, wkv_b_d).reshape(T, H, dn + dv)
        k = jnp.concatenate(
            [kv[..., :dn], jnp.broadcast_to(k_pe, (T, H, dr))], axis=-1
        )  # [T, H, 192]
        v = kv[..., dn:]  # [T, H, 128]
        v_pad = jnp.pad(v, ((0, 0), (0, 0), (0, self.qk_head_dim - dv)))

        if fused is not None:
            o, kv_pool = fused(q, kv_pool, layer, (k, v_pad))
        else:
            kv_pool = append(kv_pool, layer, (k, v_pad))
            o = attend(q, kv_pool, layer)  # [T, H, 192]
        o = o[..., :dv]
        return (
            linear(o.reshape(T, H * dv), g("wo"), layer=layer),
            kv_pool,
        )

    # -- FFNs ---------------------------------------------------------------

    def _dense_ffn(self, x, layers, layer, mesh=None, tp_axis: str = ""):
        from chitu_tpu.models.llama import _layer_leaf

        g = lambda name: _layer_leaf(layers, name, layer)
        gate = linear(x, g("w_gate"), layer=layer)
        up = linear(x, g("w_up"), layer=layer)
        y = linear(jax.nn.silu(gate) * up, g("w_down"), layer=layer)
        return psum_f32(y, tp_axis) if tp_axis else y

    def _moe_ffn(self, x, layers, layer, mesh=None, tp_axis: str = ""):
        from chitu_tpu.models.llama import _layer_leaf

        g = lambda name: _layer_leaf(layers, name, layer)
        y = jnp.zeros_like(x)
        if "shared_gu" in layers:
            # merged shared-expert gate|up (single-chip layouts only;
            # quantize/transforms.merge_moe_gate_up r5)
            gu = linear(x, g("shared_gu"), layer=layer)
            Fs = gu.shape[-1] // 2
            y = linear(
                jax.nn.silu(gu[:, :Fs]) * gu[:, Fs:],
                g("shared_down"),
                layer=layer,
            )
        elif "shared_gate" in layers:
            # shared expert: column/row-parallel like the dense FFN, so
            # under manual tp its output is a PARTIAL sum folded into the
            # same psum as the routed combine below
            gg = linear(x, g("shared_gate"), layer=layer)
            u = linear(x, g("shared_up"), layer=layer)
            y = linear(jax.nn.silu(gg) * u, g("shared_down"), layer=layer)
        weights, sel = route(
            x, g("moe_gate"), self.moe, gate_bias=g("gate_bias")
        )
        gate_w, up_w = (
            (g("exp_gu"), None)
            if "exp_gu" in layers
            else (g("exp_gate"), g("exp_up"))
        )
        if tp_axis:
            # inside a manual ('pp','tp') shard_map (pipelined dual
            # stack): stacks are local (layer-chunk x expert-chunk)
            # slices — dispatch local experts, ONE psum for shared +
            # routed together (VERDICT r4 next-2)
            from chitu_tpu.models.moe import moe_ffn_manual_ep

            y = y + moe_ffn_manual_ep(
                x, gate_w, up_w, g("exp_down"), weights, sel, tp_axis,
                layer=layer,
            )
            return psum_f32(y, tp_axis)
        return y + moe_ffn_auto(
            x, gate_w, up_w, g("exp_down"), weights, sel,
            self.moe, layer=layer, mesh=mesh,
        )

    # -- stacks -------------------------------------------------------------

    def _run_stack(self, stack_params, kv_pool, n_layers, h, cos, sin, append, attend, ffn, mesh=None, fused=None, tp_axis: str = ""):
        from chitu_tpu.models.llama import split_scan_leaves

        a = self.args
        xs_leaves, static_leaves = split_scan_leaves(
            stack_params, self._absorb_static_names(stack_params, mesh, tp_axis)
        )

        def body(carry, xs):
            h, pool = carry
            lp, layer = xs
            view = {**lp, **static_leaves}
            x = rms_norm(h, view["attn_norm"], a.norm_eps)
            mla = self._mla if self.absorb else self._mla_dense
            attn_out, pool = mla(
                x, view, pool, layer, cos, sin, append, attend, fused,
                tp_axis=tp_axis,
            )
            h = h + attn_out
            x = rms_norm(h, view["ffn_norm"], a.norm_eps)
            h = h + ffn(x, view, layer, mesh, tp_axis)
            return (h, pool), None

        (h, kv_pool), _ = jax.lax.scan(
            body,
            (h, kv_pool),
            (xs_leaves, jnp.arange(n_layers, dtype=jnp.int32)),
        )
        return h, kv_pool

    def _forward(self, params, cache, h, cos, sin, append, attend, mesh=None, fused=None):
        # per-stack pool layer axis for the shmap pallas wrappers
        # (ops/attention.py): the dense-first pool replicates over 'pp'
        # (kv_cache_partition_spec), the MoE pool shards its layer dim
        ax = self._ring_layer_axis()
        attend_moe = (
            (lambda q, pool, layer: attend(q, pool, layer, layer_axis=ax))
            if ax
            else attend
        )
        h, kv_dense = self._run_stack(
            params["dense_layers"],
            cache["kv_dense"],
            self.n_dense,
            h,
            cos,
            sin,
            append,
            attend,
            self._dense_ffn,
            mesh,
            fused,
        )
        h, kv_moe = self._run_stack(
            params["moe_layers"],
            cache["kv_moe"],
            self.n_moe,
            h,
            cos,
            sin,
            append,
            attend_moe,
            self._moe_ffn,
            mesh,
            fused,
        )
        return h, {"kv_dense": kv_dense, "kv_moe": kv_moe}

    def _logits(self, params, h):
        return linear(h, params["lm_head"], out_dtype=jnp.float32)

    # -- public forwards (same contract as LlamaForCausalLM) ----------------

    def prefill(
        self,
        params,
        cache: Dict[str, jnp.ndarray],
        tokens: jnp.ndarray,  # [T]
        block_table: jnp.ndarray,  # [mp]
        start_pos: jnp.ndarray,
        valid_len: jnp.ndarray,
        page_size: int,
        attn_impl: str = "xla",
        return_all_logits: bool = False,
        mesh=None,
        ring_kv_axis: str = "",
    ):
        T = tokens.shape[0]
        pos = start_pos + jnp.arange(T, dtype=jnp.int32)
        total_len = start_pos + valid_len
        h = jnp.take(params["embed"], tokens, axis=0)
        idx = jnp.minimum(pos, self.cos.shape[0] - 1)
        cos = jnp.take(self.cos, idx, 0)
        sin = jnp.take(self.sin, idx, 0)

        kvh = 1 if self.absorb else self.args.n_heads
        kvd = self.kv_minor if self.absorb else self.qk_head_dim

        if ring_kv_axis:
            # ring-sharded latent pool (ops/attention_ring.py): the
            # long-context DeepSeek regime — 576B/token latent pages
            # stripe over the 'dp' ring
            from chitu_tpu.ops import attention_ring as ring_ops

            def append(pool, layer, new_kv):
                k, v = new_kv if isinstance(new_kv, tuple) else (new_kv, None)
                return ring_ops.append_prefill_ring(
                    pool, layer, k, v, block_table, pos, valid_len,
                    page_size, mesh, ring_kv_axis,
                    layer_axis=self._ring_layer_axis(),
                )

            def attend(q, pool, layer, layer_axis=""):
                return ring_ops.attend_prefill_ring(
                    q, pool, layer, block_table,
                    jnp.where(jnp.arange(T) < valid_len, pos, 0),
                    total_len, page_size, kvh, kvd,
                    split_kv=not self.absorb, scale=self.attn_scale,
                    mesh=mesh, axis=ring_kv_axis,
                    layer_axis=self._ring_layer_axis(),
                )

        else:
            def append(pool, layer, new_kv):
                k, v = new_kv if isinstance(new_kv, tuple) else (new_kv, None)
                return attn_ops.append_prefill(
                    pool, layer, k, v, block_table, pos, valid_len, page_size
                )

            def attend(q, pool, layer, layer_axis=""):
                return attn_ops.attend_prefill(
                    q,
                    pool,
                    layer,
                    block_table,
                    jnp.where(jnp.arange(T) < valid_len, pos, 0),
                    total_len,
                    page_size,
                    kvh,
                    kvd,
                    split_kv=not self.absorb,
                    scale=self.attn_scale,
                    impl=attn_impl,
                    mesh=mesh,
                    layer_axis=layer_axis,
                )

        h, cache = self._forward(
            params, cache, h, cos, sin, append, attend, mesh
        )
        h = rms_norm(h, params["norm"], self.args.norm_eps)
        if return_all_logits:
            return self._logits(params, h), cache
        last = jnp.take(h, jnp.maximum(valid_len - 1, 0), axis=0)
        return self._logits(params, last), cache

    def prefill_packed(
        self,
        params,
        cache: Dict[str, jnp.ndarray],
        tokens: jnp.ndarray,  # [T] packed (per-segment padded)
        seg_ids: jnp.ndarray,  # [T] (-1 = pad)
        pos: jnp.ndarray,  # [T] (-1 = pad)
        block_tables: jnp.ndarray,  # [R, mp]
        total_lens: jnp.ndarray,  # [R]
        last_idx: jnp.ndarray,  # [R]
        block_seg: jnp.ndarray,  # [NB]
        block_qstart: jnp.ndarray,  # [NB]
        page_size: int,
        attn_impl: str = "xla",
        mesh=None,
    ):
        """Packed varlen prefill over the merged-MLA latent cache (same
        contract as LlamaForCausalLM.prefill_packed; reference:
        chitu/utils.py:84-100 VarLens)."""
        pos_safe = jnp.maximum(pos, 0)
        h = jnp.take(params["embed"], tokens, axis=0)
        idx = jnp.minimum(pos_safe, self.cos.shape[0] - 1)
        cos = jnp.take(self.cos, idx, 0)
        sin = jnp.take(self.sin, idx, 0)
        kvh = 1 if self.absorb else self.args.n_heads
        kvd = self.kv_minor if self.absorb else self.qk_head_dim

        def append(pool, layer, new_kv):
            k, v = new_kv if isinstance(new_kv, tuple) else (new_kv, None)
            return attn_ops.append_prefill_packed(
                pool, layer, k, v, block_tables, seg_ids, pos, page_size
            )

        def attend(q, pool, layer, layer_axis=""):
            return attn_ops.attend_prefill_packed(
                q,
                pool,
                layer,
                block_tables,
                seg_ids,
                pos_safe,
                total_lens,
                block_seg,
                block_qstart,
                page_size,
                kvh,
                kvd,
                split_kv=not self.absorb,
                scale=self.attn_scale,
                impl=attn_impl,
                mesh=mesh,
                layer_axis=layer_axis,
            )

        h, cache = self._forward(
            params, cache, h, cos, sin, append, attend, mesh
        )
        h = rms_norm(h, params["norm"], self.args.norm_eps)
        last = jnp.take(h, last_idx, axis=0)
        return self._logits(params, last), cache

    def step_hybrid(
        self,
        params,
        cache: Dict[str, jnp.ndarray],
        dec_tokens: jnp.ndarray,  # [B]
        dec_seq_lens: jnp.ndarray,  # [B]
        dec_block_tables: jnp.ndarray,  # [B, mp_d]
        dec_valid: jnp.ndarray,  # [B] bool
        pf_tokens: jnp.ndarray,  # [T] packed
        pf_seg_ids: jnp.ndarray,  # [T]
        pf_pos: jnp.ndarray,  # [T]
        pf_block_tables: jnp.ndarray,  # [R, mp_p]
        pf_total_lens: jnp.ndarray,  # [R]
        pf_last_idx: jnp.ndarray,  # [R]
        pf_block_seg: jnp.ndarray,  # [NB]
        pf_block_qstart: jnp.ndarray,  # [NB]
        page_size: int,
        attn_impl: str = "xla",
        mesh=None,
    ):
        """Fused prefill+decode step over the merged-MLA cache ->
        (dec_logits [B,V], pf_logits [R,V], cache); same contract as
        LlamaForCausalLM.step_hybrid (one weight pass serves both phases;
        the reference dispatches prefill OR decode, executor.py:150-162)."""
        B = dec_tokens.shape[0]
        h = jnp.take(
            params["embed"], jnp.concatenate([dec_tokens, pf_tokens]), axis=0
        )
        pf_pos_safe = jnp.maximum(pf_pos, 0)
        idx = jnp.concatenate([dec_seq_lens, pf_pos_safe])
        idx = jnp.minimum(idx, self.cos.shape[0] - 1)
        cos = jnp.take(self.cos, idx, 0)
        sin = jnp.take(self.sin, idx, 0)
        kvh = 1 if self.absorb else self.args.n_heads
        kvd = self.kv_minor if self.absorb else self.qk_head_dim

        def append(pool, layer, new_kv):
            k, v = new_kv if isinstance(new_kv, tuple) else (new_kv, None)
            pool = attn_ops.append_decode(
                pool, layer, k[:B], None if v is None else v[:B],
                dec_block_tables, dec_seq_lens, dec_valid, page_size,
            )
            return attn_ops.append_prefill_packed(
                pool, layer, k[B:], None if v is None else v[B:],
                pf_block_tables, pf_seg_ids, pf_pos, page_size,
            )

        def attend(q, pool, layer, layer_axis=""):
            od = attn_ops.attend_decode(
                q[:B], pool, layer, dec_block_tables, dec_seq_lens,
                page_size, kvh, kvd, split_kv=not self.absorb,
                scale=self.attn_scale, impl=attn_impl, mesh=mesh,
                layer_axis=layer_axis,
            )
            op = attn_ops.attend_prefill_packed(
                q[B:], pool, layer, pf_block_tables, pf_seg_ids,
                pf_pos_safe, pf_total_lens, pf_block_seg, pf_block_qstart,
                page_size, kvh, kvd, split_kv=not self.absorb,
                scale=self.attn_scale, impl=attn_impl, mesh=mesh,
                layer_axis=layer_axis,
            )
            return jnp.concatenate([od, op], axis=0)

        h, cache = self._forward(
            params, cache, h, cos, sin, append, attend, mesh
        )
        h = rms_norm(h, params["norm"], self.args.norm_eps)
        dec_logits = self._logits(params, h[:B])
        pf_last = jnp.take(h, B + pf_last_idx, axis=0)
        return dec_logits, self._logits(params, pf_last), cache

    def decode(
        self,
        params,
        cache: Dict[str, jnp.ndarray],
        tokens: jnp.ndarray,  # [B]
        seq_lens: jnp.ndarray,
        block_tables: jnp.ndarray,
        valid: jnp.ndarray,
        page_size: int,
        attn_impl: str = "xla",
        mesh=None,
        ring_kv_axis: str = "",
    ):
        h = jnp.take(params["embed"], tokens, axis=0)
        idx = jnp.minimum(seq_lens, self.cos.shape[0] - 1)
        cos = jnp.take(self.cos, idx, 0)
        sin = jnp.take(self.sin, idx, 0)

        kvh = 1 if self.absorb else self.args.n_heads
        kvd = self.kv_minor if self.absorb else self.qk_head_dim

        if ring_kv_axis:
            from chitu_tpu.ops import attention_ring as ring_ops

            def append(pool, layer, new_kv):
                k, v = new_kv if isinstance(new_kv, tuple) else (new_kv, None)
                return ring_ops.append_decode_ring(
                    pool, layer, k, v, block_tables, seq_lens, valid,
                    page_size, mesh, ring_kv_axis,
                    layer_axis=self._ring_layer_axis(),
                )

            def attend(q, pool, layer, layer_axis=""):
                return ring_ops.attend_decode_ring(
                    q, pool, layer, block_tables, seq_lens, page_size,
                    kvh, kvd, split_kv=not self.absorb,
                    scale=self.attn_scale, mesh=mesh, axis=ring_kv_axis,
                    layer_axis=self._ring_layer_axis(),
                )

        else:
            def append(pool, layer, new_kv):
                k, v = new_kv if isinstance(new_kv, tuple) else (new_kv, None)
                return attn_ops.append_decode(
                    pool, layer, k, v, block_tables, seq_lens, valid, page_size
                )

            def attend(q, pool, layer, layer_axis=""):
                return attn_ops.attend_decode(
                    q,
                    pool,
                    layer,
                    block_tables,
                    seq_lens,
                    page_size,
                    kvh,
                    kvd,
                    split_kv=not self.absorb,
                    scale=self.attn_scale,
                    impl=attn_impl,
                    mesh=mesh,
                    layer_axis=layer_axis,
                )

        # fused in-kernel append+attend (the flash_attn_with_kvcache /
        # FlashMLA contract, reference: attn_backend.py:167-243): the MLA
        # latent row lands via the kernel's aligned RMW and contributes
        # one extra online-softmax column — no per-layer XLA scatter
        fused = None
        if (
            attn_impl == "pallas"
            and mesh is None
            and not ring_kv_axis
            and os.environ.get("CHITU_TPU_FUSED_DECODE", "1") != "0"
        ):
            from chitu_tpu.ops import pallas_attention

            interp = jax.default_backend() != "tpu"

            def fused(q, pool, layer, new_kv):
                k, v = new_kv if isinstance(new_kv, tuple) else (new_kv, None)
                return pallas_attention.attend_decode_fused(
                    q, pool, layer, k, v, block_tables, seq_lens, valid,
                    page_size, kvh, kvd, split_kv=not self.absorb,
                    scale=self.attn_scale, interpret=interp,
                )

        h, cache = self._forward(
            params, cache, h, cos, sin, append, attend, mesh, fused
        )
        h = rms_norm(h, params["norm"], self.args.norm_eps)
        return self._logits(params, h), cache
