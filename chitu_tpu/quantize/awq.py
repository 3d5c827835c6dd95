"""AWQ offline calibration: activation-aware scale + clip search.

Capability parity with the reference's AWQ calibration
(reference: chitu/awq/auto_scale.py:100-140 grid-search of per-channel
scales s = act_scale^alpha minimizing quantized-output MSE, and
chitu/awq/auto_clip.py weight-clip search), re-done in pure JAX:

- `auto_scale_search`: for a linear y = x @ w, searches alpha over a grid;
  s = mean|x|^alpha (normalized); quantizing w*s while feeding x/s keeps
  the product exact but shifts quantization noise away from channels with
  large activations — the AWQ insight.
- `auto_clip_search`: per-group absmax shrink search minimizing output MSE.
- `calibrate_llama`: runs a llama-family model layer by layer on
  calibration tokens (offline, un-jitted is fine), collecting the input
  activations of every quantizable projection.
- `awq_quantize_llama_params`: applies searched scales — folded into the
  preceding RMSNorm weight for norm-fed projections (the AWQ fold, so
  runtime needs NO extra op) — then group-quantizes to W4A16 QTensors
  with searched clips.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chitu_tpu.ops.qtensor import QTensor, QuantKind
from chitu_tpu.quantize.transforms import quantize_weight


def _w4_roundtrip(w: jnp.ndarray, group: int) -> jnp.ndarray:
    """RTN W4A16 quantize + dequantize (the noise model being minimized)."""
    return quantize_weight(w, QuantKind.W4A16, block=group).dequantize(
        jnp.float32
    )


def auto_scale_search(
    w: jnp.ndarray,  # [K, N]
    x: jnp.ndarray,  # [S, K] calibration inputs
    group: int = 128,
    n_grid: int = 20,
) -> Tuple[jnp.ndarray, float]:
    """Grid-search the AWQ per-in-channel scale (reference:
    awq/auto_scale.py:100-140). Returns (s [K], best loss)."""
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    y_ref = xf @ wf
    act_scale = jnp.maximum(jnp.mean(jnp.abs(xf), axis=0), 1e-8)  # [K]

    best_s = jnp.ones((w.shape[0],), jnp.float32)
    best_loss = float("inf")
    for i in range(n_grid):
        alpha = i / n_grid
        s = act_scale**alpha
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))  # normalize (ref trick)
        wq = _w4_roundtrip(wf * s[:, None], group)
        y = (xf / s[None, :]) @ wq
        loss = float(jnp.mean((y - y_ref) ** 2))
        if loss < best_loss:
            best_loss = loss
            best_s = s
    return best_s, best_loss


def auto_clip_search(
    w: jnp.ndarray,  # [K, N] (already AWQ-scaled)
    x: jnp.ndarray,  # [S, K]
    group: int = 128,
    n_grid: int = 10,
    min_ratio: float = 0.5,
) -> jnp.ndarray:
    """Per-group clip-range search (reference: awq/auto_clip.py): shrink
    each group's min/max before quantization when it lowers output MSE.
    Returns the clipped weight (dense, pre-quantization)."""
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    K, N = wf.shape
    ng = (K + group - 1) // group
    pad = ng * group - K
    wp = jnp.pad(wf, ((0, pad), (0, 0))).reshape(ng, group, N)
    xp = jnp.pad(xf, ((0, 0), (0, pad))).reshape(-1, ng, group)

    best = wp
    best_loss = None
    for i in range(n_grid + 1):
        ratio = min_ratio + (1.0 - min_ratio) * i / n_grid
        hi = jnp.max(wp, axis=1, keepdims=True) * ratio
        lo = jnp.min(wp, axis=1, keepdims=True) * ratio
        wc = jnp.clip(wp, lo, hi)
        wq = _w4_roundtrip(
            wc.reshape(ng * group, N)[:K], group
        )
        wqp = jnp.pad(wq, ((0, pad), (0, 0))).reshape(ng, group, N)
        # per-group output MSE: [S, ng, group] x [ng, group, N]
        y = jnp.einsum("sgk,gkn->gsn", xp, wqp)
        y_ref = jnp.einsum("sgk,gkn->gsn", xp, wp)
        loss = jnp.mean((y - y_ref) ** 2, axis=(1, 2))  # [ng]
        if best_loss is None:
            best_loss = loss
            best = wc
        else:
            better = loss < best_loss
            best_loss = jnp.where(better, loss, best_loss)
            best = jnp.where(better[:, None, None], wc, best)
    return best.reshape(ng * group, N)[:K]


# ---------------------------------------------------------------------------
# Llama-family calibration driver (offline; mirrors the model's layer loop)
# ---------------------------------------------------------------------------


def calibrate_llama(
    model, params, tokens: np.ndarray, max_samples: int = 512
) -> Dict[str, list]:
    """Collect per-projection input activations over calibration tokens.

    Runs the transformer layer-by-layer with full (non-causal-truncated)
    attention on one sequence — calibration only needs representative
    activation statistics, not generation (reference runs real forwards
    through hooked modules, awq/auto_scale.py)."""
    from chitu_tpu.models.common import (
        apply_rope, grouped_attention, rms_norm,
    )
    from chitu_tpu.ops.linear import linear

    a = model.args
    T = int(min(len(tokens), max_samples))
    ids = jnp.asarray(np.asarray(tokens[:T], np.int32))
    h = jnp.take(params["embed"], ids, axis=0).astype(jnp.float32)
    cos = model.cos[:T]
    sin = model.sin[:T]
    H, KV, Dh = a.n_heads, a.n_kv_heads, model.head_dim
    L = a.n_layers
    layers = params["layers"]
    stats: Dict[str, list] = {}

    def put(name, x):
        stats.setdefault(name, []).append(np.asarray(x, np.float32))

    mask = jnp.tril(jnp.ones((T, T), bool))
    for l in range(L):
        g = lambda n: layers[n][l]
        x = rms_norm(h.astype(jnp.bfloat16), g("attn_norm"), a.norm_eps)
        if "wqkv" in layers:
            put("wqkv", x)
            qkv = linear(x, g("wqkv"), layers.get("b_qkv", [None] * L)[l] if "b_qkv" in layers else None)
            q = qkv[:, : H * Dh].reshape(T, H, Dh)
            k = qkv[:, H * Dh : (H + KV) * Dh].reshape(T, KV, Dh)
            v = qkv[:, (H + KV) * Dh :].reshape(T, KV, Dh)
        else:
            put("wq", x)
            q = linear(x, g("wq")).reshape(T, H, Dh)
            k = linear(x, g("wk")).reshape(T, KV, Dh)
            v = linear(x, g("wv")).reshape(T, KV, Dh)
        q = apply_rope(q, cos, sin, model.rotary_layout)
        k = apply_rope(k, cos, sin, model.rotary_layout)
        o = grouped_attention(q, k, v, mask, scale=model.attn_scale)
        o = o.reshape(T, H * Dh)
        put("wo", o)
        h = h + linear(o, g("wo")).astype(jnp.float32)

        x = rms_norm(h.astype(jnp.bfloat16), g("ffn_norm"), a.norm_eps)
        if "w_gate_up" in layers:
            put("w_gate_up", x)
            gu = linear(x, g("w_gate_up"))
            F = gu.shape[-1] // 2
            hid = jax.nn.silu(gu[:, :F]) * gu[:, F:]
        else:
            put("w_gate", x)
            hid = jax.nn.silu(linear(x, g("w_gate"))) * linear(x, g("w_up"))
        put("w_down", hid)
        h = h + linear(hid, g("w_down")).astype(jnp.float32)
    return stats


# projections whose input comes straight from an RMSNorm: the AWQ scale
# folds into the norm weight (runtime stays scale-free)
_NORM_FED = {
    "wq": "attn_norm",
    "wk": "attn_norm",
    "wv": "attn_norm",
    "wqkv": "attn_norm",
    "w_gate": "ffn_norm",
    "w_up": "ffn_norm",
    "w_gate_up": "ffn_norm",
}


def awq_quantize_llama_params(
    model,
    params,
    calib_tokens: np.ndarray,
    group: int = 128,
    do_clip: bool = True,
) -> Any:
    """Full AWQ pipeline for a llama-family parameter tree: calibrate,
    search scales (folded into norms) + clips, return the tree with
    W4A16 QTensor projections."""
    stats = calibrate_llama(model, params, calib_tokens)
    layers = dict(params["layers"])
    L = model.args.n_layers

    scaled: Dict[str, list] = {}
    norm_adjust: Dict[str, list] = {}
    out: Dict[str, Any] = {}
    quantizable = [
        n for n in ("wq", "wk", "wv", "wqkv", "w_gate", "w_up",
                    "w_gate_up", "wo", "w_down")
        if n in layers
    ]
    for l in range(L):
        # one shared scale per norm group (q/k/v share attn_norm input)
        s_by_norm: Dict[str, jnp.ndarray] = {}
        for name in quantizable:
            w = jnp.asarray(layers[name][l], jnp.float32)
            norm = _NORM_FED.get(name)
            xcal = jnp.asarray(
                stats[name if name in stats else
                      ("wq" if norm == "attn_norm" else "w_gate")][l]
            )
            if norm is not None:
                if norm not in s_by_norm:
                    s, _ = auto_scale_search(w, xcal, group=group)
                    s_by_norm[norm] = s
                s = s_by_norm[norm]
                w = w * s[:, None]
            if do_clip:
                # the runtime input to a scaled weight is x / s
                xs = xcal / s[None, :] if norm is not None else xcal
                w = auto_clip_search(w, xs, group=group)
            scaled.setdefault(name, [None] * L)[l] = quantize_weight(
                w, QuantKind.W4A16, block=group
            )
        for norm, s in s_by_norm.items():
            norm_adjust.setdefault(norm, [None] * L)[l] = (
                jnp.asarray(layers[norm][l], jnp.float32) / s
            )

    from chitu_tpu.loaders_moe import _stack

    new_layers = dict(layers)
    for name, vals in scaled.items():
        new_layers[name] = _stack(vals)
    for norm, vals in norm_adjust.items():
        new_layers[norm] = jnp.stack(
            [v for v in vals]
        ).astype(layers[norm].dtype)
    new_params = dict(params)
    new_params["layers"] = new_layers
    return new_params
