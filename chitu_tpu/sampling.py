"""Device-resident sampling.

Capability parity with the reference's sampling stack — frequency penalty +
greedy / top-k / top-p (reference: chitu/executor.py:82-112,
chitu/utils.py:62-81) — redesigned to run *inside* the jitted step so the
decode loop stays device-resident (the reference syncs tokens to host every
step, executor.py:110; we transfer only the sampled ids).

Design notes (TPU):
- A full-vocab sort per step wastes MXU time; we restrict sampling to the
  top `MAX_K` logits (lax.top_k), which is exact for greedy/top-k<=MAX_K and
  a standard approximation for top-p.
- Frequency-penalty token counts live in a device array [max_reqs, vocab]
  indexed by request slot, updated in-jit by scatter-add.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

MAX_K = 64


def sample_tokens(
    logits: jnp.ndarray,  # [B, V] f32
    key: jax.Array,
    temperature: jnp.ndarray,  # [B] f32 (>0; 0 was coerced to greedy upstream)
    top_k: jnp.ndarray,  # [B] i32 (<=0 -> no k limit; 1 -> greedy)
    top_p: jnp.ndarray,  # [B] f32 (>=1 -> no p limit)
    greedy_all: bool = False,  # STATIC: every row is greedy (top_k == 1)
) -> jnp.ndarray:
    """Sample one token per row. Returns [B] int32.

    `greedy_all` is a host-known specialization: when every request in the
    batch is greedy the whole top-k/gumbel machinery compiles away to one
    argmax (measured ~0.3 ms/step at bs=16 V=32k — the jit-variant
    analogue of the reference keying CUDA graphs on batch shape)."""
    B, V = logits.shape
    if greedy_all:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    k_eff = min(MAX_K, V)
    # greedy rows use an EXACT argmax (cheap max-reduce); the stochastic
    # candidate set uses the TPU-optimized approximate top-k (a documented
    # refinement of the already-approximate MAX_K truncation)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if V > 4 * k_eff:
        vals, idx = jax.lax.approx_max_k(
            logits, k_eff, recall_target=0.95
        )
    else:
        vals, idx = jax.lax.top_k(logits, k_eff)  # [B, K] descending

    j = jnp.arange(k_eff)[None, :]
    kk = jnp.where(top_k <= 0, k_eff, jnp.minimum(top_k, k_eff))[:, None]
    keep_k = j < kk

    scaled = vals / jnp.maximum(temperature, 1e-6)[:, None]
    scaled = jnp.where(keep_k, scaled, -jnp.inf)

    # top-p on the truncated distribution: keep the smallest prefix whose
    # probability mass reaches top_p (always keep rank 0)
    probs = jax.nn.softmax(scaled, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_p = (cum - probs) < top_p[:, None]
    keep_p = keep_p.at[:, 0].set(True)
    scaled = jnp.where(keep_p, scaled, -jnp.inf)

    gumbel = -jnp.log(
        -jnp.log(jax.random.uniform(key, (B, k_eff), minval=1e-10, maxval=1.0))
    )
    choice = jnp.argmax(scaled + gumbel, axis=-1)
    sampled = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
    # greedy rows take the exact argmax (no noise, no approximation)
    return jnp.where(top_k == 1, greedy, sampled).astype(jnp.int32)


def apply_frequency_penalty(
    logits: jnp.ndarray,  # [B, V]
    counts: jnp.ndarray,  # [max_reqs, V] int32
    slots: jnp.ndarray,  # [B] i32
    penalty: jnp.ndarray,  # [B] f32
) -> jnp.ndarray:
    """logits - penalty * count (reference: executor.py:93-101)."""
    c = counts[slots].astype(logits.dtype)
    return logits - penalty[:, None] * c


def update_counts(
    counts: jnp.ndarray,  # [max_reqs, V] int32
    slots: jnp.ndarray,  # [B]
    tokens: jnp.ndarray,  # [B]
    valid: Optional[jnp.ndarray] = None,  # [B] bool — padded rows don't count
) -> jnp.ndarray:
    slots_safe = jnp.where(
        valid if valid is not None else jnp.ones_like(slots, bool),
        slots,
        jnp.iinfo(jnp.int32).max,
    )
    return counts.at[slots_safe, tokens].add(1, mode="drop")


def reset_slots(counts: jnp.ndarray, slots: jnp.ndarray) -> jnp.ndarray:
    """Zero freed slots' rows (called when requests finish)."""
    return counts.at[slots].set(0, mode="drop")
