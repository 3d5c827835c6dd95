"""Ring attention (sequence-parallel prefill) vs the single-device oracle.

ADDITIVE over the reference (no SP anywhere in chitu; SURVEY §5) — the
long-context north star BASELINE.md names."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chitu_tpu.models.common import grouped_attention
from chitu_tpu.parallel.ring import ring_attention


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
@pytest.mark.parametrize("KV,H", [(4, 8), (2, 2)])
def test_ring_matches_oracle(KV, H):
    from jax.sharding import Mesh

    T, D = 64, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (T, H, D), jnp.float32) * 0.5
    k = jax.random.normal(ks[1], (T, KV, D), jnp.float32) * 0.5
    v = jax.random.normal(ks[2], (T, KV, D), jnp.float32) * 0.5
    pos = jnp.arange(T, dtype=jnp.int32)

    cols = pos[None, :]
    mask = cols <= pos[:, None]
    want = grouped_attention(q, k, v, mask)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("sp",))
    got = ring_attention(q, k, v, pos, mesh, axis="sp")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-3, rtol=2e-3
    )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_ring_with_padding_rows():
    """Padding tokens (pos = -1) contribute nothing and attend nothing."""
    from jax.sharding import Mesh

    T, H, KV, D = 64, 4, 4, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (T, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (T, KV, D), jnp.float32)
    v = jax.random.normal(ks[2], (T, KV, D), jnp.float32)
    n = 40  # valid prefix; the rest is padding
    pos = jnp.where(jnp.arange(T) < n, jnp.arange(T), -1).astype(jnp.int32)

    cols = jnp.arange(T)[None, :]
    mask = (cols <= jnp.arange(T)[:, None]) & (cols < n)
    want = grouped_attention(q[:n], k[:n], v[:n], mask[:n, :n])

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("sp",))
    got = ring_attention(q, k, v, pos, mesh, axis="sp")
    np.testing.assert_allclose(
        np.asarray(got[:n]), np.asarray(want), atol=2e-3, rtol=2e-3
    )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_ring_prefill_engine_matches_default():
    """infer.ring_prefill=true on a dp=4 mesh: same greedy tokens as the
    default prefill path (the prompt's token dim rides the ring)."""
    import dataclasses as dc
    import sys

    sys.path.insert(0, "tests")
    from helpers import tiny_cfg
    from chitu_tpu.engine import Engine
    from chitu_tpu.task import SampleParams

    def cfg(ring):
        c = tiny_cfg(**{"infer.merge_qkv_gate_up": "off"})
        m = dc.replace(
            c.models, n_layers=2, dim=256, n_heads=8, n_kv_heads=4,
            inter_dim=512, vocab_size=512,
        )
        return dc.replace(
            c, models=m,
            infer=dc.replace(c.infer, dp_size=4 if ring else 1,
                             ring_prefill=ring, prefill_chunk=1024),
        )

    p = SampleParams(temperature=0.0, max_new_tokens=5)
    prompt = "a fairly long ring prefill prompt " * 3
    want = Engine(cfg(False)).generate(prompt, p)
    eng = Engine(cfg(True))
    got = eng.generate(prompt, p)
    assert got == want
