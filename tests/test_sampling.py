import jax
import jax.numpy as jnp
import numpy as np

from chitu_tpu import sampling


def _mk(B, V, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, V))


def test_greedy():
    logits = _mk(4, 100)
    toks = sampling.sample_tokens(
        logits,
        jax.random.PRNGKey(1),
        jnp.ones(4),
        jnp.full((4,), 1, jnp.int32),
        jnp.ones(4),
    )
    assert (np.asarray(toks) == np.asarray(jnp.argmax(logits, -1))).all()


def test_top_k_restricts_support():
    logits = _mk(2, 50)
    allowed = np.asarray(jax.lax.top_k(logits, 5)[1])
    for seed in range(20):
        toks = np.asarray(
            sampling.sample_tokens(
                logits,
                jax.random.PRNGKey(seed),
                jnp.ones(2),
                jnp.full((2,), 5, jnp.int32),
                jnp.ones(2),
            )
        )
        for b in range(2):
            assert toks[b] in allowed[b]


def test_top_p_tiny_keeps_argmax():
    logits = _mk(3, 64)
    toks = sampling.sample_tokens(
        logits,
        jax.random.PRNGKey(7),
        jnp.ones(3),
        jnp.zeros(3, jnp.int32),
        jnp.full((3,), 1e-6),
    )
    assert (np.asarray(toks) == np.asarray(jnp.argmax(logits, -1))).all()


def test_frequency_penalty_and_counts():
    V = 32
    counts = jnp.zeros((4, V), jnp.int32)
    slots = jnp.array([0, 1], jnp.int32)
    toks = jnp.array([3, 3], jnp.int32)
    counts = sampling.update_counts(counts, slots, toks, jnp.array([True, True]))
    assert int(counts[0, 3]) == 1 and int(counts[1, 3]) == 1
    logits = jnp.zeros((2, V))
    out = sampling.apply_frequency_penalty(
        logits, counts, slots, jnp.array([2.0, 0.0])
    )
    assert float(out[0, 3]) == -2.0
    assert float(out[1, 3]) == 0.0
    counts = sampling.reset_slots(counts, jnp.array([0], jnp.int32))
    assert int(counts[0, 3]) == 0 and int(counts[1, 3]) == 1


def test_invalid_rows_do_not_count():
    V = 16
    counts = jnp.zeros((2, V), jnp.int32)
    counts = sampling.update_counts(
        counts,
        jnp.array([0, 1], jnp.int32),
        jnp.array([5, 5], jnp.int32),
        jnp.array([True, False]),
    )
    assert int(counts[0, 5]) == 1 and int(counts[1, 5]) == 0
