"""Microbatch pipeline-parallel decode.

The TPU-native replacement for the reference's slot-interleaved PP decode
(reference: chitu/scheduler.py:139-186 SkewPipelineScheduler,
chitu/global_vars.py:230-268 SlotHandle, chitu/executor.py:179-299
PipeTensorExecutor stage relay): instead of host-driven isend/recv of
hidden states, ONE jitted program runs a phase loop under
`shard_map` over the 'pp' mesh axis —

- each stage holds its layer slice of the stacked parameters and its
  slice of the KV pool (both already 'pp'-sharded);
- S = pp microbatch groups stream through the pipeline: at phase p,
  stage s processes group (p - s) mod pp at decode step (p - s) // pp,
  so in steady state every stage is busy with a different group;
- activations and freshly sampled tokens travel stage-to-stage with a
  single ring `ppermute` per phase (last stage -> stage 0 carries the
  token that seeds the group's next decode step);
- 'tp' (and 'dp') stay GSPMD-managed *inside* the shard_map (auto axes),
  so tensor parallelism composes without manual collectives.

Scope notes (v1): greedy / top-k/top-p sampling runs at the last stage;
frequency-penalty counts and in-window EOS early-exit are handled by the
host after the window (the executor truncates at EOS exactly as the
sequential path's host loop does).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from chitu_tpu import sampling
from chitu_tpu.models.common import rms_norm
from chitu_tpu.ops import attention as attn_ops


def supports_pipeline(model, mesh) -> bool:
    if mesh is None:
        return False
    pp = mesh.shape.get("pp", 1)
    if pp <= 1 or mesh.shape.get("dp", 1) > 1:
        return False
    # llama-family single-stack models only (deepseek's dual stack falls
    # back to the GSPMD-sequential path)
    return (
        hasattr(model, "_run_layers")
        and model.args.n_layers % pp == 0
    )


@functools.partial(
    jax.jit,
    static_argnames=("model", "window", "page_size", "mesh"),
    donate_argnums=(2,),
)
def decode_pipelined(
    model,
    params,
    cache_arrays,  # {"kv": [L, P, page, M]} 'pp'-sharded on layer dim
    tokens0: jnp.ndarray,  # [S, Bg] first fed token per group
    seq0: jnp.ndarray,  # [S, Bg] context length BEFORE the fed token
    bts: jnp.ndarray,  # [S, Bg, mp] block tables
    valid: jnp.ndarray,  # [S, Bg]
    temps: jnp.ndarray,  # [S, Bg]
    top_ks: jnp.ndarray,  # [S, Bg] i32
    top_ps: jnp.ndarray,  # [S, Bg]
    rng: jax.Array,
    window: int,
    page_size: int,
    mesh=None,
):
    """Run `window` decode steps for S = pp groups through the stage
    pipeline. Returns (tokens [window, S, Bg], cache_arrays)."""
    pp = mesh.shape["pp"]
    S, Bg = tokens0.shape
    assert S == pp, "one microbatch group per stage"
    a = model.args
    n_phases = pp * window + pp - 1

    layer_leaves = params["layers"]
    embed = params["embed"]
    norm_w = params["norm"]
    head = (
        embed.T if a.tie_word_embeddings else params["lm_head"]
    )
    pool = cache_arrays["kv"]


    def stage_fn(
        layers_l, pool_l, embed_r, norm_r, head_r,
        tokens0_r, seq0_r, bts_r, valid_r, temps_r, tks_r, tps_r, rng_r,
    ):
        stage = jax.lax.axis_index("pp")
        last = pp - 1
        D = embed_r.shape[-1]

        def one_phase(p, carry):
            h_cur, tok_cur, pool_l, outs = carry
            rel = p - stage
            m = jnp.where(rel >= 0, rel % pp, 0)
            k = jnp.where(rel >= 0, rel // pp, 0)
            live = (rel >= 0) & (rel < pp * window)

            tok_first = jax.lax.dynamic_index_in_dim(
                tokens0_r, m, 0, keepdims=False
            )
            tok = jnp.where(k == 0, tok_first, tok_cur)
            h_in = jnp.where(
                stage == 0, jnp.take(embed_r, tok, axis=0), h_cur
            )

            seqm = (
                jax.lax.dynamic_index_in_dim(seq0_r, m, 0, keepdims=False)
                + k
            )
            btm = jax.lax.dynamic_index_in_dim(bts_r, m, 0, keepdims=False)
            validm = (
                jax.lax.dynamic_index_in_dim(valid_r, m, 0, keepdims=False)
                & live
            )

            idx = jnp.minimum(seqm, model.cos.shape[0] - 1)
            cos = jnp.take(model.cos, idx, 0)
            sin = jnp.take(model.sin, idx, 0)

            # global layer index for rope-free layers is irrelevant; the
            # pool slice is local so layer ids are local too
            def append(pool, layer, kk, vv):
                return attn_ops.append_decode(
                    pool, layer, kk, vv, btm, seqm, validm, page_size
                )

            def attend(q, pool, layer):
                return attn_ops.attend_decode(
                    q, pool, layer, btm, seqm, page_size,
                    a.n_kv_heads, model.head_dim, split_kv=True,
                    scale=model.attn_scale, impl="xla", mesh=None,
                    window=a.sliding_window, softcap=a.attn_softcap,
                )

            h_out, pool_l = model._run_layers(
                {"layers": layers_l}, pool_l, h_in, cos, sin,
                attend, append,
            )

            # last stage only: head + sampling for group m's step k (the
            # cond keeps the [D, V] lm_head read off the other stages)
            def head_and_sample(h_out):
                hn = rms_norm(h_out, norm_r, a.norm_eps)
                logits = jnp.dot(
                    hn, head_r.astype(hn.dtype),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.float32)
                sub = jax.random.fold_in(rng_r, m * window + k)
                return sampling.sample_tokens(
                    logits,
                    sub,
                    jax.lax.dynamic_index_in_dim(temps_r, m, 0, False),
                    jax.lax.dynamic_index_in_dim(tks_r, m, 0, False),
                    jax.lax.dynamic_index_in_dim(tps_r, m, 0, False),
                )

            new_tok = jax.lax.cond(
                stage == last,
                head_and_sample,
                lambda _: jnp.zeros((Bg,), jnp.int32),
                h_out,
            )
            outs = jnp.where(
                live & (stage == last),
                outs.at[k, m].set(jnp.where(validm, new_tok, -1)),
                outs,
            )

            # ring: activations + token to the next stage (last -> 0
            # carries the token that seeds the group's next step)
            perm = [(i, (i + 1) % pp) for i in range(pp)]
            h_next = jax.lax.ppermute(h_out, "pp", perm)
            tok_next = jax.lax.ppermute(new_tok, "pp", perm)
            return h_next, tok_next, pool_l, outs

        h0 = jnp.zeros((Bg, D), embed_r.dtype)
        t0 = jnp.zeros((Bg,), jnp.int32)
        # only the last stage's outs are real: others contribute zeros to
        # the psum; the last stage initializes to -1 (sentinel rows)
        outs0 = jnp.where(
            stage == last,
            jnp.full((window, S, Bg), -1, jnp.int32),
            jnp.zeros((window, S, Bg), jnp.int32),
        )
        _, _, pool_l, outs = jax.lax.fori_loop(
            0, n_phases, one_phase, (h0, t0, pool_l, outs0)
        )
        return jax.lax.psum(outs, "pp"), pool_l

    # layer leaves: 'pp' on the stacked layer dim (dim 0); QTensor leaves
    # share the same prefix spec
    layer_specs = jax.tree_util.tree_map(
        lambda _: P("pp"), layer_leaves,
        is_leaf=lambda x: hasattr(x, "data") or hasattr(x, "shape"),
    )

    outs, pool = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(
            layer_specs,
            P("pp"),
            P(None),
            P(None),
            P(None),
            P(None),
            P(None),
            P(None),
            P(None),
            P(None),
            P(None),
            P(None),
            P(None),
        ),
        out_specs=(P(None), P("pp")),
        check_vma=False,
        axis_names={"pp"},  # tp/dp stay GSPMD-auto inside
    )(
        layer_leaves, pool, embed, norm_w, head,
        tokens0, seq0, bts, valid, temps, top_ks, top_ps, rng,
    )
    return outs, {"kv": pool}
