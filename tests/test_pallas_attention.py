"""Pallas attention kernels vs the jnp oracle (interpret mode on CPU;
the same tests compile on the real chip via CHITU_TPU_TEST_BACKEND=tpu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chitu_tpu.models.common import pad_kv_minor
from chitu_tpu.ops import attention as xla_attn
from chitu_tpu.ops import pallas_attention as pk

PAGE = 16


LAYER = 1  # exercise nonzero layer indexing into the stacked pool


def _setup(B=3, H=8, KV=4, D=64, P=24, mp=6, seed=0, split=True):
    C = pad_kv_minor(KV, D)
    M = 2 * C if split else C
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    pool = jax.random.normal(ks[0], (3, P, PAGE, M), jnp.float32) * 0.3
    q = jax.random.normal(ks[2], (B, H, D), jnp.float32) * 0.5
    bt = np.full((B, mp), -1, np.int32)
    for b in range(B):
        bt[b] = np.arange(b * mp, (b + 1) * mp)
    seq_lens = jnp.array([5, PAGE * 2 + 3, PAGE * mp - 1], jnp.int32)[:B]
    return q, pool, jnp.asarray(bt), seq_lens


def _interp():
    return jax.default_backend() != "tpu"


@pytest.mark.parametrize("KV", [4, 1, 8])
def test_decode_kernel_matches_oracle(KV):
    q, pool, bt, seq_lens = _setup(KV=KV)
    want = xla_attn.attend_decode(
        q, pool, jnp.int32(LAYER), bt, seq_lens, PAGE, KV, 64, split_kv=True, impl="xla"
    )
    got = pk.attend_decode(
        q, pool, jnp.int32(LAYER), bt, seq_lens, PAGE, KV, 64, split_kv=True,
        interpret=_interp(),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )


def test_decode_kernel_merged_mla_layout():
    # merged latent cache: V rows are the K rows (split_kv=False)
    q, pool, bt, seq_lens = _setup(H=8, KV=1, D=128, split=False)
    want = xla_attn.attend_decode(
        q, pool, jnp.int32(LAYER), bt, seq_lens, PAGE, 1, 128, split_kv=False, impl="xla"
    )
    got = pk.attend_decode(
        q, pool, jnp.int32(LAYER), bt, seq_lens, PAGE, 1, 128, split_kv=False,
        interpret=_interp(),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )


def test_decode_kernel_large_heads():
    # llama-8B geometry: H=32, KV=8, D=128
    q, pool, bt, seq_lens = _setup(H=32, KV=8, D=128)
    want = xla_attn.attend_decode(
        q, pool, jnp.int32(LAYER), bt, seq_lens, PAGE, 8, 128, split_kv=True, impl="xla"
    )
    got = pk.attend_decode(
        q, pool, jnp.int32(LAYER), bt, seq_lens, PAGE, 8, 128, split_kv=True,
        interpret=_interp(),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )


def _fused_setup(split=True, KV=4, D=64, H=8):
    q, pool, bt, seq_lens = _setup(KV=KV, D=D, H=H, split=split)
    B = q.shape[0]
    ks = jax.random.split(jax.random.PRNGKey(7), 2)
    k = jax.random.normal(ks[0], (B, KV, D), jnp.float32) * 0.5
    v = jax.random.normal(ks[1], (B, KV, D), jnp.float32) * 0.5
    valid = jnp.ones((B,), bool)
    return q, pool, bt, seq_lens, k, (v if split else None), valid


@pytest.mark.parametrize("window,softcap", [(0, 0.0), (24, 0.0), (0, 5.0)])
def test_decode_fused_matches_append_then_attend(window, softcap):
    """Fused append+attend == separate append_decode + attend_decode
    (the reference's flash_attn_with_kvcache contract,
    reference: attn_backend.py:167-243)."""
    q, pool, bt, seq_lens, k, v, valid = _fused_setup()
    layer = jnp.int32(LAYER)
    pool_ref = xla_attn.append_decode(pool, layer, k, v, bt, seq_lens, valid, PAGE)
    want = xla_attn.attend_decode(
        q, pool_ref, layer, bt, seq_lens, PAGE, 4, 64, split_kv=True,
        impl="xla", window=window, softcap=softcap,
    )
    got, pool_got = pk.attend_decode_fused(
        q, pool, layer, k, v, bt, seq_lens, valid, PAGE, 4, 64,
        split_kv=True, interpret=_interp(), window=window, softcap=softcap,
    )
    np.testing.assert_array_equal(np.asarray(pool_got), np.asarray(pool_ref))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )


def test_decode_fused_merged_mla_and_dead_rows():
    q, pool, bt, seq_lens, k, v, valid = _fused_setup(split=False, KV=1, D=128)
    layer = jnp.int32(LAYER)
    valid = jnp.asarray([True, False, True])
    pool_ref = xla_attn.append_decode(pool, layer, k, None, bt, seq_lens, valid, PAGE)
    got, pool_got = pk.attend_decode_fused(
        q, pool, layer, k, None, bt, seq_lens, valid, PAGE, 1, 128,
        split_kv=False, interpret=_interp(),
    )
    # dead row's page slot untouched; live rows appended
    np.testing.assert_array_equal(np.asarray(pool_got), np.asarray(pool_ref))
    want = xla_attn.attend_decode(
        q, pool_ref, layer, bt, seq_lens, PAGE, 1, 128, split_kv=False,
        impl="xla",
    )
    live = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(got)[live], np.asarray(want)[live], atol=2e-2, rtol=2e-2
    )


@pytest.mark.parametrize("start,n", [(0, 64), (64, 64), (16, 64), (0, 128)])
def test_prefill_kernel_matches_oracle(start, n):
    q, pool, bt, _ = _setup(B=1, P=24, mp=24)
    T = n
    total = start + n
    q1 = jax.random.normal(jax.random.PRNGKey(9), (T, 8, 64)) * 0.5
    q_pos = start + jnp.arange(T, dtype=jnp.int32)
    want = xla_attn.attend_prefill(
        q1, pool, jnp.int32(LAYER), bt[0], q_pos, jnp.int32(total), PAGE, 4, 64,
        split_kv=True, impl="xla",
    )
    got = pk.attend_prefill(
        q1, pool, jnp.int32(LAYER), bt[0], q_pos, jnp.int32(total), PAGE, 4, 64,
        split_kv=True, interpret=_interp(),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )


@pytest.mark.parametrize("window,softcap", [(8, 0.0), (0, 5.0), (12, 3.0)])
def test_decode_window_softcap_matches_oracle(window, softcap):
    """Sliding window + logit softcap in-kernel vs the oracle
    (reference: attn_backend.py:43-44 window_size, :84-85 softcap)."""
    q, pool, bt, seq_lens = _setup()
    want = xla_attn.attend_decode(
        q, pool, jnp.int32(LAYER), bt, seq_lens, PAGE, 4, 64,
        split_kv=True, impl="xla", window=window, softcap=softcap,
    )
    got = pk.attend_decode(
        q, pool, jnp.int32(LAYER), bt, seq_lens, PAGE, 4, 64,
        split_kv=True, interpret=_interp(), window=window, softcap=softcap,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )


@pytest.mark.parametrize("window,softcap", [(8, 0.0), (0, 5.0), (12, 3.0)])
def test_prefill_window_softcap_matches_oracle(window, softcap):
    q, pool, bt, _ = _setup()
    T = 32
    total = 40  # chunked: 8 tokens of context precede this chunk
    q_pos = jnp.arange(8, 8 + T, dtype=jnp.int32)
    qp = jax.random.normal(jax.random.PRNGKey(9), (T, 8, 64)) * 0.5
    want = xla_attn.attend_prefill(
        qp, pool, jnp.int32(LAYER), bt[0], q_pos, jnp.int32(total), PAGE,
        4, 64, split_kv=True, impl="xla", window=window, softcap=softcap,
    )
    got = pk.attend_prefill(
        qp, pool, jnp.int32(LAYER), bt[0], q_pos, jnp.int32(total), PAGE,
        4, 64, split_kv=True, interpret=_interp(), window=window,
        softcap=softcap,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )


def test_decode_fused_multi_block_padded_rows():
    """B=10 spans two row-blocks (RB=8) with padding: live rows match the
    separate append+attend path, the dead row's page slot is untouched."""
    L, P, KV, Dh, H, B = 2, 32, 2, 32, 4, 10
    M = 2 * KV * Dh
    pool = jax.random.normal(
        jax.random.PRNGKey(0), (L, P, PAGE, M), jnp.float32
    ).astype(jnp.bfloat16)
    q = jax.random.normal(
        jax.random.PRNGKey(1), (B, H, Dh), jnp.float32
    ).astype(jnp.bfloat16)
    k = jax.random.normal(
        jax.random.PRNGKey(2), (B, KV, Dh), jnp.float32
    ).astype(jnp.bfloat16)
    v = jax.random.normal(
        jax.random.PRNGKey(3), (B, KV, Dh), jnp.float32
    ).astype(jnp.bfloat16)
    bt = jnp.asarray([[3 * i, 3 * i + 1, 3 * i + 2] for i in range(B)], jnp.int32)
    seq_lens = jnp.asarray([40, 17, 33, 5, 47, 1, 29, 16, 31, 8], jnp.int32)
    valid = jnp.asarray([True] * 9 + [False])
    layer = jnp.int32(1)
    pool_ref = xla_attn.append_decode(pool, layer, k, v, bt, seq_lens, valid, PAGE)
    want = xla_attn.attend_decode(
        q, pool_ref, layer, bt, seq_lens, PAGE, KV, Dh, split_kv=True,
        impl="xla",
    )
    got, pool_got = pk.attend_decode_fused(
        q, pool, layer, k, v, bt, seq_lens, valid, PAGE, KV, Dh,
        split_kv=True, interpret=_interp(),
    )
    np.testing.assert_array_equal(np.asarray(pool_got), np.asarray(pool_ref))
    lv = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(got)[lv], np.asarray(want)[lv], atol=2e-2, rtol=2e-2
    )


def test_decode_kernel_fp8_pool_matches_oracle():
    """int8 pools hold fp8-e4m3 bits (infer.kv_dtype=fp8): the kernel's
    in-kernel bit-placement dequant must agree with the oracle's
    unpack_pool dequant on the same encoded pool."""
    from chitu_tpu.models.common import kv_encode

    q, pool, bt, seq_lens = _setup()
    pool8 = kv_encode(pool.astype(jnp.bfloat16), jnp.int8)
    want = xla_attn.attend_decode(
        q, pool8, jnp.int32(LAYER), bt, seq_lens, PAGE, 4, 64,
        split_kv=True, impl="xla",
    )
    got = pk.attend_decode(
        q, pool8, jnp.int32(LAYER), bt, seq_lens, PAGE, 4, 64,
        split_kv=True, interpret=_interp(),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )


def test_decode_fused_fp8_pool_appends_encoded_bits():
    """The fused append+attend path with an fp8 pool: the new token's KV
    row must land as e4m3 BITS and the attention output must match
    append-then-attend on the oracle."""
    from chitu_tpu.models.common import kv_encode

    q, pool, bt, seq_lens = _setup(B=2, mp=6)
    pool8 = kv_encode(pool.astype(jnp.bfloat16), jnp.int8)
    KV, D = 4, 64
    ks = jax.random.split(jax.random.PRNGKey(9), 2)
    k = jax.random.normal(ks[0], (2, KV, D), jnp.bfloat16) * 0.3
    v = jax.random.normal(ks[1], (2, KV, D), jnp.bfloat16) * 0.3
    valid = jnp.array([True, True])

    ref_pool = xla_attn.append_decode(
        pool8, jnp.int32(LAYER), k, v, bt, seq_lens, valid, PAGE
    )
    want = xla_attn.attend_decode(
        q, ref_pool, jnp.int32(LAYER), bt, seq_lens, PAGE, KV, D,
        split_kv=True, impl="xla",
    )
    got, new_pool = pk.attend_decode_fused(
        q, pool8, jnp.int32(LAYER), k, v, bt, seq_lens, valid, PAGE,
        KV, D, split_kv=True, interpret=_interp(),
    )
    assert new_pool.dtype == jnp.int8
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )
    np.testing.assert_array_equal(
        np.asarray(new_pool), np.asarray(ref_pool)
    )


@pytest.mark.parametrize("window,softcap", [(0, 0.0), (24, 0.0), (0, 5.0)])
def test_prefill_grouped_kernel_matches_oracle(window, softcap):
    """The KV-major GROUPED prefill kernel (r5, head_dim % 128 == 0: each
    KV head's G query heads dot only their own lane slice — no expanded-q
    dead lanes, no mask/fold matmuls) must match the oracle. D=128
    triggers the grouped path; the tiny-model D=64 tests above keep
    covering the expanded fallback."""
    from chitu_tpu.ops.pallas_attention import _grouped_eligible

    H, KV, D = 8, 4, 128
    q, pool, bt, _ = _setup(B=1, H=H, KV=KV, D=D, P=24, mp=24)
    assert _grouped_eligible(True, KV, D, H, None, 0)
    T, start = 64, 16
    total = start + T
    q1 = jax.random.normal(jax.random.PRNGKey(9), (T, H, D)) * 0.5
    q_pos = start + jnp.arange(T, dtype=jnp.int32)
    want = xla_attn.attend_prefill(
        q1, pool, jnp.int32(LAYER), bt[0], q_pos, jnp.int32(total), PAGE,
        KV, D, split_kv=True, impl="xla", window=window, softcap=softcap,
    )
    got = pk.attend_prefill(
        q1, pool, jnp.int32(LAYER), bt[0], q_pos, jnp.int32(total), PAGE,
        KV, D, split_kv=True, interpret=_interp(), window=window,
        softcap=softcap,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
    )


def test_prefill_packed_grouped_matches_oracle():
    """Packed-varlen GROUPED prefill (r5): ragged segments + dead blocks
    through the KV-major kernel must match the packed oracle at D=128."""
    H, KV, D = 8, 4, 128
    C = pad_kv_minor(KV, D)
    M = 2 * C
    P, mp, R = 24, 8, 2
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    pool = jax.random.normal(ks[0], (3, P, PAGE, M), jnp.float32) * 0.3
    bt = np.full((R, mp), -1, np.int32)
    bt[0] = np.arange(0, mp)
    bt[1] = np.arange(mp, 2 * mp)
    Tq = 16
    lens = [40, 24]  # padded to 48, 32 -> 5 blocks + 1 dead (T=96)
    NB, T = 6, 96
    seg_ids = np.full((T,), -1, np.int32)
    pos = np.full((T,), -1, np.int32)
    block_seg = np.full((NB,), -1, np.int32)
    block_qstart = np.zeros((NB,), np.int32)
    off = 0
    for r, n in enumerate(lens):
        npad = (n + Tq - 1) // Tq * Tq
        seg_ids[off : off + n] = r
        pos[off : off + n] = np.arange(n)
        b0 = off // Tq
        nb_r = npad // Tq
        block_seg[b0 : b0 + nb_r] = r
        block_qstart[b0 : b0 + nb_r] = np.arange(nb_r) * Tq
        off += npad
    q1 = jax.random.normal(ks[1], (T, H, D)) * 0.5
    total_lens = jnp.asarray(lens, jnp.int32)
    args = (
        q1, pool, jnp.int32(LAYER), jnp.asarray(bt),
    )
    want = xla_attn._oracle_prefill_packed(
        q1, pool, jnp.int32(LAYER), jnp.asarray(bt), jnp.asarray(seg_ids),
        jnp.asarray(np.maximum(pos, 0)), total_lens, KV, D, True, None,
    )
    got = pk.attend_prefill_packed(
        q1, pool, jnp.int32(LAYER), jnp.asarray(bt),
        jnp.asarray(block_seg), jnp.asarray(block_qstart), total_lens,
        PAGE, KV, D, split_kv=True, interpret=_interp(),
    )
    gm = np.asarray(got)
    wm = np.asarray(want)
    live = np.asarray(seg_ids) >= 0
    np.testing.assert_allclose(gm[live], wm[live], atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("kind", ["uk", "uv"])
def test_absorb_matmul_matches_einsum(kind):
    """Pallas MLA absorb projections (r5): per-head DMA slices of the
    stacked wkv_b leaf + MXU dots must match the einsum oracle."""
    from chitu_tpu.ops.pallas_absorb import absorb_kernel_ok, absorb_matmul

    L, C, H, dn, dv, T = 3, 64, 4, 128, 128, 5
    ks = jax.random.split(jax.random.PRNGKey(4), 2)
    w = (
        jax.random.normal(ks[0], (L, C, H * (dn + dv)), jnp.float32) * 0.1
    ).astype(jnp.bfloat16)
    assert absorb_kernel_ok(w, dn, dv, C)
    wb = w[LAYER].reshape(C, H, dn + dv)
    if kind == "uk":
        x = (
            jax.random.normal(ks[1], (T, H, dn), jnp.float32) * 0.5
        ).astype(jnp.bfloat16)
        want = jnp.einsum(
            "thd,chd->thc", x, wb[..., :dn],
            preferred_element_type=jnp.float32,
        )
    else:
        x = (
            jax.random.normal(ks[1], (T, H, C), jnp.float32) * 0.5
        ).astype(jnp.bfloat16)
        want = jnp.einsum(
            "thc,chd->thd", x, wb[..., dn:],
            preferred_element_type=jnp.float32,
        )
    got = absorb_matmul(
        x, w, jnp.int32(LAYER), kind, dn, dv, interpret=_interp()
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=2e-2, rtol=2e-2
    )


def test_mla_absorb_kernel_engine_parity():
    """A flagship-dims (dn=dv=128) MLA engine with op_impl=pallas must
    route wkv_b through the absorb kernel (whole leaf stays out of the
    scan) and produce the same greedy tokens as the einsum path."""
    import dataclasses as dc

    from chitu_tpu.config import load_config
    from chitu_tpu.engine import Engine
    from chitu_tpu.task import SampleParams

    def cfg_of(impl):
        return load_config(
            overrides=[
                "models=tiny-deepseek-debug",
                "models.dim=256",
                "models.mla.qk_nope_head_dim=128",
                "models.mla.v_head_dim=128",
                "models.mla.kv_lora_rank=128",
                "models.mla.qk_rope_head_dim=64",
                "models.n_heads=4",
                "models.n_kv_heads=4",
                "infer.max_seq_len=128",
                "infer.max_reqs=2",
                "infer.page_size=16",
                "infer.stop_with_eos=false",
                f"infer.op_impl={impl}",
            ]
        )

    p = SampleParams(temperature=0.0, max_new_tokens=4)
    want = Engine(cfg_of("xla")).generate("absorb kernel parity", p)

    eng = Engine(cfg_of("pallas"))
    from chitu_tpu.ops.pallas_absorb import absorb_kernel_ok

    w = eng.params["moe_layers"]["wkv_b"]
    assert absorb_kernel_ok(w, 128, 128, 128)
    assert eng.model._absorb_static_names(
        eng.params["moe_layers"], None, ""
    ) == frozenset({"wkv_b"})
    got = eng.generate("absorb kernel parity", p)
    assert got == want


def test_prefill_packed_fused_matches_separate():
    """Fused in-kernel prefill append+attend (r5) == XLA append_prefill_
    packed followed by the packed attend, pool bytes included."""
    from chitu_tpu.ops.pallas_attention import (
        attend_prefill_packed_fused,
        prefill_packed_fused_ok,
    )

    H, KV, D = 8, 4, 128
    C = pad_kv_minor(KV, D)
    M = 2 * C
    P, mp, R = 24, 8, 2
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    pool = jax.random.normal(ks[0], (3, P, PAGE, M), jnp.float32) * 0.3
    bt = np.full((R, mp), -1, np.int32)
    bt[0] = np.arange(0, mp)
    bt[1] = np.arange(mp, 2 * mp)
    Tq = PAGE  # page % Tq == 0
    lens = [40, 24]  # padded to 48, 32 -> T=80, NB=5
    NB, T = 5, 80
    assert prefill_packed_fused_ok(True, KV, D, H, PAGE, Tq)
    seg_ids = np.full((T,), -1, np.int32)
    pos = np.full((T,), -1, np.int32)
    block_seg = np.full((NB,), -1, np.int32)
    block_qstart = np.zeros((NB,), np.int32)
    off = 0
    for r, n in enumerate(lens):
        npad = (n + Tq - 1) // Tq * Tq
        seg_ids[off : off + n] = r
        pos[off : off + n] = np.arange(n)
        b0 = off // Tq
        nb_r = npad // Tq
        block_seg[b0 : b0 + nb_r] = r
        block_qstart[b0 : b0 + nb_r] = np.arange(nb_r) * Tq
        off += npad
    q1 = jax.random.normal(ks[1], (T, H, D)) * 0.5
    k1 = jax.random.normal(ks[2], (T, KV, D)) * 0.5
    v1 = jax.random.normal(ks[3], (T, KV, D)) * 0.5
    total_lens = jnp.asarray(lens, jnp.int32)

    pool_ref = xla_attn.append_prefill_packed(
        pool, jnp.int32(LAYER), k1, v1, jnp.asarray(bt),
        jnp.asarray(seg_ids), jnp.asarray(pos), PAGE,
    )
    want = pk.attend_prefill_packed(
        q1, pool_ref, jnp.int32(LAYER), jnp.asarray(bt),
        jnp.asarray(block_seg), jnp.asarray(block_qstart), total_lens,
        PAGE, KV, D, split_kv=True, interpret=_interp(),
    )
    got, pool_got = attend_prefill_packed_fused(
        q1, pool, jnp.int32(LAYER), k1, v1, jnp.asarray(bt),
        jnp.asarray(block_seg), jnp.asarray(block_qstart), total_lens,
        PAGE, KV, D, split_kv=True, interpret=_interp(),
    )
    np.testing.assert_allclose(
        np.asarray(pool_got), np.asarray(pool_ref), atol=2e-2, rtol=2e-2
    )
    live = np.asarray(seg_ids) >= 0
    np.testing.assert_allclose(
        np.asarray(got)[live], np.asarray(want)[live], atol=2e-2, rtol=2e-2
    )
