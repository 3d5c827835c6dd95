"""Automatic prefix caching (kvcache/paged.PrefixCachingAllocator).

ADDITIVE over the reference: its PrefixAlign scheduler only sorts by
shared prefix (reference: chitu/scheduler.py:275-309); here full prompt
pages are content-hashed and shared read-only between requests, so a
repeated system prompt prefills only its tail. These tests pin:

- allocator bookkeeping (attach/publish/free/evict, refcounts, LRU),
- engine-level token equality vs the uncached engine (shared pages must
  hold exactly the KV the uncached prefill would compute),
- immutability (a cache-hit request decoding must not corrupt the
  shared pages for later requests),
- pool reclamation under churn (no leaked pages, no wedged pool).
"""

import numpy as np
import pytest

from chitu_tpu.engine import Engine
from chitu_tpu.kvcache.paged import PrefixCachingAllocator
from chitu_tpu.task import SampleParams

from helpers import tiny_cfg


PAGE = 16


def _alloc():
    return PrefixCachingAllocator(num_pages=8, page_size=PAGE)


def test_allocator_attach_publish_free():
    a = _alloc()
    prompt = list(range(40))  # 2 full pages + 8-token tail
    assert a.lookup("r1", prompt) == 0  # cold
    assert a.ensure("r1", len(prompt) + 1)
    pages_r1 = list(a.req_pages["r1"])
    a.register("r1", prompt)
    # r2 with the same prompt attaches the 2 full pages
    assert a.lookup("r2", prompt) == 2 * PAGE
    assert a.req_pages["r2"] == pages_r1[:2]
    assert a.hits == 2
    assert a.ensure("r2", len(prompt) + 1)
    # r2's tail page is private (not r1's)
    assert a.req_pages["r2"][2] not in pages_r1
    a.free("r1")
    a.free("r2")
    # shared pages stay cached (evictable), privates return to the pool
    assert len(a.lru) == 2
    assert a.num_free() == 8  # free + evictable
    # a third request still hits the cache after both owners left
    assert a.lookup("r3", prompt) == 2 * PAGE


def test_allocator_divergent_prefix():
    a = _alloc()
    p1 = list(range(40))
    p2 = list(range(16)) + list(range(100, 124))  # shares page 0 only
    a.lookup("r1", p1)
    a.ensure("r1", 41)
    a.register("r1", p1)
    assert a.lookup("r2", p2) == PAGE  # first page shared, second not
    assert a.ensure("r2", 41)
    a.register("r2", p2)
    # p2's second full page now cached under its own chain
    a.free("r1")
    a.free("r2")
    assert a.lookup("r3", p2) == 2 * PAGE


def test_allocator_eviction_under_pressure():
    a = _alloc()  # 8 pages total
    # fill the cache with 3 distinct 2-page prompts (6 cached pages)
    for i in range(3):
        prompt = list(range(100 * i, 100 * i + 33))
        a.lookup(f"w{i}", prompt)
        assert a.ensure(f"w{i}", 34)
        a.register(f"w{i}", prompt)
        a.free(f"w{i}")
    assert len(a.lru) == 6
    # a new 7-page request must evict LRU entries and still fit
    assert a.ensure("big", 7 * PAGE)
    assert len(a.req_pages["big"]) == 7
    a.free("big")
    # oldest entries were evicted; the pool is fully reclaimable
    assert a.num_free() == 8


def test_allocator_page_aligned_prompt():
    a = _alloc()
    prompt = list(range(32))  # exactly 2 pages: last page stays private
    a.lookup("r1", prompt)
    a.ensure("r1", 33)
    a.register("r1", prompt)
    assert a.lookup("r2", prompt) == PAGE  # only page 0 shareable


@pytest.fixture(scope="module")
def engines():
    base = tiny_cfg(**{"infer.stop_with_eos": False})
    cached = tiny_cfg(
        **{"infer.stop_with_eos": False, "infer.prefix_cache": True}
    )
    return Engine(base), Engine(cached)


def _prompt_tokens(seed, n):
    rng = np.random.default_rng(seed)
    return rng.integers(300, 500, n).tolist()


def test_engine_tokens_match_uncached(engines):
    base, eng = engines
    assert isinstance(eng.cache.allocator, PrefixCachingAllocator)
    p = SampleParams(temperature=0.0, max_new_tokens=6)
    prompt = _prompt_tokens(0, 40)

    def gen(e):
        req = e.submit("", p, prompt_tokens=prompt)
        e.run_until_complete()
        return list(req.async_stream.tokens)

    want = gen(base)
    first = gen(eng)
    assert eng.cache.allocator.hits == 0  # cold
    second = gen(eng)
    assert eng.cache.allocator.hits == 2  # 2 full pages reused
    assert first == want and second == want


def test_engine_shared_pages_survive_decode_churn(engines):
    base, eng = engines
    p = SampleParams(temperature=0.0, max_new_tokens=6)
    prompt = _prompt_tokens(1, 45)
    tail_a = _prompt_tokens(2, 7)
    tail_b = _prompt_tokens(3, 7)

    def gen(e, toks):
        req = e.submit("", p, prompt_tokens=toks)
        e.run_until_complete()
        return list(req.async_stream.tokens)

    # seed the cache, then two divergent-tail requests sharing the prefix
    gen(eng, prompt)
    for tail in (tail_a, tail_b, tail_a):
        assert gen(eng, prompt + tail) == gen(base, prompt + tail)


def test_engine_concurrent_sharers_and_reclaim(engines):
    _, eng = engines
    p = SampleParams(temperature=0.0, max_new_tokens=4)
    prompt = _prompt_tokens(4, 40)
    free0 = eng.cache.allocator.num_free()
    reqs = [eng.submit("", p, prompt_tokens=prompt) for _ in range(4)]
    eng.run_until_complete()
    assert len(eng.pool) == 0
    outs = [list(r.async_stream.tokens) for r in reqs]
    assert all(o == outs[0] for o in outs)
    # everything reclaimable after completion (cached pages count as free)
    assert eng.cache.allocator.num_free() == free0


def test_lookup_rejects_hash_collisions():
    """Sharing must verify token content + parent linkage, never the
    chain hash alone: a collision (accidental or crafted) attaching
    another prompt's KV pages would be a cross-request leak (review
    finding; the vLLM hash-sharing lesson)."""
    from chitu_tpu.kvcache.paged import PrefixCachingAllocator

    a = PrefixCachingAllocator(num_pages=8, page_size=4)
    victim = list(range(100, 105))  # one full page + tail
    assert a.lookup("victim", victim) == 0
    assert a.ensure("victim", len(victim) + 1)
    a.register("victim", victim)
    a.free("victim")

    # forge a colliding chain entry: same hash, different tokens
    h = a._chain(victim)[0]
    attacker = [1, 2, 3, 4, 9]
    a.entries[a._chain(attacker)[0]] = a.entries[h]  # simulate collision
    assert a.lookup("attacker", attacker) == 0  # content check rejects

    # linkage check: page 2's entry must chain from the attached page 1
    long_prompt = list(range(200, 210))  # two full pages + tail
    assert a.ensure("p", len(long_prompt) + 1)
    a.register("p", long_prompt)
    a.free("p")
    chain = a._chain(long_prompt)
    pg, toks, parent = a.entries[chain[1]]
    a.entries[chain[1]] = (pg, toks, 999)  # corrupt the parent link
    got = a.lookup("q", long_prompt)
    assert got == 4  # only page 1 attaches; broken link stops the walk
    a.free("q")


def test_deferred_request_still_hits_cache_on_retry():
    """A request deferred by pool exhaustion must still get its prefix
    hit when retried after a twin published (review finding: the
    idempotency guard used to be tripped by the failed ensure)."""
    from chitu_tpu.kvcache.paged import PrefixCachingAllocator

    a = PrefixCachingAllocator(num_pages=3, page_size=4)
    prompt = list(range(50, 59))  # two full pages + tail -> needs 3 pages
    # twin takes the whole pool
    assert a.lookup("twin", prompt) == 0
    assert a.ensure("twin", len(prompt) + 1)
    # cold request: lookup misses, ensure fails -> deferred
    assert a.lookup("cold", prompt) == 0
    assert not a.ensure("cold", len(prompt) + 1)
    # twin finishes and publishes
    a.register("twin", prompt)
    a.free("twin")
    # retry: the full-page prefix now attaches
    assert a.lookup("cold", prompt) == 8


def test_prefix_hits_stay_on_packed_prefill(engines, monkeypatch):
    """Prefix-cache hits must prefill their TAIL through the PACKED slab
    (mid-context segments, absolute positions) — the chunked per-request
    fallback measured 22x slower at the shared-prefix serving workload
    (round-4 finding). Tokens still match the uncached engine."""
    base, eng = engines
    p = SampleParams(temperature=0.0, max_new_tokens=5)
    shared = _prompt_tokens(3, 32)  # two full pages of shared prefix

    def burst(e):
        reqs = [
            e.submit("", p, prompt_tokens=shared + _prompt_tokens(9 + i, 7))
            for i in range(3)
        ]
        e.run_until_complete()
        return [list(r.async_stream.tokens) for r in reqs]

    want = burst(base)
    burst(eng)  # cold for THIS prompt: publishes the shared pages
    hits0 = eng.cache.allocator.hits  # fixture is module-scoped

    calls = []
    orig = type(eng.executor)._prefill_one

    def spy(self, t, tokens=None):
        calls.append(t.task_id)
        return orig(self, t, tokens)

    monkeypatch.setattr(type(eng.executor), "_prefill_one", spy)
    got = burst(eng)  # warm: every row hits the shared prefix
    assert eng.cache.allocator.hits > hits0
    assert not calls, (
        f"prefix-hit rows left the packed prefill path: {calls}"
    )
    assert got == want
