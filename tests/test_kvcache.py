import numpy as np

from chitu_tpu.kvcache import PageAllocator, SlotAllocator


def test_page_allocator_grow_and_free():
    a = PageAllocator(num_pages=8, page_size=16)
    assert a.ensure("r1", 20)  # 2 pages
    assert len(a.req_pages["r1"]) == 2
    assert a.ensure("r1", 33)  # 3 pages
    assert len(a.req_pages["r1"]) == 3
    assert a.num_free() == 5
    a.free("r1")
    assert a.num_free() == 8


def test_page_allocator_exhaustion():
    a = PageAllocator(num_pages=2, page_size=16)
    assert a.ensure("r1", 32)
    assert not a.ensure("r2", 1)
    a.free("r1")
    assert a.ensure("r2", 1)


def test_block_table_padding():
    a = PageAllocator(num_pages=8, page_size=16)
    a.ensure("r1", 40)
    bt = a.block_table(["r1", "missing"], 5)
    assert bt.shape == (2, 5)
    assert (bt[0, :3] >= 0).all() and (bt[0, 3:] == -1).all()
    assert (bt[1] == -1).all()


def test_slot_allocator():
    s = SlotAllocator(2)
    a = s.alloc("r1")
    b = s.alloc("r2")
    assert {a, b} == {0, 1}
    assert s.alloc("r3") is None
    assert s.alloc("r1") == a  # idempotent
    s.release("r1")
    assert s.alloc("r3") == a


def test_dense_cache_type_matches_paged():
    """cache_type=dense (the skew-aware contiguous layout) must produce
    identical tokens to the paged cache."""
    import sys
    sys.path.insert(0, "tests")
    from helpers import tiny_cfg
    from chitu_tpu.engine import Engine
    from chitu_tpu.task import SampleParams

    p = SampleParams(temperature=0.0, max_new_tokens=6)
    paged = Engine(tiny_cfg(**{"infer.stop_with_eos": False}))
    want = paged.generate("dense cache check", p)
    dense = Engine(
        tiny_cfg(**{"infer.stop_with_eos": False, "infer.cache_type": "dense"})
    )
    assert dense.cache.num_pages == dense.cfg.infer.max_reqs
    assert dense.cache.page_size == dense.cfg.infer.max_seq_len
    got = dense.generate("dense cache check", p)
    assert got == want


def test_nop_cache_type_runs():
    import sys
    sys.path.insert(0, "tests")
    from helpers import tiny_cfg
    from chitu_tpu.engine import Engine
    from chitu_tpu.task import SampleParams

    eng = Engine(
        tiny_cfg(**{"infer.stop_with_eos": False, "infer.cache_type": "nop"})
    )
    toks = eng.generate("nop", SampleParams(temperature=0.0, max_new_tokens=4))
    assert len(toks) == 4


def test_ensure_rolls_back_on_exhaustion():
    """A failed ensure must not hoard pages: the deferred request keeps
    nothing and the free count is unchanged (review finding: hoarded
    pages starved running decodes into preemption)."""
    a = PageAllocator(num_pages=4, page_size=16)
    assert a.ensure("resident", 3 * 16)
    free0 = a.num_free()
    assert not a.ensure("big", 3 * 16)  # needs 3, only 1 free
    assert a.num_free() == free0
    assert "big" not in a.req_pages
    # a resident request's failed GROW keeps its existing pages
    assert not a.ensure("resident", 6 * 16)
    assert len(a.req_pages["resident"]) == 3
    assert a.num_free() == free0


def test_native_handles_released_on_deferred():
    """Deferred requests must not retain native handles: sustained
    overload would exhaust the handle pool and block admission even with
    pages free (review finding)."""
    import pytest

    from chitu_tpu.kvcache.paged import NativeBackedPageAllocator

    try:
        a = NativeBackedPageAllocator(num_pages=4, page_size=16, max_slots=2)
    except Exception:
        pytest.skip("native allocator unavailable")
    assert a.ensure("r0", 4 * 16)  # takes the whole pool
    for i in range(5):  # would exhaust max_slots=2 without the rollback
        assert not a.ensure(f"defer{i}", 16)
    a.free("r0")
    assert a.ensure("late", 16)  # handles still available
