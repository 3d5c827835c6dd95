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
