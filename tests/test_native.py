"""Native host runtime (csrc/hostops.cpp): parity with the python
allocator + engine integration."""

import numpy as np
import pytest

from chitu_tpu import native
from chitu_tpu.kvcache import PageAllocator

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native hostops unavailable"
)


def test_native_matches_python_allocator():
    py = PageAllocator(num_pages=16, page_size=8)
    nt = native.NativePageAllocator(16, 8, max_slots=4)
    assert nt.num_free() == py.num_free() == 16

    assert py.ensure("r0", 20) and nt.ensure(0, 20)
    assert py.ensure("r1", 9) and nt.ensure(1, 9)
    assert nt.num_free() == py.num_free()
    assert nt.pages_of(0) == len(py.req_pages["r0"]) == 3

    bt_py = py.block_table(["r0", "r1", "missing"], 5)
    bt_nt = nt.block_table([0, 1, -1], 5)
    # same shape/padding; page ids may differ in order of assignment
    assert bt_py.shape == bt_nt.shape
    assert ((bt_nt >= 0) == (bt_py >= 0)).all()

    py.free("r0")
    nt.release(0)
    assert nt.num_free() == py.num_free() == 16 - 2


def test_native_exhaustion():
    nt = native.NativePageAllocator(2, 8, max_slots=2)
    assert nt.ensure(0, 16)
    assert not nt.ensure(1, 8)
    nt.release(0)
    assert nt.ensure(1, 8)


def test_engine_uses_native_allocator():
    from chitu_tpu.engine import Engine
    from chitu_tpu.kvcache import NativeBackedPageAllocator
    from chitu_tpu.task import SampleParams
    import sys
    sys.path.insert(0, "tests")
    from helpers import tiny_cfg

    eng = Engine(tiny_cfg(**{"infer.stop_with_eos": False}))
    assert isinstance(eng.cache.allocator, NativeBackedPageAllocator)
    reqs = [
        eng.submit(f"native {i}", SampleParams(temperature=0.0, max_new_tokens=4))
        for i in range(6)
    ]
    eng.run_until_complete()
    assert all(len(r.async_stream.tokens) == 4 for r in reqs)
    assert eng.cache.allocator.num_free() == eng.cache.num_pages
