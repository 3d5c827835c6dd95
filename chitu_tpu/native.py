"""ctypes bindings for the native host runtime (csrc/hostops.cpp).

The reference builds its native layer as a CUDAExtension pybind module
(reference: csrc/binding.cpp, setup.py:17-29); here the host-side pieces
(page allocator + block-table assembly) are a plain C ABI library built
lazily with g++ and loaded through ctypes — no build-time dependency.
Falls back to the pure-python allocator when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

from chitu_tpu.utils import get_logger

logger = get_logger()

_CSRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libchituhost.so")
_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        src = os.path.join(_CSRC, "hostops.cpp")
        try:
            stale = os.path.exists(_LIB_PATH) and os.path.exists(
                src
            ) and os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
            need_build = stale or not os.path.exists(_LIB_PATH)
        except OSError:
            need_build = not os.path.exists(_LIB_PATH)
        if need_build:
            if not os.path.exists(src):
                logger.warning("native hostops source missing; python fallback")
                _build_failed = True
                return None
            try:
                # cross-PROCESS lock: concurrent engines (dp workers, test
                # shards) must not run make into the same .so while a
                # third dlopens a half-written file
                import fcntl

                with open(os.path.join(_CSRC, ".build.lock"), "w") as lk:
                    fcntl.flock(lk, fcntl.LOCK_EX)
                    try:
                        if not os.path.exists(_LIB_PATH) or (
                            os.path.exists(src)
                            and os.path.getmtime(_LIB_PATH)
                            < os.path.getmtime(src)
                        ):
                            subprocess.run(
                                ["make", "-C", _CSRC, "-B", "libchituhost.so"],
                                check=True,
                                capture_output=True,
                                timeout=120,
                            )
                    finally:
                        fcntl.flock(lk, fcntl.LOCK_UN)
            except (subprocess.SubprocessError, OSError) as e:
                logger.warning("native hostops build failed: %s", e)
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning("native hostops load failed: %s", e)
            _build_failed = True
            return None
        lib.chitu_alloc_create.restype = ctypes.c_void_p
        lib.chitu_alloc_create.argtypes = [ctypes.c_int32] * 3
        lib.chitu_alloc_destroy.argtypes = [ctypes.c_void_p]
        lib.chitu_alloc_num_free.restype = ctypes.c_int32
        lib.chitu_alloc_num_free.argtypes = [ctypes.c_void_p]
        lib.chitu_alloc_ensure.restype = ctypes.c_int32
        lib.chitu_alloc_ensure.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.chitu_alloc_release.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.chitu_alloc_pages_of.restype = ctypes.c_int32
        lib.chitu_alloc_pages_of.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.chitu_alloc_block_table.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativePageAllocator:
    """Slot-keyed page allocator backed by the C++ library.

    Same contract as kvcache.PageAllocator but keyed by integer slot ids
    (the executor's residency slots) instead of request-id strings.
    """

    def __init__(self, num_pages: int, page_size: int, max_slots: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native hostops unavailable")
        self._lib = lib
        self._h = lib.chitu_alloc_create(num_pages, page_size, max_slots)
        self.num_pages = num_pages
        self.page_size = page_size
        self.max_slots = max_slots

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.chitu_alloc_destroy(h)
            self._h = None

    def num_free(self) -> int:
        return self._lib.chitu_alloc_num_free(self._h)

    def ensure(self, slot: int, total_tokens: int) -> bool:
        return bool(self._lib.chitu_alloc_ensure(self._h, slot, total_tokens))

    def release(self, slot: int):
        self._lib.chitu_alloc_release(self._h, slot)

    def pages_of(self, slot: int) -> int:
        return self._lib.chitu_alloc_pages_of(self._h, slot)

    def block_table(self, slots: Sequence[int], max_pages: int) -> np.ndarray:
        slots_arr = np.asarray(slots, dtype=np.int32)
        out = np.empty((len(slots_arr), max_pages), dtype=np.int32)
        self._lib.chitu_alloc_block_table(
            self._h,
            slots_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(slots_arr),
            max_pages,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out
