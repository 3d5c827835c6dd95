"""Streaming checkpoint readers: file -> host slice -> device shard.

The round-2 loaders materialized the full parameter tree (host RAM or
device 0) before sharding — impossible for DeepSeek-R1-671B (~671 GB)
through one 16 GB device. The reference's production answer is per-rank
pre-sharded files loaded straight into each rank
(reference: chitu/backend.py:415-481, script/preprocess_and_save.py).

The single-controller JAX equivalent built here: every leaf becomes a
*lazy reader* (mmap-backed safetensors slice, or a virtual stack of such
slices), and `shard_params_streaming` materializes each device's shard
directly from the reader — per-device bytes = shard bytes, host transient
= one shard, for any mesh. This also subsumes the reference's per-rank
files: a host in a multi-host run only ever reads the byte ranges of its
addressable shards.

Readers implement the minimal protocol `place_streaming` needs:
`.shape`, `.dtype`, and `__getitem__(tuple_of_slices) -> np.ndarray`.
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

try:  # ml_dtypes ships with jax
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
    _F8E4M3 = np.dtype(ml_dtypes.float8_e4m3fn)
except ImportError:  # pragma: no cover
    _BF16 = None
    _F8E4M3 = None

# safetensors stores bf16/fp8 natively; numpy-framework reads need a view
_VIEW_DTYPES = {"bfloat16": ("uint16", _BF16), "float8_e4m3fn": ("uint8", _F8E4M3)}


def np_view_dtype(name: str):
    """numpy dtype for a logical dtype name, via ml_dtypes when numpy
    lacks it (bf16 / fp8)."""
    if name in _VIEW_DTYPES:
        return _VIEW_DTYPES[name][1]
    return np.dtype(name)


# safetensors' numpy framework cannot READ dtypes numpy lacks (native
# fp8 checkpoints — DeepSeek-V3/R1 raw HF dumps): header metadata loads
# fine but `slice[...]` raises. These route through a raw mmap of the
# file: the safetensors layout is an 8-byte little-endian header length,
# a JSON header mapping name -> {dtype, shape, data_offsets}, then the
# data section — so a lane-typed numpy memmap view gives lazy slicing
# for ANY dtype (reference loads these via torch, chitu/backend.py:371-393).
_RAW_ONLY_DTYPES = {"f8_e4m3", "f8_e5m2"}
_ST_LANES = {"F8_E4M3": np.uint8, "F8_E5M2": np.uint8, "BF16": np.uint16}
_RAW_CACHE: Dict[str, Tuple[Tuple[float, int], Dict[str, Any], int, Any]] = {}


def _raw_view(path: str, key: str) -> np.ndarray:
    """Lane-typed (uint8/uint16) memmap view of one tensor inside a
    safetensors file; slicing stays lazy until materialized."""
    st = os.stat(path)
    stamp = (st.st_mtime, st.st_size)
    hit = _RAW_CACHE.get(path)
    if hit is None or hit[0] != stamp:
        with open(path, "rb") as f:
            n = int.from_bytes(f.read(8), "little")
            header = json.loads(f.read(n).decode("utf-8"))
        header.pop("__metadata__", None)
        mm = np.memmap(path, dtype=np.uint8, mode="r")
        _RAW_CACHE[path] = (stamp, header, 8 + n, mm)
        hit = _RAW_CACHE[path]
    _, header, base, mm = hit
    info = header[key]
    lane = _ST_LANES.get(info["dtype"])
    if lane is None:
        raise ValueError(f"no raw lane dtype for {info['dtype']!r} ({key})")
    o0, o1 = info["data_offsets"]
    return mm[base + o0 : base + o1].view(lane).reshape(info["shape"])


def _full_idx(idx, ndim: int) -> Tuple[slice, ...]:
    if idx is Ellipsis:
        return (slice(None),) * ndim
    if not isinstance(idx, tuple):
        idx = (idx,)
    idx = tuple(slice(None) if e is Ellipsis else e for e in idx)
    return idx + (slice(None),) * (ndim - len(idx))


class LazySlice:
    """A lazily-read tensor inside a safetensors file.

    Handles the loader-side presentation transforms without reading the
    tensor: `transpose` (weights stored [out, in], presented [in, out]),
    dtype views (bf16/fp8 stored as integer lanes for numpy framework
    reads), and an optional cast (f32 -> bf16 policy)."""

    def __init__(
        self,
        path: str,
        key: str,
        transpose: bool = False,
        cast_floats_to: Optional[np.dtype] = None,
        logical_dtype: Optional[str] = None,
    ):
        self._path = path
        self._key = key
        self._transpose = transpose
        f = _open_cached(path)
        sl = f.get_slice(key)
        stored_dtype = sl.get_dtype().lower()
        # safetensors dtype names: F32, BF16, F8_E4M3, I8, U16, ...
        canon = {
            "f64": "float64", "f32": "float32", "f16": "float16",
            "bf16": "bfloat16", "f8_e4m3": "float8_e4m3fn",
            "i64": "int64", "i32": "int32", "i16": "int16", "i8": "int8",
            "u8": "uint8", "u16": "uint16", "u32": "uint32",
            "bool": "bool",
        }.get(stored_dtype, stored_dtype)
        if logical_dtype is not None and logical_dtype != canon:
            # file stores integer lanes (preprocessed bf16 -> uint16,
            # fp8 -> uint8); present the logical dtype via a view
            canon = logical_dtype
        self._stored_name = canon
        self._raw = stored_dtype in _RAW_ONLY_DTYPES
        self._view = _VIEW_DTYPES.get(canon)
        shape = tuple(sl.get_shape())
        if transpose:
            if len(shape) != 2:
                raise ValueError(f"transpose needs 2-D, {key} is {shape}")
            shape = (shape[1], shape[0])
        self.shape = shape
        dt = np_view_dtype(canon)
        self._cast = None
        if cast_floats_to is not None and canon in (
            "float64", "float32", "float16",
        ):
            self._cast = np.dtype(cast_floats_to)
            dt = self._cast
        self.dtype = dt

    def __getitem__(self, idx) -> np.ndarray:
        idx = _full_idx(idx, len(self.shape))
        stored_idx = idx
        if self._transpose:
            stored_idx = idx[::-1]
        if self._raw:
            # dtypes numpy can't hold (native fp8): lane-view the mmap
            arr = np.asarray(_raw_view(self._path, self._key)[stored_idx])
        else:
            f = _open_cached(self._path)
            sl = f.get_slice(self._key)
            arr = np.asarray(sl[stored_idx])
        if self._view is not None:
            arr = arr.view(self._view[1])
        if self._transpose:
            arr = arr.T
        if self._cast is not None:
            arr = arr.astype(self._cast)
        return arr


# one mmap per file per process; safetensors handles are cheap but
# repeated safe_open calls re-parse the header. Keyed by (mtime, size)
# so a rewritten dump (re-preprocess into the same dir) is re-opened
# instead of served from a stale mmap whose offsets describe the old
# file.
_OPEN_CACHE: Dict[str, Tuple[Tuple[float, int], Any]] = {}


def _open_cached(path: str):
    st = os.stat(path)
    stamp = (st.st_mtime, st.st_size)
    hit = _OPEN_CACHE.get(path)
    if hit is not None and hit[0] == stamp:
        return hit[1]
    from safetensors import safe_open

    # numpy framework reads raw lanes; bf16/fp8 restore via views
    f = safe_open(path, framework="np")
    _OPEN_CACHE[path] = (stamp, f)
    return f


def clear_open_cache():
    _OPEN_CACHE.clear()


class LazyStack:
    """A virtual stack of readers along new leading axes.

    `items` is a (nested) list of readers with identical inner
    shape/dtype; depth of nesting = number of stacked dims. Slicing the
    leading dims selects items and never touches unselected files — a
    [L, E, Din, F] expert stack sharded over E reads only its expert
    range per device."""

    def __init__(self, items):
        self._items = items
        dims = []
        probe = items
        while isinstance(probe, (list, tuple)):
            dims.append(len(probe))
            probe = probe[0]
        self._stack_dims = tuple(dims)
        self._inner = probe
        self.shape = self._stack_dims + tuple(probe.shape)
        self.dtype = probe.dtype

    def __getitem__(self, idx) -> np.ndarray:
        import itertools

        idx = _full_idx(idx, len(self.shape))
        k = len(self._stack_dims)
        lead, inner = idx[:k], idx[k:]
        sel = [
            list(range(*s.indices(self._stack_dims[d])))
            for d, s in enumerate(lead)
        ]
        out = None
        for pos in itertools.product(*[range(len(r)) for r in sel]):
            item = self._items
            for d, p in enumerate(pos):
                item = item[sel[d][p]]
            piece = np.asarray(item[inner])
            if out is None:
                out = np.empty(
                    tuple(len(r) for r in sel) + piece.shape, self.dtype
                )
            out[pos] = piece
        if out is None:  # empty selection
            probe = self._inner[inner]
            out = np.empty(
                tuple(len(r) for r in sel) + probe.shape, self.dtype
            )
        return out


class LazyConcat:
    """A virtual concatenation of readers along one axis (merged qkv /
    gate_up leaves assembled per-shard at read time)."""

    def __init__(self, parts: Sequence[Any], axis: int):
        self._parts = list(parts)
        ndim = len(parts[0].shape)
        self._axis = axis % ndim
        sizes = [p.shape[self._axis] for p in parts]
        self._offsets = np.cumsum([0] + sizes)
        shape = list(parts[0].shape)
        shape[self._axis] = int(self._offsets[-1])
        self.shape = tuple(shape)
        self.dtype = parts[0].dtype

    def __getitem__(self, idx) -> np.ndarray:
        idx = _full_idx(idx, len(self.shape))
        ax = self._axis
        start, stop, step = idx[ax].indices(self.shape[ax])
        if step != 1:
            raise NotImplementedError("strided concat reads")
        pieces = []
        for i, part in enumerate(self._parts):
            lo, hi = int(self._offsets[i]), int(self._offsets[i + 1])
            s, e = max(start, lo), min(stop, hi)
            if s >= e:
                continue
            part_idx = list(idx)
            part_idx[ax] = slice(s - lo, e - lo)
            pieces.append(part[tuple(part_idx)])
        if len(pieces) == 1:
            return pieces[0]
        return np.concatenate(pieces, axis=ax)


class LazyWindow:
    """A contiguous sub-range view of a reader along one axis. The
    rank-major merged-column assembly slices each projection into per-tp
    chunks without reading anything (models/llama.rank_major_merge done
    lazily)."""

    def __init__(self, base, axis: int, start: int, stop: int):
        self._base = base
        self._axis = axis % len(base.shape)
        self._start = start
        shape = list(base.shape)
        shape[self._axis] = stop - start
        self.shape = tuple(shape)
        self.dtype = base.dtype

    def __getitem__(self, idx) -> np.ndarray:
        idx = list(_full_idx(idx, len(self.shape)))
        s = idx[self._axis]
        lo, hi, step = s.indices(self.shape[self._axis])
        if step != 1:
            raise NotImplementedError("strided window reads")
        idx[self._axis] = slice(self._start + lo, self._start + hi)
        return self._base[tuple(idx)]


def lazy_rank_major(parts: Sequence[Any], tp: int):
    """Lazy rank-major merge along the LAST axis: concat over ranks r of
    (part0_chunk_r | part1_chunk_r | ...) — the reader-level twin of
    models/llama.rank_major_merge, so merged projections assemble
    per-shard at READ time and stream straight to their devices."""
    if tp <= 1:
        return LazyConcat(list(parts), axis=-1)
    chunks = []
    for r in range(tp):
        for p in parts:
            w = p.shape[-1] // tp
            chunks.append(LazyWindow(p, -1, r * w, (r + 1) * w))
    return LazyConcat(chunks, axis=-1)


class LazyUnpack4:
    """int32-packed 4-bit reader -> logical nibble values, unpacking only
    the requested slice (VERDICT r4 missing-5: packed AWQ/GPTQ raw
    checkpoints stream like everything else; reference loads them
    eagerly via module installs, chitu/backend.py:321-347).

    `axis`: the logical axis the packing expands 8x (AWQ qweight/qzeros:
    last dim; GPTQ qweight: first dim). `order`: nibble position within
    each int32 word (AWQ interleaved 0,2,4,6,1,3,5,7; GPTQ sequential).
    `bias` is added after unpack (the GPTQ zero-point +1 quirk), and
    `out_dtype` selects int8 (weight nibbles) or float32 (zeros)."""

    def __init__(self, base, axis: int, order, out_dtype=np.int8, bias=0.0):
        self._base = base
        nd = len(base.shape)
        self._axis = axis % nd
        self._order = np.asarray(order, np.uint32)
        self._bias = bias
        shape = list(base.shape)
        shape[self._axis] *= 8
        self.shape = tuple(shape)
        self.dtype = np.dtype(out_dtype)

    def __getitem__(self, idx) -> np.ndarray:
        idx = _full_idx(idx, len(self.shape))
        ax = self._axis
        start, stop, step = idx[ax].indices(self.shape[ax])
        if step != 1:
            raise NotImplementedError("strided packed reads")
        w0, w1 = start // 8, -(-stop // 8)
        src = list(idx)
        src[ax] = slice(w0, w1)
        words = np.moveaxis(
            np.asarray(self._base[tuple(src)]), ax, -1
        ).astype(np.uint32)
        shifts = (self._order * 4).astype(np.uint32)
        out = (words[..., :, None] >> shifts) & 0xF  # [..., W, 8]
        out = out.reshape(*words.shape[:-1], words.shape[-1] * 8)
        lo = start - w0 * 8
        out = np.moveaxis(out[..., lo : lo + (stop - start)], -1, ax)
        out = out.astype(self.dtype)
        if self._bias:
            out = out + self.dtype.type(self._bias)
        return out


class HostArray:
    """Adapter making a plain numpy array satisfy the reader protocol
    (eagerly assembled small leaves ride the same placement path)."""

    def __init__(self, arr: np.ndarray):
        self._arr = np.asarray(arr)
        self.shape = self._arr.shape
        self.dtype = self._arr.dtype

    def __getitem__(self, idx):
        return self._arr[idx]


def reader_index(
    ckpt_dir: str, files: Optional[List[str]] = None
) -> Dict[str, str]:
    """key -> file path. `files` (meta.json's list) restricts the sweep
    to the dump's own files so stale shards from an older generation in
    the same directory cannot shadow fresh keys."""
    out: Dict[str, str] = {}
    if files is None:
        files = sorted(
            f for f in os.listdir(ckpt_dir) if f.endswith(".safetensors")
        )
    if not files:
        raise FileNotFoundError(f"no .safetensors under {ckpt_dir}")
    for fname in files:
        path = os.path.join(ckpt_dir, fname)
        f = _open_cached(path)
        for key in f.keys():
            out[key] = path
    return out
