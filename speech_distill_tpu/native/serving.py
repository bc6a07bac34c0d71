"""ctypes bindings for the native serving runtime (serving_runtime.cc).

Drop-in twins of the Python ``PagePool`` / ``PrefixRegistry`` in
infer/paged.py — the vLLM block-manager role, in C++. Build-on-first-use
like the audio kernels; ``SDT_NATIVE=0`` forces the Python fallbacks.
Tests assert behavioral identity against the Python twins.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "serving_runtime.cc")
_LIB_PATH = os.path.join(_HERE, "libsdt_serving.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False

_i32p = ctypes.POINTER(ctypes.c_int32)


def _build() -> bool:
    try:
        if (os.path.exists(_LIB_PATH)
                and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
            return True
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB_PATH + ".tmp"],
            check=True, capture_output=True)
        os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SDT_NATIVE", "1") == "0":
        return None
    if not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64, i32 = ctypes.c_int64, ctypes.c_int32
    lib.sdt_pool_new.restype = i64
    lib.sdt_pool_new.argtypes = [i32]
    lib.sdt_pool_delete.argtypes = [i64]
    lib.sdt_pool_free_pages.restype = i32
    lib.sdt_pool_free_pages.argtypes = [i64]
    lib.sdt_pool_alloc.restype = i32
    lib.sdt_pool_alloc.argtypes = [i64, i32, _i32p]
    lib.sdt_pool_share.argtypes = [i64, _i32p, i32]
    lib.sdt_pool_release.argtypes = [i64, _i32p, i32]
    lib.sdt_pool_refcount.restype = i32
    lib.sdt_pool_refcount.argtypes = [i64, i32]
    lib.sdt_reg_new.restype = i64
    lib.sdt_reg_delete.argtypes = [i64]
    lib.sdt_reg_size.restype = i64
    lib.sdt_reg_size.argtypes = [i64]
    lib.sdt_reg_match.restype = i32
    lib.sdt_reg_match.argtypes = [i64, _i32p, i64, i32, i32, _i32p]
    lib.sdt_reg_register.restype = i32
    lib.sdt_reg_register.argtypes = [i64, i64, _i32p, i64, _i32p, i32]
    lib.sdt_reg_evict_one.restype = i32
    lib.sdt_reg_evict_one.argtypes = [i64, i64]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _as_i32(seq: Sequence[int]) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(seq, dtype=np.int32))


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_i32p)


class NativePagePool:
    """C++ twin of infer/paged.PagePool (same API)."""

    def __init__(self, num_pages: int):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native serving runtime unavailable")
        self._h = self._lib.sdt_pool_new(num_pages)

    def __del__(self):
        try:
            self._lib.sdt_pool_delete(self._h)
        except Exception:
            pass

    @property
    def free_pages(self) -> int:
        return int(self._lib.sdt_pool_free_pages(self._h))

    def alloc(self, n: int) -> Optional[List[int]]:
        out = np.empty(max(n, 1), np.int32)
        ok = self._lib.sdt_pool_alloc(self._h, n, _ptr(out))
        return out[:n].tolist() if ok else None

    def share(self, pages: Sequence[int]) -> None:
        a = _as_i32(pages)
        self._lib.sdt_pool_share(self._h, _ptr(a), len(a))

    def free(self, pages: Sequence[int]) -> None:
        a = _as_i32(pages)
        self._lib.sdt_pool_release(self._h, _ptr(a), len(a))

    def refcount(self, p: int) -> int:
        return int(self._lib.sdt_pool_refcount(self._h, p))


class NativePrefixRegistry:
    """C++ twin of infer/paged.PrefixRegistry: exact-token prefix TRIE.

    Same semantics (exact chunk tokens — no hash aliasing; per-hit LRU
    refresh; tombstoned eviction leaves deeper entries unreachable, like
    the Python flat map whose match stops at the first missing key), but
    match/register walk O(n) tokens instead of hashing O(n^2/ps)."""

    def __init__(self):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native serving runtime unavailable")
        self._h = self._lib.sdt_reg_new()

    def __del__(self):
        try:
            self._lib.sdt_reg_delete(self._h)
        except Exception:
            pass

    def __len__(self) -> int:
        return int(self._lib.sdt_reg_size(self._h))

    def match(self, ids: Sequence[int], ps: int,
              max_pages: int) -> List[int]:
        a = _as_i32(ids)
        out = np.empty(max(max_pages, 1), np.int32)
        n = self._lib.sdt_reg_match(self._h, _ptr(a), len(a), ps,
                                    max_pages, _ptr(out))
        return out[:n].tolist()

    def register(self, ids: Sequence[int], stream_pages: Sequence[int],
                 ps: int, pool: NativePagePool) -> None:
        a = _as_i32(ids)
        sp = _as_i32(stream_pages)
        self._lib.sdt_reg_register(self._h, pool._h, _ptr(a), len(a),
                                   _ptr(sp), ps)

    def evict_one(self, pool: NativePagePool) -> bool:
        return bool(self._lib.sdt_reg_evict_one(self._h, pool._h))

    def alloc(self, pool: NativePagePool, n: int) -> Optional[List[int]]:
        """pool.alloc with LRU cache eviction under pressure (twin of
        PrefixRegistry.alloc)."""
        while True:
            got = pool.alloc(n)
            if got is not None or not self.evict_one(pool):
                return got
