"""Python face of the native mmap hashmaps.

Reference API: pecos/utils/mmap_hashmap_util.py:22-371 (MmapHashmap wrapper
with str2int / int2int maps, batch getters, w/r/r_lazy open modes) over the
C symbols in mmap_hashmap.hpp; here over pecos_tpu/core/mmap_store.cpp.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Sequence

import numpy as np

from pecos_tpu.core import build_core

_lib = None


def _load_lib():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(build_core())
        c = _lib
        u64, i64, vp, cp = ctypes.c_uint64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_char_p
        c.mhm_i2i_new.restype = vp
        c.mhm_i2i_new.argtypes = [u64]
        c.mhm_i2i_free.argtypes = [vp]
        c.mhm_i2i_insert.argtypes = [vp, u64, i64]
        c.mhm_i2i_get.restype = i64
        c.mhm_i2i_get.argtypes = [vp, u64, i64]
        c.mhm_i2i_size.restype = u64
        c.mhm_i2i_size.argtypes = [vp]
        c.mhm_i2i_batch_get.argtypes = [vp, u64, ctypes.POINTER(u64), i64, ctypes.POINTER(i64), ctypes.c_int]
        c.mhm_i2i_save.restype = ctypes.c_int
        c.mhm_i2i_save.argtypes = [vp, cp]
        c.mhm_i2i_load.restype = vp
        c.mhm_i2i_load.argtypes = [cp, ctypes.c_int]
        c.mhm_s2i_new.restype = vp
        c.mhm_s2i_new.argtypes = [u64]
        c.mhm_s2i_free.argtypes = [vp]
        c.mhm_s2i_insert.argtypes = [vp, cp, u64, i64]
        c.mhm_s2i_get.restype = i64
        c.mhm_s2i_get.argtypes = [vp, cp, u64, i64]
        c.mhm_s2i_size.restype = u64
        c.mhm_s2i_size.argtypes = [vp]
        c.mhm_s2i_batch_get.argtypes = [
            vp, u64, ctypes.POINTER(cp), ctypes.POINTER(u64), i64, ctypes.POINTER(i64), ctypes.c_int,
        ]
        c.mhm_s2i_save.restype = ctypes.c_int
        c.mhm_s2i_save.argtypes = [vp, cp]
        c.mhm_s2i_load.restype = vp
        c.mhm_s2i_load.argtypes = [cp, ctypes.c_int]
    return _lib


class MmapHashmap(object):
    """str2int or int2int hashmap with w / r / r_lazy open modes."""

    def __init__(self, map_type: str):
        if map_type not in ("str2int", "int2int"):
            raise ValueError(f"unknown map_type {map_type!r}")
        self.map_type = map_type
        self.map = None
        self.mode: Optional[str] = None
        self._lib = _load_lib()

    def open(self, mode: str, map_dir_or_path: str):
        path = map_dir_or_path
        if mode == "w":
            if self.map_type == "int2int":
                self.map = _I2I(self._lib, self._lib.mhm_i2i_new(16))
            else:
                self.map = _S2I(self._lib, self._lib.mhm_s2i_new(16))
            self.map.path = path
        elif mode in ("r", "r_lazy"):
            lazy = 1 if mode == "r_lazy" else 0
            if self.map_type == "int2int":
                ptr = self._lib.mhm_i2i_load(path.encode(), lazy)
                if not ptr:
                    raise IOError(f"cannot load int2int map from {path}")
                self.map = _I2I(self._lib, ptr, writable=False)
            else:
                ptr = self._lib.mhm_s2i_load(path.encode(), lazy)
                if not ptr:
                    raise IOError(f"cannot load str2int map from {path}")
                self.map = _S2I(self._lib, ptr, writable=False)
        else:
            raise ValueError(f"unknown mode {mode!r}")
        self.mode = mode
        return self

    def close(self):
        if self.map is not None and self.mode == "w":
            self.map.save(self.map.path)
        if self.map is not None:
            self.map.free()
            self.map = None


class _I2I:
    def __init__(self, lib, ptr, writable=True):
        self._lib = lib
        self._ptr = ptr
        self.path = None
        self.writable = writable

    def insert(self, key: int, val: int):
        if not self.writable:
            raise RuntimeError("map opened read-only; insert requires mode='w'")
        self._lib.mhm_i2i_insert(self._ptr, key, val)

    def get(self, key: int, default: int = -1) -> int:
        return self._lib.mhm_i2i_get(self._ptr, key, default)

    def __getitem__(self, key: int) -> int:
        return self.get(key)

    def batch_get(self, keys: np.ndarray, default: int = -1, threads: int = -1) -> np.ndarray:
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        out = np.empty(len(keys), np.int64)
        self._lib.mhm_i2i_batch_get(
            self._ptr,
            len(keys),
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            default,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            threads,
        )
        return out

    def size(self) -> int:
        return self._lib.mhm_i2i_size(self._ptr)

    def save(self, path: str):
        if not self.writable:
            raise RuntimeError("map opened read-only; save requires mode='w'")
        if self._lib.mhm_i2i_save(self._ptr, path.encode()) != 0:
            raise IOError(f"cannot save map to {path}")

    def free(self):
        self._lib.mhm_i2i_free(self._ptr)
        self._ptr = None


class _S2I:
    def __init__(self, lib, ptr, writable=True):
        self._lib = lib
        self._ptr = ptr
        self.path = None
        self.writable = writable

    def insert(self, key: bytes, val: int):
        if not self.writable:
            raise RuntimeError("map opened read-only; insert requires mode='w'")
        key = key.encode() if isinstance(key, str) else key
        self._lib.mhm_s2i_insert(self._ptr, key, len(key), val)

    def get(self, key, default: int = -1) -> int:
        key = key.encode() if isinstance(key, str) else key
        return self._lib.mhm_s2i_get(self._ptr, key, len(key), default)

    def __getitem__(self, key) -> int:
        return self.get(key)

    def batch_get(self, keys: Sequence, default: int = -1, threads: int = -1) -> np.ndarray:
        bkeys = [k.encode() if isinstance(k, str) else k for k in keys]
        n = len(bkeys)
        arr = (ctypes.c_char_p * n)(*bkeys)
        lens = np.array([len(k) for k in bkeys], np.uint64)
        out = np.empty(n, np.int64)
        self._lib.mhm_s2i_batch_get(
            self._ptr,
            n,
            arr,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            default,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            threads,
        )
        return out

    def size(self) -> int:
        return self._lib.mhm_s2i_size(self._ptr)

    def save(self, path: str):
        if not self.writable:
            raise RuntimeError("map opened read-only; save requires mode='w'")
        if self._lib.mhm_s2i_save(self._ptr, path.encode()) != 0:
            raise IOError(f"cannot save map to {path}")

    def free(self):
        self._lib.mhm_s2i_free(self._ptr)
        self._ptr = None
