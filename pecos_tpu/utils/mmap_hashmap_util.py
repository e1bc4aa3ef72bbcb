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
        c.mhm_fs2i_new.restype = vp
        c.mhm_fs2i_new.argtypes = [u64, u64]
        c.mhm_fs2i_free.argtypes = [vp]
        c.mhm_fs2i_insert.argtypes = [vp, cp, i64]
        c.mhm_fs2i_get.restype = i64
        c.mhm_fs2i_get.argtypes = [vp, cp, i64]
        c.mhm_fs2i_size.restype = u64
        c.mhm_fs2i_size.argtypes = [vp]
        c.mhm_fs2i_key_len.restype = u64
        c.mhm_fs2i_key_len.argtypes = [vp]
        c.mhm_fs2i_batch_get.argtypes = [
            vp, u64, ctypes.c_char_p, i64, ctypes.POINTER(i64), ctypes.c_int,
        ]
        c.mhm_fs2i_save.restype = ctypes.c_int
        c.mhm_fs2i_save.argtypes = [vp, cp]
        c.mhm_fs2i_load.restype = vp
        c.mhm_fs2i_load.argtypes = [cp, ctypes.c_int]
    return _lib


class MmapHashmap(object):
    """str2int / fstr2int / int2int hashmap with w / r / r_lazy open modes.

    ``fstr2int`` is the fixed-length-key variant (reference:
    pecos/core/utils/mmap_hashmap.hpp:234,443): every key has exactly
    ``key_len`` bytes, stored inline with the buckets — lookups skip the
    (offset, len) blob indirection and batch gets take one packed buffer.
    """

    def __init__(self, map_type: str, key_len: Optional[int] = None):
        if map_type not in ("str2int", "int2int", "fstr2int"):
            raise ValueError(f"unknown map_type {map_type!r}")
        self.map_type = map_type
        self.key_len = key_len
        self.map = None
        self.mode: Optional[str] = None
        self._lib = _load_lib()

    def open(self, mode: str, map_dir_or_path: str):
        path = map_dir_or_path
        if mode == "w":
            if self.map_type == "int2int":
                self.map = _I2I(self._lib, self._lib.mhm_i2i_new(16))
            elif self.map_type == "fstr2int":
                if not self.key_len:
                    raise ValueError("fstr2int mode='w' requires key_len")
                self.map = _FS2I(
                    self._lib, self._lib.mhm_fs2i_new(16, self.key_len), self.key_len
                )
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
            elif self.map_type == "fstr2int":
                ptr = self._lib.mhm_fs2i_load(path.encode(), lazy)
                if not ptr:
                    raise IOError(f"cannot load fstr2int map from {path}")
                klen = self._lib.mhm_fs2i_key_len(ptr)
                self.map = _FS2I(self._lib, ptr, klen, writable=False)
                self.key_len = klen
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


class _FS2I:
    """Fixed-length-key str2int map: keys are exactly key_len bytes each."""

    def __init__(self, lib, ptr, key_len, writable=True):
        self._lib = lib
        self._ptr = ptr
        self.key_len = int(key_len)
        self.path = None
        self.writable = writable

    def _check(self, key) -> bytes:
        key = key.encode() if isinstance(key, str) else bytes(key)
        if len(key) != self.key_len:
            raise ValueError(
                f"fstr2int key must be exactly {self.key_len} bytes, got {len(key)}"
            )
        return key

    def insert(self, key, val: int):
        if not self.writable:
            raise RuntimeError("map opened read-only; insert requires mode='w'")
        self._lib.mhm_fs2i_insert(self._ptr, self._check(key), val)

    def get(self, key, default: int = -1) -> int:
        return self._lib.mhm_fs2i_get(self._ptr, self._check(key), default)

    def __getitem__(self, key) -> int:
        return self.get(key)

    def batch_get(self, keys, default: int = -1, threads: int = -1) -> np.ndarray:
        """keys: sequence of key_len-byte keys, or one packed bytes buffer."""
        if isinstance(keys, (bytes, bytearray)):
            packed = bytes(keys)
            if len(packed) % self.key_len:
                raise ValueError("packed buffer length is not a multiple of key_len")
            n = len(packed) // self.key_len
        else:
            bkeys = [self._check(k) for k in keys]
            packed = b"".join(bkeys)
            n = len(bkeys)
        out = np.empty(n, np.int64)
        self._lib.mhm_fs2i_batch_get(
            self._ptr,
            n,
            packed,
            default,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            threads,
        )
        return out

    def size(self) -> int:
        return self._lib.mhm_fs2i_size(self._ptr)

    def save(self, path: str):
        if not self.writable:
            raise RuntimeError("map opened read-only; save requires mode='w'")
        if self._lib.mhm_fs2i_save(self._ptr, path.encode()) != 0:
            raise IOError(f"cannot save map to {path}")

    def free(self):
        self._lib.mhm_fs2i_free(self._ptr)
        self._ptr = None
