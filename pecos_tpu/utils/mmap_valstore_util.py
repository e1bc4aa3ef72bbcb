"""Python face of the native mmap value stores.

Reference API: pecos/utils/mmap_valstore_util.py:22-392 (Float32Store row/col
batch gather; BytesStore variable-length strings with truncation) over
pecos/core/utils/mmap_valstore.hpp; here over pecos_tpu/core/mmap_store.cpp.
"""

from __future__ import annotations

import ctypes
from typing import Sequence, Tuple

import numpy as np

from pecos_tpu.core import build_core

_lib = None


def _load_lib():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(build_core())
        c = _lib
        u64, vp, cp = ctypes.c_uint64, ctypes.c_void_p, ctypes.c_char_p
        fp = ctypes.POINTER(ctypes.c_float)
        up = ctypes.POINTER(u64)
        c.mvs_f32_new.restype = vp
        c.mvs_f32_new.argtypes = [u64, u64, fp]
        c.mvs_f32_free.argtypes = [vp]
        c.mvs_f32_rows.restype = u64
        c.mvs_f32_rows.argtypes = [vp]
        c.mvs_f32_cols.restype = u64
        c.mvs_f32_cols.argtypes = [vp]
        c.mvs_f32_batch_get.argtypes = [vp, u64, up, up, fp, ctypes.c_int]
        c.mvs_f32_get_rows.argtypes = [vp, u64, up, fp, ctypes.c_int]
        c.mvs_f32_save.restype = ctypes.c_int
        c.mvs_f32_save.argtypes = [vp, cp]
        c.mvs_f32_load.restype = vp
        c.mvs_f32_load.argtypes = [cp, ctypes.c_int]
        c.mvs_bytes_new.restype = vp
        c.mvs_bytes_new.argtypes = [u64, ctypes.POINTER(cp), up]
        c.mvs_bytes_free.argtypes = [vp]
        c.mvs_bytes_rows.restype = u64
        c.mvs_bytes_rows.argtypes = [vp]
        c.mvs_bytes_batch_get.argtypes = [vp, u64, up, cp, u64, up, ctypes.c_int]
        c.mvs_bytes_save.restype = ctypes.c_int
        c.mvs_bytes_save.argtypes = [vp, cp]
        c.mvs_bytes_load.restype = vp
        c.mvs_bytes_load.argtypes = [cp, ctypes.c_int]
    return _lib


class Float32Store(object):
    """2-D float32 store with mmap save/load and threaded batch gathers."""

    def __init__(self, ptr=None):
        self._lib = _load_lib()
        self._ptr = ptr

    @classmethod
    def from_array(cls, arr: np.ndarray) -> "Float32Store":
        arr = np.ascontiguousarray(arr, np.float32)
        lib = _load_lib()
        ptr = lib.mvs_f32_new(
            arr.shape[0], arr.shape[1], arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return cls(ptr)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self._lib.mvs_f32_rows(self._ptr), self._lib.mvs_f32_cols(self._ptr))

    def batch_get(self, rows: np.ndarray, cols: np.ndarray, threads: int = -1) -> np.ndarray:
        rows = np.ascontiguousarray(rows, np.uint64)
        cols = np.ascontiguousarray(cols, np.uint64)
        out = np.empty(len(rows), np.float32)
        self._lib.mvs_f32_batch_get(
            self._ptr,
            len(rows),
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            threads,
        )
        return out

    def get_rows(self, rows: np.ndarray, threads: int = -1) -> np.ndarray:
        rows = np.ascontiguousarray(rows, np.uint64)
        cols = self.shape[1]
        out = np.empty((len(rows), cols), np.float32)
        self._lib.mvs_f32_get_rows(
            self._ptr,
            len(rows),
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            threads,
        )
        return out

    def save(self, path: str):
        if self._lib.mvs_f32_save(self._ptr, path.encode()) != 0:
            raise IOError(f"cannot save Float32Store to {path}")

    @classmethod
    def load(cls, path: str, lazy: bool = False) -> "Float32Store":
        lib = _load_lib()
        ptr = lib.mvs_f32_load(path.encode(), 1 if lazy else 0)
        if not ptr:
            raise IOError(f"cannot load Float32Store from {path}")
        return cls(ptr)

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.mvs_f32_free(self._ptr)


class BytesStore(object):
    """Variable-length byte-string store with truncating batch reads."""

    def __init__(self, ptr=None):
        self._lib = _load_lib()
        self._ptr = ptr

    @classmethod
    def from_list(cls, strs: Sequence) -> "BytesStore":
        bstrs = [s.encode() if isinstance(s, str) else s for s in strs]
        lib = _load_lib()
        arr = (ctypes.c_char_p * len(bstrs))(*bstrs)
        lens = np.array([len(s) for s in bstrs], np.uint64)
        ptr = lib.mvs_bytes_new(
            len(bstrs), arr, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
        )
        return cls(ptr)

    @property
    def nr_rows(self) -> int:
        return self._lib.mvs_bytes_rows(self._ptr)

    def batch_get(self, rows: np.ndarray, trunc_len: int = 256, threads: int = -1):
        rows = np.ascontiguousarray(rows, np.uint64)
        buf = ctypes.create_string_buffer(len(rows) * trunc_len)
        out_lens = np.empty(len(rows), np.uint64)
        self._lib.mvs_bytes_batch_get(
            self._ptr,
            len(rows),
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            buf,
            trunc_len,
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            threads,
        )
        raw = buf.raw
        return [
            raw[i * trunc_len : i * trunc_len + int(out_lens[i])] for i in range(len(rows))
        ]

    def save(self, path: str):
        if self._lib.mvs_bytes_save(self._ptr, path.encode()) != 0:
            raise IOError(f"cannot save BytesStore to {path}")

    @classmethod
    def load(cls, path: str, lazy: bool = False) -> "BytesStore":
        lib = _load_lib()
        ptr = lib.mvs_bytes_load(path.encode(), 1 if lazy else 0)
        if not ptr:
            raise IOError(f"cannot load BytesStore from {path}")
        return cls(ptr)

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.mvs_bytes_free(self._ptr)
