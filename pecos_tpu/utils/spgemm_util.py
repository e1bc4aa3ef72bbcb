"""Native parallel SpGEMM face: Z = Y^T . X (PIFA hot product).

Reference counterpart: clib.sparse_matmul over spmm_mat_t
(pecos/core/utils/matrix.hpp:740, pecos/core/base.py:1460-1534). Falls back
to scipy when the native core is unavailable.
"""

from __future__ import annotations

import ctypes

import numpy as np
import scipy.sparse as smat

_lib = None
_ok = True


def _load():
    global _lib, _ok
    if _lib is None and _ok:
        try:
            from pecos_tpu.core import build_core

            lib = ctypes.CDLL(build_core())
            i64, i32, f32 = (
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
            )
            lib.spgemm_atb.restype = ctypes.c_void_p
            lib.spgemm_atb.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                i64, i32, f32, i64, i32, f32, ctypes.c_int,
            ]
            lib.spgemm_nnz.restype = ctypes.c_int64
            lib.spgemm_nnz.argtypes = [ctypes.c_void_p]
            lib.spgemm_fill.argtypes = [ctypes.c_void_p, i64, i32, f32]
            lib.spgemm_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _ok = False
    return _lib


def spgemm_atb(Y: smat.spmatrix, X: smat.spmatrix, threads: int = -1) -> smat.csr_matrix:
    """Z = Y.T @ X as canonical CSR, multithreaded in the native core."""
    lib = _load()
    if lib is None:
        return (Y.T.tocsr() @ X.tocsr()).tocsr()
    Yc = Y.tocsc()
    Xr = X.tocsr()
    N, L = Yc.shape
    D = Xr.shape[1]
    y_indptr = np.ascontiguousarray(Yc.indptr, np.int64)
    y_indices = np.ascontiguousarray(Yc.indices, np.int32)
    y_data = np.ascontiguousarray(Yc.data, np.float32)
    x_indptr = np.ascontiguousarray(Xr.indptr, np.int64)
    x_indices = np.ascontiguousarray(Xr.indices, np.int32)
    x_data = np.ascontiguousarray(Xr.data, np.float32)
    i64, i32, f32 = (
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    )
    h = lib.spgemm_atb(
        N, L, D,
        y_indptr.ctypes.data_as(i64), y_indices.ctypes.data_as(i32), y_data.ctypes.data_as(f32),
        x_indptr.ctypes.data_as(i64), x_indices.ctypes.data_as(i32), x_data.ctypes.data_as(f32),
        threads,
    )
    try:
        nnz = lib.spgemm_nnz(h)
        indptr = np.zeros(L + 1, np.int64)
        indices = np.zeros(nnz, np.int32)
        data = np.zeros(nnz, np.float32)
        lib.spgemm_fill(
            h,
            indptr.ctypes.data_as(i64),
            indices.ctypes.data_as(i32),
            data.ctypes.data_as(f32),
        )
    finally:
        lib.spgemm_free(h)
    return smat.csr_matrix((data, indices, indptr), shape=(L, D))
