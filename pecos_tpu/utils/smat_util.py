"""Sparse-matrix toolkit + ranking metrics.

Host-side (numpy/scipy) counterpart of the reference's pecos/utils/smat_util.py
(997 LoC).  Provides save/load, top-k row sorting, stacking, row/col ops, the
CsrEnsembler family and the Metrics (precision/recall@k) object, plus the
padded-format converters that move scipy sparse data into TPU-friendly
fixed-shape arrays (indices+values padded to a static capacity).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
import scipy.sparse as smat

Matrix = Union[np.ndarray, smat.spmatrix]


# ---------------------------------------------------------------------------
# save / load (npz for sparse, npy for dense) — reference smat_util.py:84-152
# ---------------------------------------------------------------------------

def save_matrix(path: str, X: Matrix) -> None:
    """Save dense (npy) or sparse (npz, scipy format) matrix."""
    if isinstance(X, np.ndarray):
        np.save(path if path.endswith(".npy") else path + ".npy", X)
    elif smat.issparse(X):
        if not path.endswith(".npz"):
            path = path + ".npz"
        smat.save_npz(path, X.tocsr() if X.format not in ("csr", "csc", "coo") else X)
    else:
        raise ValueError(f"cannot save matrix of type {type(X)}")


def load_matrix(path: str, dtype=np.float32) -> Matrix:
    """Load a matrix saved by :func:`save_matrix` (also accepts bare .npy/.npz)."""
    if not os.path.exists(path):
        for ext in (".npz", ".npy"):
            if os.path.exists(path + ext):
                path = path + ext
                break
    if path.endswith(".npy"):
        M = np.load(path)
        return M.astype(dtype) if dtype is not None else M
    elif path.endswith(".npz"):
        M = smat.load_npz(path)
        return M.astype(dtype) if dtype is not None else M
    raise ValueError(f"cannot load matrix from {path}")


def load_feature_matrix(path: str, dtype=np.float32) -> Matrix:
    return load_matrix(path, dtype=dtype)


def load_label_matrix(path: str, dtype=np.float32) -> smat.csr_matrix:
    Y = load_matrix(path, dtype=dtype)
    if isinstance(Y, np.ndarray):
        Y = smat.csr_matrix(Y)
    return Y.tocsr()


# ---------------------------------------------------------------------------
# conversions and basic ops
# ---------------------------------------------------------------------------

def dense_to_csr(X: np.ndarray, topk: Optional[int] = None, batch: int = 4096) -> smat.csr_matrix:
    """Convert dense rows to CSR, optionally keeping only the top-k entries per row.

    Reference: smat_util.dense_to_csr.
    """
    X = np.asarray(X)
    if topk is None or topk >= X.shape[1]:
        return smat.csr_matrix(X)
    n, d = X.shape
    blocks = []
    for s in range(0, n, batch):
        xb = X[s : s + batch]
        idx = np.argpartition(-np.abs(xb), topk - 1, axis=1)[:, :topk]
        rows = np.repeat(np.arange(xb.shape[0]), topk)
        cols = idx.ravel()
        vals = xb[rows, cols]
        blocks.append(smat.csr_matrix((vals, (rows, cols)), shape=xb.shape))
    out = smat.vstack(blocks, format="csr")
    out.eliminate_zeros()
    return out


def binarized(X: smat.spmatrix) -> smat.csr_matrix:
    X = X.tocsr(copy=True)
    X.data[:] = 1.0
    return X


def get_row_submatrices(matrices: Sequence[Matrix], row_indices: np.ndarray) -> List[Matrix]:
    """Select the same row subset from several matrices (reference smat_util)."""
    out = []
    for M in matrices:
        if M is None:
            out.append(None)
        else:
            out.append(M[row_indices])
    return out


def csr_rowwise_mul(A: smat.csr_matrix, v: np.ndarray) -> smat.csr_matrix:
    """Multiply row i of A by scalar v[i] without densifying."""
    A = A.tocsr(copy=True)
    A.data *= np.repeat(v, np.diff(A.indptr))
    return A


def normalize(X: Matrix, axis: int = 1, norm: str = "l2", copy: bool = True) -> Matrix:
    """L1/L2/max row (axis=1) or column (axis=0) normalization, dense or sparse."""
    if axis == 0:
        return normalize(X.T, axis=1, norm=norm, copy=copy).T
    if smat.issparse(X):
        X = X.tocsr(copy=copy)
        if norm == "l2":
            sq = X.multiply(X).sum(axis=1)
            nrm = np.sqrt(np.asarray(sq).ravel())
        elif norm == "l1":
            nrm = np.asarray(np.abs(X).sum(axis=1)).ravel()
        elif norm == "max":
            nrm = np.zeros(X.shape[0])
            for i in range(X.shape[0]):
                s, e = X.indptr[i], X.indptr[i + 1]
                nrm[i] = np.abs(X.data[s:e]).max() if e > s else 0.0
        else:
            raise ValueError(norm)
        nrm[nrm == 0] = 1.0
        return csr_rowwise_mul(X, 1.0 / nrm)
    else:
        X = np.array(X, copy=copy)
        if norm == "l2":
            nrm = np.linalg.norm(X, axis=1)
        elif norm == "l1":
            nrm = np.abs(X).sum(axis=1)
        elif norm == "max":
            nrm = np.abs(X).max(axis=1)
        else:
            raise ValueError(norm)
        nrm[nrm == 0] = 1.0
        return X / nrm[:, None]


def append_bias(X: Matrix, bias: float) -> Matrix:
    """Append a constant bias column (reference appends bias feature when bias>0)."""
    if bias <= 0:
        return X
    n = X.shape[0]
    col = np.full((n, 1), bias, dtype=np.float32)
    if smat.issparse(X):
        return smat.hstack([X.tocsr(), smat.csr_matrix(col)], format="csr")
    return np.hstack([X, col])


# ---------------------------------------------------------------------------
# stacking — reference smat_util.py:343-554
# ---------------------------------------------------------------------------

def vstack_csr(mats: Sequence[smat.spmatrix]) -> smat.csr_matrix:
    return smat.vstack([m.tocsr() for m in mats], format="csr")


def hstack_csr(mats: Sequence[Matrix]) -> smat.csr_matrix:
    cols = [smat.csr_matrix(m) if not smat.issparse(m) else m.tocsr() for m in mats]
    return smat.hstack(cols, format="csr")


def hstack_csc(mats: Sequence[smat.spmatrix]) -> smat.csc_matrix:
    return smat.hstack([m.tocsc() for m in mats], format="csc")


def block_diag_csr(mats: Sequence[smat.spmatrix]) -> smat.csr_matrix:
    return smat.block_diag([m.tocsr() for m in mats], format="csr")


def block_diag_csc(mats: Sequence[smat.spmatrix]) -> smat.csc_matrix:
    return smat.block_diag([m.tocsc() for m in mats], format="csc")


# ---------------------------------------------------------------------------
# top-k sorted CSR — reference smat_util.sorted_csr (:256)
# ---------------------------------------------------------------------------

def sorted_csr(A: smat.csr_matrix, only_topk: Optional[int] = None) -> smat.csr_matrix:
    """Return CSR whose row entries are sorted by descending value, truncated
    to top-k. One global (row, -value) lexsort — no per-row Python (evaluating
    millions of prediction rows must not cost more than predicting them)."""
    A = A.tocsr()
    n = A.shape[0]
    row_nnz = np.diff(A.indptr)
    row = np.repeat(np.arange(n), row_nnz)
    # stable lexsort: ties in value keep original column order, matching the
    # previous per-row argsort(-val, kind="stable")
    order = np.lexsort((-A.data, row))
    rank = np.arange(A.nnz) - np.repeat(A.indptr[:-1], row_nnz)
    if only_topk is not None:
        keep = rank < only_topk
        order = order[keep]
        counts = np.minimum(row_nnz, only_topk)
    else:
        counts = row_nnz
    indptr = np.zeros(n + 1, dtype=np.int64)
    indptr[1:] = np.cumsum(counts)
    return smat.csr_matrix(
        (A.data[order], A.indices[order], indptr), shape=A.shape
    )


def topk_csr_from_dense(scores: np.ndarray, only_topk: int) -> smat.csr_matrix:
    """Dense (n, L) score matrix -> CSR keeping top-k per row, sorted descending."""
    n, L = scores.shape
    k = min(only_topk, L)
    idx = np.argpartition(-scores, k - 1, axis=1)[:, :k]
    vals = np.take_along_axis(scores, idx, axis=1)
    order = np.argsort(-vals, axis=1, kind="stable")
    idx = np.take_along_axis(idx, order, axis=1)
    vals = np.take_along_axis(vals, order, axis=1)
    indptr = np.arange(0, (n + 1) * k, k)
    return smat.csr_matrix((vals.ravel(), idx.ravel(), indptr), shape=(n, L))


def csr_from_topk_arrays(
    indices: np.ndarray, values: np.ndarray, num_cols: int, invalid_index: int = -1
) -> smat.csr_matrix:
    """Build CSR from padded (n, k) index/value arrays; entries == invalid_index dropped.

    This is the bridge from the TPU beam-search output (static-shape top-k
    arrays) back to the host CSR world.
    """
    n, k = indices.shape
    mask = indices != invalid_index
    counts = mask.sum(axis=1)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    return smat.csr_matrix(
        (values[mask], indices[mask], indptr), shape=(n, num_cols)
    )


# ---------------------------------------------------------------------------
# padded formats (host <-> device bridge)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PaddedCsr:
    """Row-padded sparse matrix: static shape (n_rows, capacity).

    ``indices[i, j]`` column id (``pad_index`` where padded), ``values`` 0 where
    padded.  This is the canonical on-device query format for sparse features:
    capacity is the max row nnz rounded up to a lane multiple so shapes stay
    static under jit.
    """

    indices: np.ndarray  # (n, cap) int32
    values: np.ndarray  # (n, cap) float32
    shape: Tuple[int, int]
    pad_index: int

    @property
    def capacity(self) -> int:
        return self.indices.shape[1]


def csr_to_padded(
    A: smat.csr_matrix,
    capacity: Optional[int] = None,
    round_to: int = 8,
    pad_index: Optional[int] = None,
) -> PaddedCsr:
    A = A.tocsr()
    nnz_per_row = np.diff(A.indptr)
    max_nnz = int(nnz_per_row.max()) if A.shape[0] else 0
    cap = capacity if capacity is not None else max(round_to, -(-max_nnz // round_to) * round_to)
    if max_nnz > cap:
        raise ValueError(f"capacity {cap} < max row nnz {max_nnz}")
    n = A.shape[0]
    pad = A.shape[1] if pad_index is None else pad_index
    idx = np.full((n, cap), pad, dtype=np.int32)
    val = np.zeros((n, cap), dtype=np.float32)
    rows = np.repeat(np.arange(n), nnz_per_row)
    offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], nnz_per_row)
    idx[rows, offs] = A.indices
    val[rows, offs] = A.data
    return PaddedCsr(indices=idx, values=val, shape=A.shape, pad_index=pad)


def padded_to_csr(P: PaddedCsr) -> smat.csr_matrix:
    mask = P.indices != P.pad_index
    counts = mask.sum(axis=1)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    return smat.csr_matrix(
        (P.values[mask], P.indices[mask], indptr), shape=P.shape
    )


def get_cocluster_spectral_embeddings(A: smat.spmatrix, dim: int = 24):
    """Bipartite spectral co-clustering embeddings (Dhillon 2001).

    Reference: smat_util.py:740 — used as an alternative label-embedding
    source.  Returns (row_embedding (m, dim), col_embedding (n, dim)) from the
    top singular vectors of D1^{-1/2} A D2^{-1/2}.
    """
    from scipy.sparse.linalg import svds

    A = A.tocsr().astype(np.float64)
    d1 = np.asarray(abs(A).sum(axis=1)).ravel()
    d2 = np.asarray(abs(A).sum(axis=0)).ravel()
    d1[d1 == 0] = 1.0
    d2[d2 == 0] = 1.0
    D1 = smat.diags(1.0 / np.sqrt(d1))
    D2 = smat.diags(1.0 / np.sqrt(d2))
    An = D1 @ A @ D2
    k = min(dim + 1, min(An.shape) - 1)
    U, s, Vt = svds(An, k=k)
    order = np.argsort(-s)
    U, Vt = U[:, order], Vt[order]
    # drop the trivial leading vector
    U, Vt = U[:, 1 : dim + 1], Vt[1 : dim + 1]
    row_emb = (D1 @ U).astype(np.float32)
    col_emb = (D2 @ Vt.T).astype(np.float32)
    return row_emb, col_emb


def get_sparsified_coo(
    coo: smat.coo_matrix, selected_rows: np.ndarray, selected_cols: np.ndarray
) -> smat.coo_matrix:
    """Zero out entries outside selected rows x selected cols (same shape).

    Reference: smat_util.get_sparsified_coo, used by MLModel.get_submodel.
    """
    row_ok = np.zeros(coo.shape[0], bool)
    row_ok[np.asarray(selected_rows, dtype=np.int64)] = True
    col_ok = np.zeros(coo.shape[1], bool)
    col_ok[np.asarray(selected_cols, dtype=np.int64)] = True
    keep = row_ok[coo.row] & col_ok[coo.col]
    return smat.coo_matrix(
        (coo.data[keep], (coo.row[keep], coo.col[keep])), shape=coo.shape
    )


def get_csc_col_nonzero(M: smat.spmatrix):
    """Per-column sorted nonzero row indices."""
    M = M.tocsc()
    return [np.sort(M.indices[M.indptr[c] : M.indptr[c + 1]]) for c in range(M.shape[1])]


# ---------------------------------------------------------------------------
# CSR ensembling — reference smat_util.CsrEnsembler (:814-948)
# ---------------------------------------------------------------------------

class CsrEnsembler:
    """Combine several CSR prediction matrices into one."""

    @staticmethod
    def check_validity(*args: smat.csr_matrix) -> None:
        shapes = {a.shape for a in args}
        if len(shapes) != 1:
            raise ValueError(f"ensemble inputs must share shape, got {shapes}")

    @staticmethod
    def average(*args: smat.csr_matrix) -> smat.csr_matrix:
        CsrEnsembler.check_validity(*args)
        out = sum(a.tocsr() for a in args) / len(args)
        return sorted_csr(out.tocsr())

    @staticmethod
    def rank_average(*args: smat.csr_matrix) -> smat.csr_matrix:
        CsrEnsembler.check_validity(*args)
        acc = smat.csr_matrix(args[0].shape, dtype=np.float32)
        for a in args:
            a = sorted_csr(a.tocsr())
            ranks = a.copy().astype(np.float32)
            for i in range(a.shape[0]):
                s, e = a.indptr[i], a.indptr[i + 1]
                ranks.data[s:e] = 1.0 / (1.0 + np.arange(e - s))
            acc = acc + ranks
        return sorted_csr((acc / len(args)).tocsr())

    @staticmethod
    def sigmoid_average(*args: smat.csr_matrix) -> smat.csr_matrix:
        CsrEnsembler.check_validity(*args)
        acc = smat.csr_matrix(args[0].shape, dtype=np.float32)
        for a in args:
            b = a.tocsr(copy=True)
            b.data = 1.0 / (1.0 + np.exp(-b.data))
            acc = acc + b
        return sorted_csr((acc / len(args)).tocsr())

    @staticmethod
    def softmax_average(*args: smat.csr_matrix) -> smat.csr_matrix:
        CsrEnsembler.check_validity(*args)
        acc = smat.csr_matrix(args[0].shape, dtype=np.float32)
        for a in args:
            b = a.tocsr(copy=True)
            for i in range(b.shape[0]):
                s, e = b.indptr[i], b.indptr[i + 1]
                if e > s:
                    x = b.data[s:e]
                    x = np.exp(x - x.max())
                    b.data[s:e] = x / x.sum()
            acc = acc + b
        return sorted_csr((acc / len(args)).tocsr())

    @staticmethod
    def round_robin(*args: smat.csr_matrix) -> smat.csr_matrix:
        CsrEnsembler.check_validity(*args)
        base = len(args) + 1.0
        acc = smat.csr_matrix(args[0].shape, dtype=np.float32)
        for m, a in enumerate(args):
            a = sorted_csr(a.tocsr())
            ranks = a.copy().astype(np.float32)
            for i in range(a.shape[0]):
                s, e = a.indptr[i], a.indptr[i + 1]
                ranks.data[s:e] = base ** (-np.arange(e - s, dtype=np.float64)) * (
                    1.0 - m / base / base
                )
            acc = acc.maximum(ranks)
        return sorted_csr(acc.tocsr())


# ---------------------------------------------------------------------------
# Metrics — precision/recall@1..k, reference smat_util.Metrics (:950-996)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Metrics:
    prec: np.ndarray  # precision@1..k
    recall: np.ndarray  # recall@1..k

    @classmethod
    def generate(cls, tY: smat.csr_matrix, pY: smat.csr_matrix, topk: int = 10) -> "Metrics":
        """Precision@k / Recall@k of predictions pY against truth tY.

        P@k = (1/k) * mean_i |top-k(pY_i) ∩ Y_i| ; R@k = mean_i |top-k ∩ Y_i|/|Y_i|.
        Ranking is by descending score within each pY row.
        """
        if tY.shape != pY.shape:
            raise ValueError(f"shape mismatch {tY.shape} vs {pY.shape}")
        tY = tY.tocsr()
        pY = sorted_csr(pY.tocsr(), only_topk=topk)
        n, L = tY.shape
        num_true = np.maximum(np.diff(tY.indptr), 1).astype(np.float64)
        # membership by global (row, label) keys — no per-row Python
        p_nnz = np.diff(pY.indptr)
        p_row = np.repeat(np.arange(n, dtype=np.int64), p_nnz)
        p_rank = np.arange(pY.nnz) - np.repeat(pY.indptr[:-1], p_nnz)
        t_row = np.repeat(np.arange(n, dtype=np.int64), np.diff(tY.indptr))
        t_keys = t_row * L + tY.indices
        p_keys = p_row * L + pY.indices
        is_hit = np.isin(p_keys, t_keys, assume_unique=False)
        hits = np.zeros((n, topk), dtype=np.float64)
        hits[p_row[is_hit], p_rank[is_hit]] = 1.0
        cum = np.cumsum(hits, axis=1)
        ks = np.arange(1, topk + 1, dtype=np.float64)
        prec = (cum / ks[None, :]).mean(axis=0)
        recall = (cum / num_true[:, None]).mean(axis=0)
        return cls(prec=prec, recall=recall)

    def __str__(self) -> str:
        fmt = lambda v: " ".join(f"{100*x:.2f}" for x in v)
        return f"prec   = {fmt(self.prec)}\nrecall = {fmt(self.recall)}"
