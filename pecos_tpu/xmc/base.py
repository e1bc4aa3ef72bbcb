"""XMC model classes: MLProblem, MLModel (one layer), HierarchicalMLModel.

Host-facing API parity with the reference (pecos/xmc/base.py:488-1901), with
the compute re-designed TPU-first:

- training: per-label dual coordinate descent under OpenMP
  (linear_solver.hpp:798-860) -> batched primal Newton-CG over label blocks on
  the MXU (pecos_tpu.xmc.solvers), active sets expressed as masks.
- inference: chunked CSR beam walk (inference.hpp:2447-2488) -> static-shape
  beam search with padded children tables (pecos_tpu.xmc.inference).

Model persistence matches the reference directory layout byte-for-byte where
practical: ``param.json`` + ``W.npz``/``C.npz`` per layer (xmc/base.py:807-830),
``{d}.model`` subfolders for the chain (:1371-1395), so models trained by
either implementation can be loaded by the other for A/B comparison.
"""

from __future__ import annotations

import copy
import dataclasses as dc
import functools
from collections import deque
import json
import logging
import os
from typing import Any, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as smat

import pecos_tpu
from pecos_tpu.utils import smat_util
from pecos_tpu.utils.cluster_util import ClusterChain
from . import solvers
from .inference import (
    CompiledHierModel,
    build_device_layer,
    single_layer_predict,
)
from .postprocessor import PostProcessor

LOGGER = logging.getLogger(__name__)

# cap on elements per (N x Lb) solver block intermediate
_SOLVER_BLOCK_BUDGET = 1 << 26
# padded P*F elements above which a cluster switches from the local-dense
# bucket solver to the global sparse-rows solver (tests shrink this to
# exercise the big-cluster path on toy data)
_LOCAL_DENSE_BUDGET = 1 << 27


@functools.partial(jax.jit, static_argnames=("D", "bias"))
def _scatter_dense(ids: jax.Array, vals: jax.Array, *, D: int, bias: float) -> jax.Array:
    """(N, cap) padded sparse rows (pad id = D+1) -> dense (N, Db) on device."""
    N = ids.shape[0]
    Xb = jnp.zeros((N, D + 2), jnp.float32)
    Xb = Xb.at[jnp.arange(N)[:, None], ids].add(vals)
    if bias > 0:
        Xb = Xb.at[:, D].set(jnp.float32(bias))
        return Xb[:, : D + 1]
    return Xb[:, :D]


def _dense_X_device(X, bias: float) -> jax.Array:
    """Device-resident dense [X | bias] (N, Db), built from ONE nnz-sized
    padded sparse upload + a device-side scatter, cached on the matrix object.

    The old dense-mode path materialized X dense on host and re-uploaded
    N*D*4 bytes per dense-mode layer (328 MB x 2 layers at the 20K benchmark
    geometry); the padded sparse wire is ~nnz*8 bytes and later layers of the
    same hierarchical train reuse the cached device array.  The cache is keyed
    by buffer identity (indptr/indices/data), so replacing the matrix buffers
    invalidates it; in-place writes to X.data between layers do not (no PECOS
    path does that mid-train).
    """
    if not smat.issparse(X):
        Xd = np.asarray(X, np.float32)
        if bias > 0:
            Xd = np.hstack([Xd, np.full((Xd.shape[0], 1), bias, np.float32)])
        return jnp.asarray(Xd)
    A = X.tocsr()
    cached = getattr(A, "_ptpu_xdev", None)
    if (
        cached is not None
        and cached[0] == float(bias)
        and cached[1] is A.indptr
        and cached[2] is A.indices
        and cached[3] is A.data
    ):
        return cached[4]
    from .inference import prepare_queries_padded

    ids, vals = prepare_queries_padded(A)
    X_dev = _scatter_dense(
        jnp.asarray(ids), jnp.asarray(vals), D=A.shape[1], bias=float(bias)
    )
    try:
        A._ptpu_xdev = (float(bias), A.indptr, A.indices, A.data, X_dev)
    except Exception:  # exotic matrix types without __dict__
        pass
    return X_dev


class MLProblem(object):
    """Container of X, Y, C, M, R defining one multi-label training layer.

    Mirrors reference semantics (pecos/xmc/base.py:488-607): M defaults to the
    teacher-forcing matching Y @ C when a non-trivial C is given; R must share
    Y's nonzero pattern and be non-negative.
    """

    def __init__(self, X, Y, C=None, M=None, R=None):
        dtype = np.float32
        if smat.issparse(X):
            self.X = X.tocsr().astype(dtype)
        else:
            self.X = np.asarray(X, dtype=dtype)
        self.Y = Y.tocsc().astype(dtype) if smat.issparse(Y) else smat.csc_matrix(Y, dtype=dtype)
        if C is None:
            C = smat.csc_matrix(np.ones((self.Y.shape[1], 1), dtype=dtype))
            self.C = C
        else:
            self.C = C.tocsc().astype(dtype)
        self.Y.sort_indices()
        if R is not None:
            R = R.tocsc().astype(dtype)
            R.sort_indices()
            if not np.array_equal(self.Y.indptr, R.indptr) or not np.array_equal(
                self.Y.indices, R.indices
            ):
                raise ValueError("Invalid relevance matrix: nonzero pattern differs from Y")
            if (R.data < 0).any():
                raise ValueError("Invalid relevance matrix: got value < 0")
        self.R = R
        if M is None:
            if self.C.shape[1] > 1:
                M = (self.Y @ self.C).tocsc()
            else:
                M = smat.csc_matrix(np.ones((self.Y.shape[0], 1), dtype=dtype))
        else:
            if M.shape[0] != self.Y.shape[0] or M.shape[1] != self.C.shape[1]:
                raise ValueError("M shape mismatch")
            M = M.tocsc().astype(dtype)
        self.M = M

    @property
    def nr_labels(self):
        return self.Y.shape[1]

    @property
    def nr_features(self):
        return self.X.shape[1]


class MLModel(pecos_tpu.BaseClass):
    """One tree layer: weight matrix W (D+bias, L) CSC + cluster matrix C (L, K)."""

    @dc.dataclass
    class TrainParams(pecos_tpu.BaseParams):
        threshold: float = 0.1
        max_nonzeros_per_label: Optional[int] = None
        solver_type: str = "L2R_L2LOSS_SVC_DUAL"
        Cp: float = 1.0
        Cn: float = 1.0
        max_iter: int = 100
        eps: float = 0.1
        bias: float = 1.0
        threads: int = -1  # parity only; ignored on TPU
        verbose: int = 0
        newton_eps: float = 0.01
        # TPU extras
        max_newton_iter: int = 20
        cg_max_iter: int = 10
        solver_mode: str = "auto"  # auto | dense | bucketed

    @dc.dataclass
    class PredParams(pecos_tpu.BaseParams):
        only_topk: int = 20
        post_processor: str = "l3-hinge"

        def is_valid(self):
            return self.post_processor in PostProcessor.valid_list()

    def __init__(self, W=None, C=None, bias: float = -1.0, pred_params=None):
        if W is None:
            raise ValueError("W is required")
        self.W = W.tocsc().astype(np.float32) if smat.issparse(W) else smat.csc_matrix(W, dtype=np.float32)
        if C is None:
            C = smat.csc_matrix(np.ones((self.W.shape[1], 1), dtype=np.float32))
        self.C = C.tocsc().astype(np.float32) if smat.issparse(C) else smat.csc_matrix(C, dtype=np.float32)
        self.bias = float(bias)
        self.pred_params = self.PredParams.from_dict(pred_params)
        self._device_layer = None

    # -- shapes ----------------------------------------------------------------
    @property
    def nr_labels(self):
        return self.W.shape[1]

    @property
    def nr_features(self):
        return self.W.shape[0] - (1 if self.bias > 0 else 0)

    @property
    def nr_codes(self):
        return self.C.shape[1]

    def astype(self, dtype):
        return MLModel(self.W.astype(dtype), self.C.astype(dtype), self.bias, self.pred_params)

    def get_pred_params(self):
        return copy.deepcopy(self.pred_params)

    @property
    def device_layer(self):
        if self._device_layer is None:
            self._device_layer = build_device_layer(self.W, self.C)
        return self._device_layer

    # -- persistence -----------------------------------------------------------
    def save(self, folder: str):
        os.makedirs(folder, exist_ok=True)
        param = {
            "model": type(self).__name__,
            "nr_labels": self.nr_labels,
            "nr_features": self.nr_features,
            "nr_codes": self.nr_codes,
            "bias": self.bias,
            "pred_kwargs": self.pred_params.to_dict(),
        }
        param = self.append_meta(param)
        with open(os.path.join(folder, "param.json"), "w") as f:
            json.dump(param, f, indent=True)
        smat_util.save_matrix(os.path.join(folder, "W.npz"), self.W)
        smat_util.save_matrix(os.path.join(folder, "C.npz"), self.C)

    @classmethod
    def load(cls, folder: str) -> "MLModel":
        with open(os.path.join(folder, "param.json")) as f:
            param = json.load(f)
        W = smat_util.load_matrix(os.path.join(folder, "W.npz"))
        C = smat_util.load_matrix(os.path.join(folder, "C.npz"))
        pred_params = param.get("pred_kwargs", None)
        if pred_params is not None:
            pred_params = {
                k: v for k, v in pred_params.items() if k in ("only_topk", "post_processor")
            }
        return cls(W=W, C=C, bias=param.get("bias", -1.0), pred_params=pred_params)

    # -- training ----------------------------------------------------------------
    @classmethod
    def train(
        cls,
        prob: MLProblem,
        train_params: Optional["MLModel.TrainParams"] = None,
        pred_params: Optional["MLModel.PredParams"] = None,
        **kwargs,
    ) -> "MLModel":
        """Train one layer with the batched primal Newton-CG solver.

        Active set per label (linear_solver.hpp:667-711): rows of M's column
        for the label's cluster are negatives; rows of Y's column are
        positives (added if missing from M); cost = (Cp|Cn) * relevance.
        """
        train_params = cls.TrainParams.from_dict(train_params)
        train_params.override_with_kwargs(kwargs)
        pred_params = cls.PredParams.from_dict(pred_params)
        loss = solvers.loss_name(train_params.solver_type)

        X, Y, C, M, R = prob.X, prob.Y, prob.C, prob.M, prob.R
        N = X.shape[0]
        D = X.shape[1]
        L = Y.shape[1]
        bias = train_params.bias

        mode = train_params.solver_mode
        if mode == "auto":
            # masked-dense pays O(N*L) per layer (dense host y/cost blocks +
            # a dense X upload) regardless of how sparse the active sets are;
            # per-cluster gathering touches only active (row, label) pairs.
            # Prefer dense only when it fits AND the problem is actually
            # dense-ish: one root cluster, or active pairs are a sizable
            # fraction of N*K (nnz(M)+nnz(Y) upper-bounds the active count).
            # Measured at the 20K x 4096 x 8192 benchmark geometry: bucketed
            # 5.9 s warm vs dense ~100 s (fetch- and host-bound).
            K = C.shape[1]
            act_ub = (M.nnz + Y.nnz) / max(1, N * K)
            dense_fits = N * L <= (1 << 28) and N * (D + 1) <= (1 << 28)
            mode = "dense" if (dense_fits and (K <= 1 or act_ub > 0.25)) else "bucketed"
        if mode == "bucketed":
            return cls._train_bucketed(prob, train_params, pred_params, loss)

        X_dev = _dense_X_device(X, bias)
        Db = X_dev.shape[1]

        parents = C.tocsr().indices.astype(np.int64)  # one cluster per label
        M_csc = M.tocsc()
        Y_csc = Y.tocsc()
        R_csc = R.tocsc() if R is not None else None

        # block sized to the layer: padding every layer to one fixed 2048-wide
        # block re-solved a 16-label top layer at 128x its real width (and
        # uploaded 2048-wide y/c masks for it); pow2 bucketing still bounds
        # compile count to O(log L) shapes per (N, Db)
        L_pow2 = max(8, 1 << max(L - 1, 1).bit_length())
        block = max(8, min(2048, _SOLVER_BLOCK_BUDGET // max(N, 1), L_pow2))
        W_cols: List[smat.csc_matrix] = []
        max_nnz = train_params.max_nonzeros_per_label or Db
        thr = float(train_params.threshold)
        Cp_s = np.float32(train_params.Cp)
        Cn_s = np.float32(train_params.Cn)
        pending: deque = deque()  # (Wb_dev, Lb) in block order

        def retire(limit: int) -> None:
            # prune ON DEVICE (threshold + max nonzeros, linear_solver.hpp:718-778)
            # and download the sparse (idx, val) pairs: the device->host link
            # is the training bottleneck, not the solve itself
            while len(pending) > limit:
                Wb_dev, Lb = pending.popleft()
                K = min(max_nnz, Db)
                if thr > 0:
                    K = min(
                        K, int(jax.device_get(solvers.count_above_threshold(Wb_dev, thr)))
                    )
                if K < Db // 2:
                    K_pad = max(8, 1 << max(K - 1, 1).bit_length())  # pow2 shape bucket
                    idx, vals = solvers.prune_topk_device(Wb_dev, thr, min(K_pad, Db))
                    # top_k is magnitude-sorted: trimming to K on host keeps the
                    # exact max_nonzeros_per_label semantics despite the pow2 pad
                    idx = np.asarray(jax.device_get(idx))[:Lb, :K]
                    vals = np.asarray(jax.device_get(vals))[:Lb, :K]
                    nz = vals.ravel() != 0
                    coo_cols = np.repeat(np.arange(Lb), idx.shape[1])[nz]
                    W_cols.append(
                        smat.csc_matrix(
                            (vals.ravel()[nz], (idx.ravel()[nz], coo_cols)), shape=(Db, Lb)
                        )
                    )
                else:
                    Wb = np.array(jax.device_get(Wb_dev))[:, :Lb]
                    Wb[np.abs(Wb) < thr] = 0.0
                    W_cols.append(smat.csc_matrix(Wb))

        for s in range(0, L, block):
            e = min(s + block, L)
            Lb = e - s
            # uint8 coded wire (0 inactive, 1 pos, 2 neg), decoded to (y, c) on
            # device: 8x fewer upload bytes than two f32 masks.  Trailing pad
            # columns stay code 0 (c=0 -> w=0), reusing ONE compiled shape.
            codes = np.zeros((N, block), np.uint8)
            sub = codes[:, :Lb]
            sub[np.asarray(M_csc[:, parents[s:e]].todense()) != 0] = 2
            sub[np.asarray(Y_csc[:, s:e].todense()) > 0] = 1
            if R_csc is not None:
                Rb = np.zeros((N, block), np.float32)
                Rb[:, :Lb] = np.asarray(R_csc[:, s:e].todense(), dtype=np.float32)
                R_dev = jnp.asarray(Rb)
            else:
                R_dev = None
            Wb_dev = solvers.solve_block_coded(
                X_dev,
                jnp.asarray(codes),
                Cp_s,
                Cn_s,
                R_dev,
                loss=loss,
                eps=train_params.newton_eps,
                max_newton=train_params.max_newton_iter,
                cg_max=train_params.cg_max_iter,
                has_R=R_csc is not None,
            )
            pending.append((Wb_dev, Lb))
            # keep 2 solves in flight so the next block's host prep + upload
            # overlap the device solve; retire in order
            retire(2)
        retire(0)
        W = smat.hstack(W_cols, format="csc") if W_cols else smat.csc_matrix((Db, 0))
        return cls(W=W, C=C, bias=bias, pred_params=pred_params)

    @classmethod
    def _train_bucketed(cls, prob: MLProblem, train_params, pred_params, loss) -> "MLModel":
        """Scalable per-cluster training: gather each cluster's active
        instances and feature union, solve buckets of same-shape clusters with
        one vmapped Newton-CG each (solvers.solve_cluster_bucket).

        All cluster/label bookkeeping is computed with GLOBAL vectorized
        passes (one SpMM for active sets, one sorted-key searchsorted for
        positives, one np.unique for feature unions) instead of per-cluster
        Python — at Wiki-500K geometry (~37K clusters, 500K labels) the old
        per-cluster/per-label loops cost minutes before any device work.
        Semantics anchor: linear_solver.hpp:667-711 (M rows negative, Y rows
        positive, cost = (Cp|Cn)*relevance, inactive pairs cost 0).
        """
        X = prob.X.tocsr() if smat.issparse(prob.X) else smat.csr_matrix(prob.X)
        Y_csc, C, M_csc = prob.Y.tocsc(), prob.C.tocsc(), prob.M.tocsc()
        R_csc = prob.R.tocsc() if prob.R is not None else None
        N, D = X.shape
        L = Y_csc.shape[1]
        K = C.shape[1]
        bias = train_params.bias
        Db = D + (1 if bias > 0 else 0)
        max_nnz = train_params.max_nonzeros_per_label or Db
        Cp, Cn = np.float32(train_params.Cp), np.float32(train_params.Cn)

        def pow2(v, lo=8):
            return max(lo, 1 << max(int(v) - 1, 0).bit_length())

        # cluster -> children labels (C csc: one column per cluster)
        c_indptr = C.indptr
        children = [C.indices[c_indptr[k] : c_indptr[k + 1]] for k in range(K)]
        ns_max = max((len(ch) for ch in children), default=1)
        parents = np.zeros(L, np.int64)
        parents[C.indices] = np.repeat(np.arange(K), np.diff(c_indptr))
        # label -> rank among its siblings (position within its C column)
        pos_in_C = np.empty(L, np.int64)
        pos_in_C[C.indices] = np.arange(len(C.indices))
        j_local_of_label = pos_in_C - c_indptr[parents]

        # ---- global active sets: one boolean SpMM ---------------------------
        Yb = Y_csc.copy()
        Yb.data = np.ones_like(Yb.data)
        Cb = C.copy()
        Cb.data = np.ones_like(Cb.data)
        Mb = M_csc.copy()
        Mb.data = np.ones_like(Mb.data)
        Act = ((Yb @ Cb) + Mb).tocsc()  # (N, K); col k = active rows of cluster k
        Act.sum_duplicates()
        Act.sort_indices()
        act_indptr, act_rows = Act.indptr, Act.indices
        P_arr = np.diff(act_indptr)
        total_act = len(act_rows)
        act_cluster = np.repeat(np.arange(K, dtype=np.int64), P_arr)
        act_keys = act_cluster * N + act_rows

        # in-M mask per active (cluster, row) slot
        m_cluster = np.repeat(np.arange(K, dtype=np.int64), np.diff(M_csc.indptr))
        in_M_flat = np.zeros(total_act, bool)
        in_M_flat[np.searchsorted(act_keys, m_cluster * N + M_csc.indices)] = True

        # per-Y-entry local position + sibling rank, grouped by cluster
        y_lab = np.repeat(np.arange(L, dtype=np.int64), np.diff(Y_csc.indptr))
        y_par = parents[y_lab]
        y_pos_local = np.searchsorted(act_keys, y_par * N + Y_csc.indices) - act_indptr[y_par]
        y_j = j_local_of_label[y_lab]
        y_cost = (
            Cp * R_csc.data.astype(np.float32)
            if R_csc is not None
            else np.full(len(y_lab), Cp, np.float32)
        )
        ordY = np.argsort(y_par, kind="stable")
        y_pos_local, y_j, y_cost = y_pos_local[ordY], y_j[ordY], y_cost[ordY]
        y_bounds = np.searchsorted(y_par[ordY], np.arange(K + 1))

        # ---- one global X row-gather + per-cluster feature unions -----------
        XA = X[act_rows]  # (total_act, D) csr
        row_nnz = np.diff(XA.indptr)
        seg_nnz = np.zeros(K, np.int64)
        np.add.at(seg_nnz, act_cluster, row_nnz)
        seg_max_nnz = np.zeros(K, np.int64)
        np.maximum.at(seg_max_nnz, act_cluster, row_nnz)
        xcap_arr = seg_max_nnz + (1 if bias > 0 else 0)
        rows_local = np.repeat(
            np.arange(total_act) - act_indptr[act_cluster], row_nnz
        )
        offs = np.arange(XA.nnz) - np.repeat(XA.indptr[:-1], row_nnz)

        # big clusters (local-dense layout infeasible) -> global sparse-rows
        pw2_P = np.maximum(8, 2 ** np.ceil(np.log2(np.maximum(P_arr, 1))).astype(np.int64))
        F_est = np.minimum(seg_nnz + 1, Db)
        pw2_F = np.maximum(128, 2 ** np.ceil(np.log2(np.maximum(F_est, 1))).astype(np.int64))
        is_big = (pw2_P * pw2_F > _LOCAL_DENSE_BUDGET) & (P_arr > 0)
        nonempty = (P_arr > 0) & (np.diff(c_indptr) > 0)
        small_mask = nonempty & ~is_big
        big_mask = nonempty & is_big

        # feature unions only for small clusters (one global unique)
        e_cluster = np.repeat(act_cluster, row_nnz)
        e_small = small_mask[e_cluster]
        stride = np.int64(D + 1)
        fkeys = e_cluster[e_small] * stride + XA.indices[e_small]
        if bias > 0:
            small_ids = np.nonzero(small_mask)[0].astype(np.int64)
            fkeys = np.concatenate([fkeys, small_ids * stride + D])
        uniq = np.unique(fkeys)
        F_bounds = np.searchsorted(uniq, np.arange(K + 1, dtype=np.int64) * stride)
        F_len = np.diff(F_bounds)
        F_feat = (uniq % stride).astype(np.int64)  # bias slot -> feature id D
        f_local_small = (np.searchsorted(uniq, fkeys[: e_small.sum()]) - F_bounds[e_cluster[e_small]]).astype(np.int32)
        # scatter back to per-entry positions (entries of small clusters only)
        f_local_all = np.zeros(XA.nnz, np.int32)
        f_local_all[e_small] = f_local_small
        xent_bounds = np.searchsorted(e_cluster, np.arange(K + 1))

        def build_y_cost(k, P, ns):
            sl = slice(y_bounds[k], y_bounds[k + 1])
            y = -np.ones((P, ns), np.float32)
            cost = np.zeros((P, ns), np.float32)
            nk = len(children[k])
            in_M_k = in_M_flat[act_indptr[k] : act_indptr[k + 1]]
            cost[:, :nk] = np.where(in_M_k[:, None], Cn, np.float32(0.0))
            y[y_pos_local[sl], y_j[sl]] = 1.0
            cost[y_pos_local[sl], y_j[sl]] = y_cost[sl]
            return y, cost

        def _ranges(starts, ends):
            """Concatenate [starts_i, ends_i) index ranges, vectorized.

            Returns (which_range, flat_index) pairs so a chunk of clusters'
            per-entry slices can be gathered with ONE fancy index instead of
            a per-cluster Python loop (at Wiki-500K geometry that loop costs
            tens of seconds of host time per layer)."""
            lens = (ends - starts).astype(np.int64)
            total = int(lens.sum())
            if total == 0:
                z = np.zeros(0, np.int64)
                return z, z
            rep = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
            base = np.concatenate([[0], np.cumsum(lens)[:-1]])
            within = np.arange(total, dtype=np.int64) - np.repeat(base, lens)
            return rep, starts[rep] + within

        nk_all = np.diff(c_indptr)
        big_jobs = []  # (k, gx_ids, gx_vals, y, cost)
        for k in np.nonzero(big_mask)[0]:
            P = int(P_arr[k])
            xcap = max(int(xcap_arr[k]), 1)
            sl_e = slice(xent_bounds[k], xent_bounds[k + 1])
            rl, of = rows_local[sl_e], offs[sl_e]
            nnz_seg = row_nnz[act_indptr[k] : act_indptr[k + 1]]
            gx_ids = np.full((P, xcap), Db, np.int32)
            gx_vals = np.zeros((P, xcap), np.float32)
            gx_ids[rl, of] = XA.indices[sl_e]
            gx_vals[rl, of] = XA.data[sl_e]
            if bias > 0:
                gx_ids[np.arange(P), nnz_seg] = D
                gx_vals[np.arange(P), nnz_seg] = bias
            y, cost = build_y_cost(k, P, len(children[k]))
            big_jobs.append((k, gx_ids, gx_vals, y, cost))

        def prune_block(Wb: np.ndarray) -> np.ndarray:
            """Vectorized threshold + per-column top-|w| prune.

            Wb (F', ns') or (Cb, F', ns'): zero entries below threshold, then
            keep at most max_nnz per label column (linear_solver.hpp:718-778).
            """
            absW = np.abs(Wb)
            Wb = np.where(absW < train_params.threshold, 0.0, Wb)
            Fdim = Wb.shape[-2]
            if max_nnz < Fdim:
                absW = np.where(absW < train_params.threshold, 0.0, np.abs(Wb))
                part = np.argpartition(-absW, max_nnz - 1, axis=-2)
                mask = np.zeros_like(Wb, bool)
                np.put_along_axis(mask, np.take(part, np.arange(max_nnz), axis=-2), True, axis=-2)
                Wb = np.where(mask, Wb, 0.0)
            return Wb

        # ---- bucket by padded shapes, assemble chunks with global scatters --
        # (4x-coarser quantization was measured: no device-time win, more
        # host padding cost — pow2 kept)
        small_ids = np.nonzero(small_mask)[0]
        F2_arr = np.maximum(
            128, 2 ** np.ceil(np.log2(np.maximum(F_len, 1))).astype(np.int64)
        )
        pw2_xc = np.maximum(
            8, 2 ** np.ceil(np.log2(np.maximum(xcap_arr, 1))).astype(np.int64)
        )
        if len(small_ids):
            order = np.lexsort(
                (pw2_xc[small_ids], F2_arr[small_ids], pw2_P[small_ids])
            )
            small_ids = small_ids[order]
            keys = np.stack(
                [pw2_P[small_ids], F2_arr[small_ids], pw2_xc[small_ids]], axis=1
            )
            new_bucket = np.ones(len(small_ids), bool)
            new_bucket[1:] = np.any(keys[1:] != keys[:-1], axis=1)
            bucket_starts = np.nonzero(new_bucket)[0]
            bucket_ends = np.append(bucket_starts[1:], len(small_ids))
        else:
            bucket_starts = bucket_ends = np.zeros(0, np.int64)

        W_rows: List[np.ndarray] = []
        W_cols: List[np.ndarray] = []
        W_vals: List[np.ndarray] = []
        C_idx_all = C.indices.astype(np.int64)

        # Bounded dispatch pipeline: the solver chunks are independent, so a
        # synchronous device_get per chunk would serialize host padding,
        # device compute, and the tunnel round trip (each fetch costs ~30 ms
        # of latency on top of compute).  Keep a window of in-flight chunks:
        # host prep of chunk i+1 overlaps device compute of chunk i; results
        # are pruned/scattered when they retire from the window.
        from collections import deque

        pending: deque = deque()

        def retire(limit: int) -> None:
            while len(pending) > limit:
                finish, dev = pending.popleft()
                finish(np.array(jax.device_get(dev)))

        for b0, b1 in zip(bucket_starts, bucket_ends):
            P2 = int(pw2_P[small_ids[b0]])
            F2 = int(F2_arr[small_ids[b0]])
            xc2 = int(pw2_xc[small_ids[b0]])
            # device chunk size bounded by local-dense memory P2*F2*Cb
            cb = max(1, (1 << 24) // (P2 * F2))
            for s in range(b0, b1, cb):
                ks = small_ids[s : min(s + cb, b1)]
                Cb = len(ks)
                ids = np.full((Cb, P2, xc2), F2, np.int32)
                vals = np.zeros((Cb, P2, xc2), np.float32)
                # X entries: one fancy-index scatter for the whole chunk
                rep_e, e_idx = _ranges(xent_bounds[ks], xent_bounds[ks + 1])
                ids[rep_e, rows_local[e_idx], offs[e_idx]] = f_local_all[e_idx]
                vals[rep_e, rows_local[e_idx], offs[e_idx]] = XA.data[e_idx]
                # active slots (cluster-position, local row) for bias/y/cost
                rep_a, a_idx = _ranges(act_indptr[ks], act_indptr[ks + 1])
                p_local = a_idx - act_indptr[ks][rep_a]
                if bias > 0:
                    # bias feature is the largest key in the union -> last slot
                    ids[rep_a, p_local, row_nnz[a_idx]] = (F_len[ks] - 1)[rep_a]
                    vals[rep_a, p_local, row_nnz[a_idx]] = bias
                nk = nk_all[ks]
                act_row = np.zeros((Cb, P2), bool)
                act_row[rep_a, p_local] = True
                inM = np.zeros((Cb, P2), bool)
                inM[rep_a, p_local] = in_M_flat[a_idx]
                yb = np.empty((Cb, P2, ns_max), np.float32)
                yb[:] = np.where(act_row, np.float32(-1.0), np.float32(1.0))[:, :, None]
                col_ok = np.arange(ns_max)[None, None, :] < nk[:, None, None]
                cb_ = np.where(col_ok & inM[:, :, None], Cn, np.float32(0.0))
                rep_y, y_idx = _ranges(y_bounds[ks], y_bounds[ks + 1])
                yb[rep_y, y_pos_local[y_idx], y_j[y_idx]] = 1.0
                cb_[rep_y, y_pos_local[y_idx], y_j[y_idx]] = y_cost[y_idx]
                Wl_dev = solvers.solve_cluster_bucket(
                    jnp.asarray(ids),
                    jnp.asarray(vals),
                    jnp.asarray(yb),
                    jnp.asarray(cb_),
                    F2=F2,
                    loss=loss,
                    eps=train_params.newton_eps,
                    max_newton=train_params.max_newton_iter,
                    cg_max=train_params.cg_max_iter,
                )

                def finish_bucket(Wl, ks=ks, nk=nk):
                    Wl = prune_block(Wl)  # (Cb, F2, ns_max)
                    ci, fi, ji = np.nonzero(Wl)
                    keep = (fi < F_len[ks][ci]) & (ji < nk[ci])
                    ci, fi, ji = ci[keep], fi[keep], ji[keep]
                    kk = ks[ci]
                    W_rows.append(F_feat[F_bounds[kk] + fi])
                    W_cols.append(C_idx_all[c_indptr[kk] + ji])
                    W_vals.append(Wl[ci, fi, ji].astype(np.float32))

                pending.append((finish_bucket, Wl_dev))
                retire(6)
        # ---- huge clusters: global sparse-rows solver -----------------------
        for k, gx_ids, gx_vals, y, cost in big_jobs:
            ch = children[k]
            P, xc = gx_ids.shape
            P2 = pow2(P)
            xc2 = pow2(xc)
            ids = np.full((P2, xc2), Db, np.int32)
            vals_ = np.zeros((P2, xc2), np.float32)
            ids[:P, :xc] = gx_ids
            vals_[:P, :xc] = gx_vals
            yb = np.ones((P2, len(ch)), np.float32)
            cb_ = np.zeros((P2, len(ch)), np.float32)
            yb[:P] = y
            cb_[:P] = cost
            Wg_dev = solvers.solve_sparse_rows(
                jnp.asarray(ids),
                jnp.asarray(vals_),
                jnp.asarray(yb),
                jnp.asarray(cb_),
                Db=Db,
                loss=loss,
                eps=train_params.newton_eps,
                max_newton=train_params.max_newton_iter,
                cg_max=train_params.cg_max_iter,
            )

            def finish_big(Wg, ch=ch):
                Wg = prune_block(Wg)  # (Db, ns)
                f_idx, j_idx = np.nonzero(Wg)
                W_rows.append(f_idx.astype(np.int64))
                W_cols.append(ch[j_idx].astype(np.int64))
                W_vals.append(Wg[f_idx, j_idx].astype(np.float32))

            pending.append((finish_big, Wg_dev))
            retire(2)
        retire(0)

        rows = np.concatenate(W_rows) if W_rows else np.zeros(0, np.int64)
        cols = np.concatenate(W_cols) if W_cols else np.zeros(0, np.int64)
        vals = np.concatenate(W_vals) if W_vals else np.zeros(0, np.float32)
        W = smat.csc_matrix((vals, (rows, cols)), shape=(Db, L))
        return cls(W=W, C=C, bias=bias, pred_params=pred_params)

    # -- prediction ---------------------------------------------------------------
    def predict(
        self,
        X,
        csr_codes: Optional[smat.csr_matrix] = None,
        pred_params: Optional["MLModel.PredParams"] = None,
        **kwargs,
    ) -> smat.csr_matrix:
        if X.shape[1] != self.nr_features:
            raise ValueError("Feature dimension of query matrix does not match weight matrix")
        pred_params = self.get_pred_params() if pred_params is None else pred_params
        pred_params.override_with_kwargs(kwargs)
        if not pred_params.is_valid():
            raise ValueError("pred_params is not valid!")
        return single_layer_predict(
            self.device_layer,
            X,
            self.bias,
            csr_codes,
            pred_params.only_topk,
            pred_params.post_processor,
        )

    def predict_numpy(
        self,
        X,
        csr_codes: Optional[smat.csr_matrix] = None,
        only_topk: Optional[int] = None,
        post_processor: Optional[str] = None,
    ) -> smat.csr_matrix:
        """Pure-numpy reference path (dense; test-scale only).

        Serves the same role as the reference's python-vs-C++ consistency
        anchor (test_xlinear.py:106): an independent implementation the device
        path must agree with.
        """
        only_topk = only_topk if only_topk is not None else self.pred_params.only_topk
        pp = PostProcessor.get(
            post_processor if post_processor is not None else self.pred_params.post_processor
        )
        Xd = np.asarray(X.todense(), np.float32) if smat.issparse(X) else np.asarray(X, np.float32)
        if self.bias > 0:
            Xd = np.hstack([Xd, np.full((Xd.shape[0], 1), self.bias, np.float32)])
        raw = Xd @ np.asarray(self.W.todense())  # (N, L)
        val = pp.transform_np(raw)
        parents = self.C.tocsr().indices  # (L,)
        if csr_codes is not None:
            prior = np.asarray(csr_codes.todense())  # (N, K)
            active = np.asarray(csr_codes.todense() != 0)
            val = pp.combiner_np(val, prior[:, parents])
            val = np.where(active[:, parents], val, -np.inf)
        scores = np.where(np.isfinite(val), val, -np.inf)
        k = min(only_topk, scores.shape[1])
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        vals = np.take_along_axis(scores, idx, axis=1)
        keep = vals > -np.inf
        idx = np.where(keep, idx, -1)
        vals = np.where(keep, vals, 0.0)
        return smat_util.csr_from_topk_arrays(idx, vals, self.nr_labels)

    def predict_on_selected_outputs(
        self,
        X,
        selected_outputs_csr: smat.csr_matrix,
        csr_codes: Optional[smat.csr_matrix] = None,
        pred_params: Optional["MLModel.PredParams"] = None,
        **kwargs,
    ) -> smat.csr_matrix:
        """Score only the given (instance, label) pairs (reference
        xmc/base.py predict_on_selected_outputs / inference.hpp:2508)."""
        from .inference import score_selected_labels

        pred_params = self.get_pred_params() if pred_params is None else pred_params
        pred_params.override_with_kwargs(kwargs)
        pp = PostProcessor.get(pred_params.post_processor)
        sel = selected_outputs_csr.tocsr()
        if sel.shape[1] != self.nr_labels:
            raise ValueError("Label dimension of selected output matrix does not match")
        N = sel.shape[0]
        counts = np.diff(sel.indptr)
        cap = max(8, 1 << max(int(counts.max()) - 1, 0).bit_length()) if N else 8
        labels = np.full((N, cap), -1, np.int32)
        rows = np.repeat(np.arange(N), counts)
        offs = np.arange(sel.nnz) - np.repeat(sel.indptr[:-1], counts)
        labels[rows, offs] = sel.indices
        raw = score_selected_labels(self.device_layer, X, self.bias, labels)
        val = pp.transform_np(raw)
        if csr_codes is not None:
            parents = self.C.tocsr().indices
            codes = csr_codes.tocsr()
            safe = np.clip(labels, 0, self.nr_labels - 1)
            prior = np.asarray(
                codes[np.repeat(np.arange(N), cap), parents[safe].ravel()]
            ).reshape(N, cap)
            val = pp.combiner_np(val, prior)
        val = np.where(labels >= 0, val, 0.0)
        return smat_util.csr_from_topk_arrays(labels.astype(np.int64), val, self.nr_labels)

    def get_submodel(self, selected_codes=None, selected_labels=None, reindex=False):
        """Slice/sparsify W and C by code/label connectivity.

        Returns {'model', 'active_codes', 'active_labels'} (reference
        xmc/base.py:1017-1087).
        """
        if selected_codes is None:
            selected_codes = np.arange(self.nr_codes)
        elif len(selected_codes) and max(selected_codes) >= self.nr_codes:
            raise ValueError("selected_codes out of range")
        if selected_labels is None:
            selected_labels = np.arange(self.nr_labels)
        elif len(selected_labels) and max(selected_labels) >= self.nr_labels:
            raise ValueError("selected_labels out of range")
        coo = smat_util.get_sparsified_coo(
            smat.coo_matrix(self.C), selected_labels, selected_codes
        )
        active_labels = np.sort(np.unique(coo.row))
        active_codes = np.sort(np.unique(coo.col))
        if reindex:
            row_map = np.arange(coo.shape[0])
            row_map[active_labels] = np.arange(len(active_labels))
            col_map = np.arange(coo.shape[1])
            col_map[active_codes] = np.arange(len(active_codes))
            new_C = smat.csc_matrix(
                (coo.data, (row_map[coo.row], col_map[coo.col])),
                shape=(len(active_labels), len(active_codes)),
            )
            new_W = self.W[:, active_labels]
        else:
            new_C = coo.tocsc()
            new_W = smat_util.get_sparsified_coo(
                smat.coo_matrix(self.W), np.arange(self.W.shape[0]), active_labels
            ).tocsc()
        return {
            "model": MLModel(C=new_C, W=new_W, bias=self.bias, pred_params=self.get_pred_params()),
            "active_labels": active_labels,
            "active_codes": active_codes,
        }


class PredictOnlyHierModel(pecos_tpu.BaseClass):
    """Predict-only model over the compiled device layout.

    The analog of the reference's C++ predict-only/mmap mode
    (is_predict_only=True loads, xmc/base.py:1356-1360): fastest load path,
    prediction only — mutation/surgery raise, like the reference.
    """

    def __init__(self, compiled: CompiledHierModel):
        self._compiled = compiled
        self.is_predict_only = True

    @property
    def depth(self):
        return self._compiled.depth

    @property
    def nr_labels(self):
        return self._compiled.nr_labels

    @property
    def nr_features(self):
        return self._compiled.nr_features

    def get_pred_params(self):
        return HierarchicalMLModel.PredParams(
            model_chain=tuple(MLModel.PredParams() for _ in range(self.depth))
        )

    def predict(self, X, csr_codes=None, pred_params=None, **kwargs):
        if csr_codes is not None:
            raise Exception("Model is predict only! csr_codes not supported!")
        beam_size = kwargs.get("beam_size", 10) or 10
        only_topk = kwargs.get("only_topk", None) or 20
        post_processor = kwargs.get("post_processor", None) or "l3-hinge"
        mesh = kwargs.pop("mesh", None)
        if mesh is not None:
            from pecos_tpu.parallel.mesh import predict_sharded

            return predict_sharded(
                mesh,
                self._compiled,
                X,
                beam_size=beam_size,
                only_topk=only_topk,
                post_processor=post_processor,
            )
        return self._compiled.predict(
            X, beam_size=beam_size, only_topk=only_topk, post_processor=post_processor
        )

    def save(self, folder):
        raise Exception("Model is predict only! save not supported!")

    def _get_compiled(self):
        return self._compiled

    def realtime_session(self, **kwargs):
        """Persistent low-latency predict session (inference.RealtimeSession)."""
        return self._compiled.realtime_session(**kwargs)


class HierarchicalMLModel(pecos_tpu.BaseClass):
    """Chain of MLModels forming the hierarchical linear model."""

    @dc.dataclass
    class TrainParams(pecos_tpu.BaseParams):
        neg_mining_chain: Union[str, Sequence[str]] = "tfn"
        model_chain: Any = None  # MLModel.TrainParams or tuple per layer

    @dc.dataclass
    class PredParams(pecos_tpu.BaseParams):
        model_chain: Any = None  # MLModel.PredParams or tuple per layer

        def override_with_kwargs(self, pred_kwargs):
            if pred_kwargs is not None and self.model_chain is not None:
                for p in self.model_chain:
                    p.override_with_kwargs(pred_kwargs)
            return self

    def __init__(self, model_chain, pred_params=None, is_predict_only: bool = False):
        if isinstance(model_chain, MLModel):
            model_chain = [model_chain]
        self.model_chain: List[MLModel] = list(model_chain)
        if pred_params is None:
            pred_params = self.PredParams(
                model_chain=tuple(m.get_pred_params() for m in self.model_chain)
            )
        self.pred_params = pred_params
        self.is_predict_only = is_predict_only
        self._compiled: Optional[CompiledHierModel] = None

    # -- shapes / algebra ----------------------------------------------------------
    @property
    def depth(self):
        return len(self.model_chain)

    @property
    def nr_labels(self):
        return self.model_chain[-1].nr_labels

    @property
    def nr_features(self):
        return self.model_chain[0].nr_features

    @property
    def nr_codes(self):
        return self.model_chain[0].nr_codes

    def __add__(self, other: "HierarchicalMLModel") -> "HierarchicalMLModel":
        if not isinstance(other, HierarchicalMLModel):
            raise ValueError("can only add HierarchicalMLModel")
        if self.model_chain[-1].nr_labels != other.model_chain[0].nr_codes:
            raise ValueError("chains are not compatible")
        return HierarchicalMLModel(
            self.model_chain + other.model_chain,
            pred_params=self.PredParams(
                model_chain=tuple(
                    list(self.pred_params.model_chain) + list(other.pred_params.model_chain)
                )
            ),
        )

    def __getitem__(self, key) -> "HierarchicalMLModel":
        if isinstance(key, int):
            key = slice(key, key + 1)
        return HierarchicalMLModel(
            self.model_chain[key],
            pred_params=self.PredParams(model_chain=tuple(self.pred_params.model_chain[key])),
        )

    def astype(self, dtype):
        return HierarchicalMLModel(
            [m.astype(dtype) for m in self.model_chain], self.pred_params, self.is_predict_only
        )

    def get_pred_params(self):
        return copy.deepcopy(self.pred_params)

    # -- persistence ----------------------------------------------------------------
    def save(self, folder: str):
        if self.is_predict_only:
            raise Exception("Model is predict only! save not supported!")
        os.makedirs(folder, exist_ok=True)
        param = {
            "model": type(self).__name__,
            "depth": self.depth,
            "nr_features": self.nr_features,
            "nr_codes": self.nr_codes,
            "nr_labels": self.nr_labels,
        }
        param = self.append_meta(param)
        with open(os.path.join(folder, "param.json"), "w", encoding="utf-8") as f:
            json.dump(param, f, indent=True)
        for d in range(self.depth):
            self.model_chain[d].save(os.path.join(folder, f"{d}.model"))

    @classmethod
    def load(cls, folder: str, is_predict_only: bool = False, **kwargs) -> "HierarchicalMLModel":
        with open(os.path.join(folder, "param.json")) as f:
            param = json.load(f)
        chain = [MLModel.load(os.path.join(folder, f"{d}.model")) for d in range(param["depth"])]
        return cls(chain, is_predict_only=is_predict_only)

    # -- params broadcasting (reference xmc/base.py:1175-1199) ----------------------
    @classmethod
    def _broadcast_chain_params(cls, params, param_cls, depth: int):
        """Expand scalar / singleton *_chain fields to tuples of length depth."""
        if params is None:
            return param_cls(model_chain=tuple(cls._leaf_params(param_cls)() for _ in range(depth)))
        if isinstance(params, dict):
            params = param_cls.from_dict(params)
        mc = params.model_chain
        leaf_cls = cls._leaf_params(param_cls)
        if mc is None:
            mc = tuple(leaf_cls() for _ in range(depth))
        elif isinstance(mc, (leaf_cls, dict)):
            one = leaf_cls.from_dict(mc)
            mc = tuple(copy.deepcopy(one) for _ in range(depth))
        else:
            mc = tuple(leaf_cls.from_dict(p) for p in mc)
            if len(mc) == 1:
                mc = tuple(copy.deepcopy(mc[0]) for _ in range(depth))
            if len(mc) != depth:
                raise ValueError(f"model_chain length {len(mc)} != depth {depth}")
        params.model_chain = mc
        return params

    @staticmethod
    def _leaf_params(param_cls):
        return MLModel.TrainParams if param_cls is HierarchicalMLModel.TrainParams else MLModel.PredParams

    # -- training --------------------------------------------------------------------
    @classmethod
    def train(
        cls,
        prob: MLProblem,
        clustering: Optional[ClusterChain] = None,
        train_params: Optional["HierarchicalMLModel.TrainParams"] = None,
        pred_params: Optional["HierarchicalMLModel.PredParams"] = None,
        matching_chain=None,
        relevance_chain=None,
        **kwargs,
    ) -> "HierarchicalMLModel":
        """Level-by-level training with tfn/man/usn negative mining.

        Mirrors reference control flow (pecos/xmc/base.py:1412-1572): roll Y up
        the chain, build the matching matrix M per layer from the chosen
        negative-mining schemes, train each layer with MLModel.train.
        """
        if clustering is None:
            C = prob.C if prob.C is not None else smat.csc_matrix(
                np.ones((prob.nr_labels, 1), np.float32)
            )
            clustering = ClusterChain([C])
        elif not isinstance(clustering, ClusterChain):
            clustering = ClusterChain(clustering)
        depth = len(clustering)

        train_params = cls._broadcast_chain_params(train_params, cls.TrainParams, depth)
        if getattr(train_params, "neg_mining_chain", None) is None:
            train_params.neg_mining_chain = "tfn"
        if isinstance(train_params.neg_mining_chain, str):
            train_params.neg_mining_chain = [train_params.neg_mining_chain] * depth
        train_params.neg_mining_chain = [s.lower() for s in train_params.neg_mining_chain]
        if len(train_params.neg_mining_chain) != depth:
            raise ValueError("neg_mining_chain length mismatch")

        pred_params = cls._broadcast_chain_params(pred_params, cls.PredParams, depth)
        pred_params.override_with_kwargs(kwargs.get("pred_kwargs", None))

        # Y chain rollup: Y_d = Y_{d+1} @ C_{d+1}
        Y_chain = [prob.Y.tocsc()]
        for C in reversed(clustering[1:]):
            Y_chain.append((Y_chain[-1] @ C).tocsc())
        Y_chain.reverse()

        if matching_chain is None:
            matching_chain = [None] * depth
        if relevance_chain is None:
            relevance_chain = [None] * depth
        else:
            relevance_chain = list(relevance_chain)

        model_chain: List[MLModel] = []
        M_pred = None
        cur_X = prob.X
        for t in range(depth):
            Y, C = Y_chain[t], clustering[t]
            R = relevance_chain[t]
            M_usn = matching_chain[t]
            scheme = train_params.neg_mining_chain[t]
            LOGGER.info(f"training layer {t+1}/{depth} (labels={Y.shape[1]}, neg_mining={scheme})")
            M = None
            if t == 0:
                if C.shape[1] > 1:
                    M = smat.csc_matrix((Y.shape[0], C.shape[1]), dtype=np.float32)
                    if "usn" in scheme and M_usn is not None:
                        M = M + smat_util.binarized(M_usn)
                    if "tfn" in scheme:
                        M = M + smat_util.binarized((Y @ C).tocsc())
            else:
                M = smat.csc_matrix((Y.shape[0], C.shape[1]), dtype=np.float32)
                if "usn" in scheme and M_usn is not None:
                    M = M + smat_util.binarized(M_usn)
                if "tfn" in scheme:
                    M = M + smat_util.binarized(Y_chain[t - 1].tocsc())
                if any("man" in s for s in train_params.neg_mining_chain[t:]):
                    M_pred = model_chain[-1].predict(cur_X, csr_codes=M_pred)
                if "man" in scheme:
                    M = M + smat_util.binarized(M_pred)
            layer_prob = MLProblem(cur_X, Y, C=C, M=M, R=R)
            model = MLModel.train(
                layer_prob,
                train_params=train_params.model_chain[t],
                pred_params=pred_params.model_chain[t],
            )
            model_chain.append(model)
        return cls(model_chain, pred_params=pred_params, is_predict_only=False)

    # -- prediction -------------------------------------------------------------------
    def _get_compiled(self) -> CompiledHierModel:
        if self._compiled is None:
            self._compiled = CompiledHierModel(
                [m.device_layer for m in self.model_chain],
                bias=self.model_chain[0].bias,
                nr_features=self.nr_features,
            )
        return self._compiled

    def realtime_session(self, **kwargs):
        """Persistent low-latency predict session (inference.RealtimeSession)."""
        return self._get_compiled().realtime_session(**kwargs)

    def predict(
        self,
        X,
        csr_codes: Optional[smat.csr_matrix] = None,
        pred_params: Optional["HierarchicalMLModel.PredParams"] = None,
        **kwargs,
    ) -> smat.csr_matrix:
        """Whole-chain fused beam search on device (fast path).

        kwargs: beam_size (default 10), only_topk, post_processor override;
        mesh — a jax.sharding.Mesh with an "lp" axis routes the predict
        through the label-sharded (model-parallel) engine, each device
        holding 1/lp of the weights (parallel.mesh.predict_sharded; the
        reference's sub-tree model parallelism,
        pecos/distributed/xmc/xlinear/model.py:620-752).
        """
        beam_size = kwargs.get("beam_size", 10) or 10
        mesh = kwargs.pop("mesh", None)
        pred_params = self.get_pred_params() if pred_params is None else pred_params
        pred_params.override_with_kwargs(kwargs)
        last = pred_params.model_chain[-1]
        only_topk = last.only_topk
        pp_names = tuple(p.post_processor for p in pred_params.model_chain)
        if csr_codes is not None:
            # fall back to the per-layer loop when a starting beam is supplied
            return self._predict_layer_loop(
                X, csr_codes=csr_codes, pred_params=pred_params, beam_size=beam_size
            )
        if mesh is not None:
            from pecos_tpu.parallel.mesh import predict_sharded

            return predict_sharded(
                mesh,
                self._get_compiled(),
                X,
                beam_size=beam_size,
                only_topk=only_topk,
                post_processor=pp_names,
            )
        return self._get_compiled().predict(
            X, beam_size=beam_size, only_topk=only_topk, post_processor=pp_names
        )

    def predict_on_selected_outputs(
        self,
        X,
        selected_outputs_csr: smat.csr_matrix,
        pred_params: Optional["HierarchicalMLModel.PredParams"] = None,
        **kwargs,
    ) -> smat.csr_matrix:
        """Score only the selected (instance, label) pairs through the whole
        chain (reference inference.hpp:2508): roll the selected set up the
        chain, then evaluate level by level passing combined values down."""
        pred_params = self.get_pred_params() if pred_params is None else pred_params
        pred_params.override_with_kwargs(kwargs)
        sel = smat_util.binarized(selected_outputs_csr.tocsr())
        selected_chain = [sel]
        for d in range(self.depth - 1, 0, -1):
            selected_chain.append(smat_util.binarized((selected_chain[-1] @ self.model_chain[d].C).tocsr()))
        selected_chain.reverse()
        pred = None
        for d, model in enumerate(self.model_chain):
            p = pred_params.model_chain[d]
            pred = model.predict_on_selected_outputs(
                X, selected_chain[d], csr_codes=pred, pred_params=copy.deepcopy(p)
            )
        return pred

    # -- model surgery (reference xmc/base.py:1796-1901) -----------------------------
    def set_output_constraint(self, labels_to_keep):
        """Prune the tree bottom-up to only reach labels_to_keep."""
        if self.is_predict_only:
            raise Exception("Model is predict only! set_output_constraint not supported!")
        keep = np.zeros(self.nr_labels, bool)
        keep[np.fromiter(labels_to_keep, dtype=np.int64)] = True
        for model in self.model_chain[::-1]:
            C = model.C.tocsc(copy=True)
            if keep.sum() == C.shape[0]:
                break
            drop = ~keep[C.indices]
            C.data[drop] = 0
            C.eliminate_zeros()
            model.C = C
            model._device_layer = None
            # column liveness: a parent survives iff any of its children survived
            keep = np.asarray((abs(C).sum(axis=0) > 0)).ravel()
        self._compiled = None

    def get_submodel_rooted_at(self, given_depth: int, child_node_id: int, reindex: bool = False):
        """Subtree of child_node_id at given_depth as a HierarchicalMLModel."""
        if self.is_predict_only:
            raise Exception("Model is predict only! get_submodel_rooted_at not supported!")
        subtree_chain = []
        parents = [child_node_id]
        for d in range(given_depth, self.depth):
            sub = self.model_chain[d].get_submodel(selected_codes=parents, reindex=reindex)
            if d == given_depth and not reindex:
                sub["model"] = MLModel(
                    C=sub["model"].C[:, parents], W=sub["model"].W,
                    bias=sub["model"].bias, pred_params=sub["model"].get_pred_params(),
                )
            parents = sub["active_labels"]
            subtree_chain.append(sub["model"])
        submodel = HierarchicalMLModel(subtree_chain)
        return submodel, (parents if reindex else None)

    def split_model_at_depth(self, given_depth: int, reindex: bool = False):
        """Split into a parent model and per-node child subtree models."""
        if self.is_predict_only:
            raise Exception("Model is predict only! split_model_at_depth not supported!")
        if given_depth < 1 or given_depth > self.depth - 1:
            raise ValueError("given_depth must be in [1, depth-1]")
        parent_model = self[:given_depth]
        child_models = []
        for i in range(self.model_chain[given_depth].nr_codes):
            child_models.append(self.get_submodel_rooted_at(given_depth, i, reindex))
        return {"parent_model": parent_model, "child_models": child_models}

    # -- statistics (reference inference.hpp:1387-1463) ------------------------------
    def get_layer_statistics(self):
        """Per-layer nnz quartile statistics of W columns and C columns."""

        def quartiles(v):
            if len(v) == 0:
                return dict(min=0, q1=0, median=0, q3=0, max=0, mean=0.0)
            q = np.percentile(v, [0, 25, 50, 75, 100])
            return dict(
                min=int(q[0]), q1=int(q[1]), median=int(q[2]), q3=int(q[3]), max=int(q[4]),
                mean=float(np.mean(v)),
            )

        stats = []
        for model in self.model_chain:
            stats.append(
                {
                    "nr_labels": model.nr_labels,
                    "nr_codes": model.nr_codes,
                    "w_col_nnz": quartiles(np.diff(model.W.tocsc().indptr)),
                    "c_col_nnz": quartiles(np.diff(model.C.tocsc().indptr)),
                }
            )
        return stats

    def _predict_layer_loop(
        self,
        X,
        csr_codes: Optional[smat.csr_matrix] = None,
        pred_params: Optional["HierarchicalMLModel.PredParams"] = None,
        beam_size: int = 10,
    ) -> smat.csr_matrix:
        """Layer-by-layer predict through MLModel.predict (consistency path)."""
        pred_params = self.get_pred_params() if pred_params is None else pred_params
        pred = csr_codes
        for d, model in enumerate(self.model_chain):
            p = copy.deepcopy(pred_params.model_chain[d])
            if d != self.depth - 1:
                p.only_topk = beam_size
            pred = model.predict(X, csr_codes=pred, pred_params=p)
        return pred
