"""PairwiseANN: label-conditioned exact k-NN.

Reference behavior (pecos/core/ann/pairwise.hpp:117-295, python face
pecos/ann/pairwise/model.py:35-301): store the training features X and the
label matrix Y; a query is a (feature vector, label key) pair — score the
training rows that carry that label, return top-k with (index, mask,
distance, label-value) arrays.

TPU re-design: Y's columns become a padded label->rows table; a whole batch
of (query, label) pairs is answered with one gather + batched distance +
top-k on device.  The reference's Searchers (pre-allocated C++ workers) shrink
to a params holder kept only for API parity.
"""

from __future__ import annotations

import dataclasses as dc
import functools
import json
import os
import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as smat

import pecos_tpu
from pecos_tpu.utils import smat_util


@functools.partial(jax.jit, static_argnames=("metric", "topk"))
def _pairwise_predict(
    Q,  # (B, D)
    feats,  # (N, D)
    rows,  # (B, cap) int32 training-row candidates (-1 padded)
    vals,  # (B, cap) float32 label values
    *,
    metric: str,
    topk: int,
):
    F = feats[jnp.clip(rows, 0, feats.shape[0] - 1)]  # (B, cap, D)
    dots = jnp.einsum("bkd,bd->bk", F, Q, preferred_element_type=jnp.float32)
    if metric == "ip":
        d = 1.0 - dots
    else:
        qq = jnp.sum(Q * Q, axis=1, keepdims=True)
        xx = jnp.sum(F * F, axis=-1)
        d = qq + xx - 2.0 * dots
    big = jnp.float32(3.4e38)
    d = jnp.where(rows >= 0, d, big)
    neg_top, idx = jax.lax.top_k(-d, min(topk, d.shape[1]))
    I = jnp.take_along_axis(rows, idx, axis=1)
    D = -neg_top
    V = jnp.take_along_axis(vals, idx, axis=1)
    M = (I >= 0) & (D < big * 0.5)
    return jnp.where(M, I, 0), M, jnp.where(M, D, 0.0), jnp.where(M, V, 0.0)


class PairwiseANN(pecos_tpu.BaseClass):
    @dc.dataclass
    class TrainParams(pecos_tpu.BaseParams):
        metric_type: str = "ip"

    @dc.dataclass
    class PredParams(pecos_tpu.BaseParams):
        batch_size: int = 1024
        only_topk: int = 10
        num_searcher: int = 1  # parity only

    class Searchers(object):
        """API-parity holder (no C workers to pre-allocate on TPU)."""

        def __init__(self, model, pred_params, num_searcher=1):
            self.model = model
            self.pred_params = pred_params

    def __init__(self, feats, Y, metric: str, pred_params=None):
        self.feats = np.asarray(feats, np.float32)
        self.Y = Y.tocsc().astype(np.float32)
        self.metric = metric
        self.pred_params = self.PredParams.from_dict(pred_params)
        # padded label -> training rows table
        nnz = np.diff(self.Y.indptr)
        L = self.Y.shape[1]
        cap = max(int(nnz.max()) if L else 0, 1)
        self._rows = np.full((L, cap), -1, np.int32)
        self._vals = np.zeros((L, cap), np.float32)
        r = np.repeat(np.arange(L), nnz)
        o = np.arange(self.Y.nnz) - np.repeat(self.Y.indptr[:-1], nnz)
        self._rows[r, o] = self.Y.indices
        self._vals[r, o] = self.Y.data
        self._feats_d = None
        self._rows_d = None
        self._vals_d = None

    @property
    def num_input_keys(self):
        return self.feats.shape[0]

    @property
    def num_label_keys(self):
        return self.Y.shape[1]

    @property
    def feat_dim(self):
        return self.feats.shape[1]

    @classmethod
    def train(cls, X, Y, train_params=None, pred_params=None, **kwargs) -> "PairwiseANN":
        params = cls.TrainParams.from_dict(train_params)
        params.override_with_kwargs(kwargs)
        feats = np.asarray(X.todense(), np.float32) if smat.issparse(X) else np.asarray(X, np.float32)
        return cls(feats, Y.tocsc(), params.metric_type, pred_params=pred_params)

    def searchers_create(self, pred_params=None, num_searcher=1):
        pred_params = self.get_pred_params() if pred_params is None else self.PredParams.from_dict(pred_params)
        return self.Searchers(self, pred_params, num_searcher)

    def get_pred_params(self):
        import copy

        return copy.deepcopy(self.pred_params)

    def _device(self):
        if self._feats_d is None:
            self._feats_d = jnp.asarray(self.feats)
            self._rows_d = jnp.asarray(self._rows)
            self._vals_d = jnp.asarray(self._vals)
        return self._feats_d, self._rows_d, self._vals_d

    def predict(self, input_feat, label_keys, searchers=None, is_same_input=False, **kwargs):
        """Returns (Imat, Mmat, Dmat, Vmat), each (batch, topk) — the reference
        contract (pecos/ann/pairwise/model.py:241-301)."""
        pred_params = (
            searchers.pred_params if searchers is not None else self.get_pred_params()
        )
        pred_params.override_with_kwargs(kwargs)
        Q = (
            np.asarray(input_feat.todense(), np.float32)
            if smat.issparse(input_feat)
            else np.asarray(input_feat, np.float32)
        )
        if not isinstance(label_keys, np.ndarray):
            raise TypeError("label_keys must be np.ndarray")
        if Q.shape[1] != self.feat_dim:
            raise ValueError(f"input feat dim {Q.shape[1]} != {self.feat_dim}")
        B = label_keys.shape[0]
        if is_same_input:
            Q = np.broadcast_to(Q[0], (B, Q.shape[1]))
        elif Q.shape[0] != B:
            raise ValueError("input_feat rows != label_keys length")
        feats_d, rows_d, vals_d = self._device()
        keys = jnp.asarray(label_keys.astype(np.int32))
        I, M, D, V = _pairwise_predict(
            jnp.asarray(Q),
            feats_d,
            rows_d[keys],
            vals_d[keys],
            metric=self.metric,
            topk=pred_params.only_topk,
        )
        topk = pred_params.only_topk
        out = []
        for arr, dtype in ((I, np.uint32), (M, np.uint32), (D, np.float32), (V, np.float32)):
            a = np.asarray(arr)
            if a.shape[1] < topk:  # pad when cap < topk
                pad = np.zeros((B, topk - a.shape[1]), a.dtype)
                a = np.hstack([a, pad])
            out.append(a.astype(dtype))
        return tuple(out)

    # -- persistence ---------------------------------------------------------------
    def save(self, model_folder: str):
        os.makedirs(model_folder, exist_ok=True)
        param = self.append_meta(
            {
                "model": type(self).__name__,
                "metric": self.metric,
                "pred_kwargs": self.pred_params.to_dict(),
            }
        )
        with open(os.path.join(model_folder, "param.json"), "w") as f:
            json.dump(param, f, indent=True)
        np.save(os.path.join(model_folder, "feats.npy"), self.feats)
        smat_util.save_matrix(os.path.join(model_folder, "Y.npz"), self.Y)

    @classmethod
    def load(cls, model_folder: str, lazy_load: bool = False) -> "PairwiseANN":
        with open(os.path.join(model_folder, "param.json")) as f:
            param = json.load(f)
        feats = np.load(os.path.join(model_folder, "feats.npy"))
        Y = smat_util.load_matrix(os.path.join(model_folder, "Y.npz"))
        return cls(
            feats,
            Y,
            param["metric"],
            pred_params={
                k: v
                for k, v in param.get("pred_kwargs", {}).items()
                if k in ("batch_size", "only_topk", "num_searcher")
            },
        )
