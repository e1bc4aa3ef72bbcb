"""HNSW model: batch-parallel build + TPU-batched search.

API parity with the reference (pecos/ann/hnsw/model.py:33-269): TrainParams
(M=32, efC=100, metric ip/l2), PredParams (efS=100, topk=10), predict returns
(indices, distances) arrays or a csr matrix; save/load as param.json + arrays.

Build strategy (see graph.py docstring): deterministic growing batches replace
lock-based parallel insertion; every batch's candidate searches run as one
device call.  Dense features only in this layer — sparse (TF-IDF) queries are
densified per batch; a blocked-sparse distance kernel is the planned
optimization.
"""

from __future__ import annotations

import dataclasses as dc
import json
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as smat

import pecos_tpu
from pecos_tpu.utils import smat_util
from .graph import (
    DeviceGraph,
    batch_greedy_descent,
    batch_search_level,
    batch_select_neighbors,
    pairwise_dist,
)

LOGGER = logging.getLogger(__name__)


class HNSW(pecos_tpu.BaseClass):
    @dc.dataclass
    class TrainParams(pecos_tpu.BaseParams):
        M: int = 32
        efC: int = 100
        max_level_upper_bound: int = 5
        metric_type: str = "ip"  # ip | l2
        max_M: Optional[int] = None  # upper-level degree cap, default M
        max_M0: Optional[int] = None  # level-0 degree cap, default 2*M
        seed: int = 0
        threads: int = -1  # parity only
        build_batch_size: int = 2048

    @dc.dataclass
    class PredParams(pecos_tpu.BaseParams):
        efS: int = 100
        topk: int = 10
        threads: int = -1  # parity only

    def __init__(
        self,
        feats: np.ndarray,
        neighbors0: np.ndarray,
        upper_neighbors: np.ndarray,
        node_levels: np.ndarray,
        entry_point: int,
        metric: str,
        pred_params=None,
    ):
        self.feats = feats  # (N, D) float32 host copy
        self.neighbors0 = neighbors0  # (N, maxM0) int32
        self.upper_neighbors = upper_neighbors  # (max_level, N, maxM) int32
        self.node_levels = node_levels  # (N,) int32
        self.entry_point = int(entry_point)
        self.metric = metric
        self.pred_params = self.PredParams.from_dict(pred_params)
        self._dev: Optional[Tuple[DeviceGraph, list]] = None

    # -- device residency -------------------------------------------------------
    def _device(self):
        if self._dev is None:
            feats_d = jnp.asarray(self.feats)
            g0 = DeviceGraph(feats_d, jnp.asarray(self.neighbors0), self.metric)
            uppers = [
                DeviceGraph(feats_d, jnp.asarray(self.upper_neighbors[l]), self.metric)
                for l in range(self.upper_neighbors.shape[0])
            ]
            self._dev = (g0, uppers)
        return self._dev

    # -- train ------------------------------------------------------------------
    @classmethod
    def train(cls, X, train_params=None, pred_params=None, **kwargs) -> "HNSW":
        params = cls.TrainParams.from_dict(train_params)
        params.override_with_kwargs(kwargs)
        feats = np.asarray(X.todense(), np.float32) if smat.issparse(X) else np.asarray(X, np.float32)
        N, D = feats.shape
        M = params.M
        maxM = params.max_M or M
        maxM0 = params.max_M0 or 2 * M
        rng = np.random.default_rng(params.seed)

        # geometric level assignment (hnsw.hpp:785-794)
        mult = 1.0 / np.log(max(M, 2))
        levels = np.minimum(
            (-np.log(rng.uniform(size=N, low=1e-12)) * mult).astype(np.int32),
            params.max_level_upper_bound,
        )
        levels[0] = levels.max()  # first point anchors the top level
        max_level = int(levels.max())

        neighbors0 = np.full((N, maxM0), -1, np.int32)
        uppers = np.full((max_level, N, maxM), -1, np.int32)  # level l stored at uppers[l-1]
        entry = 0

        feats_d = jnp.asarray(feats)
        metric = params.metric_type

        # Device mirrors of the FULL-SIZE padded graph arrays.  Shapes never
        # change across insertion batches (unfrozen nodes simply have no
        # incoming edges yet), so every search compiles exactly once per
        # query-batch bucket; host-side edits sync as row scatters.
        dev_n0 = jnp.asarray(neighbors0)
        dev_up = [jnp.asarray(uppers[l]) for l in range(max_level)]

        def search_frozen(q_idx: np.ndarray, entry_: int):
            """Search the frozen graph for batch points; returns (B, efC) ids."""
            Q = feats_d[jnp.asarray(q_idx)]
            B = len(q_idx)
            cur = jnp.full((B,), entry_, jnp.int32)
            for l in range(max_level, 0, -1):
                g = DeviceGraph(feats_d, dev_up[l - 1], metric)
                cur = batch_greedy_descent(g, Q, cur, max_steps=64)
            g0 = DeviceGraph(feats_d, dev_n0, metric)
            ids, dists = batch_search_level(
                g0, Q, cur[:, None], ef=params.efC, max_steps=4 * params.efC
            )
            return np.asarray(ids), np.asarray(dists)

        def _dists_to(node: int, others: np.ndarray) -> np.ndarray:
            if metric == "l2":
                return ((feats[others] - feats[node]) ** 2).sum(axis=1)
            return 1.0 - feats[others] @ feats[node]

        def prune_to_closest(nbr_list: np.ndarray, node: int, cap: int) -> np.ndarray:
            """Keep the cap closest neighbors on reverse-edge overflow.

            Measured on 50K x 128d gaussians: the full Alg-4 heuristic for
            reverse edges tripled build time with zero recall change, so the
            simple distance prune is used here (forward edges still use the
            heuristic via batch_select_neighbors)."""
            valid = nbr_list[nbr_list >= 0]
            out = np.full(nbr_list.shape[0], -1, np.int32)
            if len(valid) <= cap:
                out[: len(valid)] = valid
                return out
            d = _dists_to(node, valid)
            keep = valid[np.argsort(d, kind="stable")[:cap]]
            out[: len(keep)] = keep
            return out

        # growing insertion batches, padded to power-of-two buckets so each
        # bucket size compiles once
        inserted = 1  # point 0 is the initial graph
        bs = 32
        while inserted < N:
            batch = np.arange(inserted, min(inserted + bs, N))
            bucket = max(32, 1 << (len(batch) - 1).bit_length())
            q_idx = np.concatenate([batch, np.zeros(bucket - len(batch), np.int64)])
            ids_d, dists_d = search_frozen(q_idx, entry)
            # Alg.4 select-neighbors for the whole batch on device
            cand_feats = feats_d[jnp.clip(jnp.asarray(ids_d), 0, N - 1)]
            cross = jax.vmap(lambda F: pairwise_dist(F, F, metric))(cand_feats)
            sel_all = np.asarray(
                batch_select_neighbors(
                    jnp.asarray(ids_d), jnp.asarray(dists_d), cross, M=M
                )
            )[: len(batch)]
            changed0: set = set()
            changed_up = [set() for _ in range(max_level)]
            for bi, p in enumerate(batch):
                sel = sel_all[bi]
                sel = sel[sel >= 0].astype(np.int32)
                # connect at every level up to the point's level
                for l in range(min(int(levels[p]), max_level) + 1):
                    if l == 0:
                        arr, cap, changed = neighbors0, maxM0, changed0
                    else:
                        arr, cap, changed = uppers[l - 1], maxM, changed_up[l - 1]
                    if l > 0:
                        lv = sel[levels[sel] >= l]
                    else:
                        lv = sel
                    lv = lv[:cap]
                    arr[p, : len(lv)] = lv
                    changed.add(int(p))
                    # reverse edges with simple prune on overflow
                    for n in lv:
                        row = arr[n]
                        slot = np.argmax(row < 0) if (row < 0).any() else -1
                        if slot >= 0 and row[slot] < 0:
                            row[slot] = p
                        else:
                            cand_rev = np.concatenate([row, [p]]).astype(np.int32)
                            arr[n] = prune_to_closest(cand_rev, n, cap)[:cap]
                        changed.add(int(n))
                if levels[p] > levels[entry]:
                    entry = int(p)
            # sync changed rows to the device mirrors (incremental scatter)
            if changed0:
                rows = np.fromiter(changed0, np.int32)
                dev_n0 = dev_n0.at[jnp.asarray(rows)].set(jnp.asarray(neighbors0[rows]))
            for l in range(max_level):
                if changed_up[l]:
                    rows = np.fromiter(changed_up[l], np.int32)
                    dev_up[l] = dev_up[l].at[jnp.asarray(rows)].set(
                        jnp.asarray(uppers[l][rows])
                    )
            inserted = batch[-1] + 1
            bs = min(params.build_batch_size, max(32, inserted))

        model = cls(
            feats,
            neighbors0,
            uppers,
            levels,
            entry,
            metric,
            pred_params=pred_params,
        )
        return model

    # -- predict ------------------------------------------------------------------
    def predict(
        self, X, pred_params=None, ret_csr: bool = False, **kwargs
    ):
        params = self.get_pred_params() if pred_params is None else self.PredParams.from_dict(pred_params)
        params.override_with_kwargs(kwargs)
        efS, topk = params.efS, params.topk
        Q = np.asarray(X.todense(), np.float32) if smat.issparse(X) else np.asarray(X, np.float32)
        B = Q.shape[0]
        g0, uppers = self._device()
        Qd = jnp.asarray(Q)
        cur = jnp.full((B,), self.entry_point, jnp.int32)
        for l in range(len(uppers), 0, -1):
            cur = batch_greedy_descent(uppers[l - 1], Qd, cur, max_steps=64)
        ids, dists = batch_search_level(
            g0, Qd, cur[:, None], ef=max(efS, topk), max_steps=4 * max(efS, topk)
        )
        ids = np.asarray(ids)[:, :topk]
        dists = np.asarray(dists)[:, :topk]
        if ret_csr:
            return smat_util.csr_from_topk_arrays(
                ids.astype(np.int64), -dists.astype(np.float32), self.feats.shape[0]
            )
        return ids, dists

    def get_pred_params(self):
        import copy

        return copy.deepcopy(self.pred_params)

    # -- persistence ---------------------------------------------------------------
    def save(self, folder: str):
        os.makedirs(folder, exist_ok=True)
        param = self.append_meta(
            {
                "model": type(self).__name__,
                "metric": self.metric,
                "entry_point": self.entry_point,
                "pred_kwargs": self.pred_params.to_dict(),
            }
        )
        with open(os.path.join(folder, "param.json"), "w") as f:
            json.dump(param, f, indent=True)
        np.savez(
            os.path.join(folder, "graph.npz"),
            feats=self.feats,
            neighbors0=self.neighbors0,
            upper_neighbors=self.upper_neighbors,
            node_levels=self.node_levels,
        )

    @classmethod
    def load(cls, folder: str) -> "HNSW":
        with open(os.path.join(folder, "param.json")) as f:
            param = json.load(f)
        z = np.load(os.path.join(folder, "graph.npz"))
        return cls(
            z["feats"],
            z["neighbors0"],
            z["upper_neighbors"],
            z["node_levels"],
            param["entry_point"],
            param["metric"],
            pred_params={
                k: v
                for k, v in param.get("pred_kwargs", {}).items()
                if k in ("efS", "topk", "threads")
            },
        )


class HNSWProductQuantizer4Bits(pecos_tpu.BaseClass):
    """HNSW with PQ4-quantized level-0 scoring + exact rerank.

    Reference: pecos/core/ann/hnsw.hpp:976-1335 — train a plain HNSW, quantize
    L0 features (16 centroids/subspace, 4 bits/code), search with the
    per-query LUT, rerank the top num_rerank exactly (:1239-1258).  The
    reference supports dense-L2 only (:1000-1003); the TPU LUT gather is
    metric-agnostic so ip is supported too.
    """

    @dc.dataclass
    class TrainParams(pecos_tpu.BaseParams):
        hnsw_params: Optional["HNSW.TrainParams"] = None
        num_subspaces: int = 64
        kmeans_iters: int = 10
        seed: int = 0

    @dc.dataclass
    class PredParams(pecos_tpu.BaseParams):
        efS: int = 100
        topk: int = 10
        num_rerank: int = 100
        threads: int = -1

    def __init__(self, hnsw: HNSW, pq, pred_params=None):
        self.hnsw = hnsw
        self.pq = pq
        self.pred_params = self.PredParams.from_dict(pred_params)
        self._codes_d = None

    @classmethod
    def train(cls, X, train_params=None, pred_params=None, **kwargs) -> "HNSWProductQuantizer4Bits":
        from .pq import train_pq4

        params = cls.TrainParams.from_dict(train_params)
        params.override_with_kwargs(kwargs)
        hnsw = HNSW.train(X, train_params=params.hnsw_params)
        pq = train_pq4(
            hnsw.feats,
            num_subspaces=params.num_subspaces,
            iters=params.kmeans_iters,
            seed=params.seed,
        )
        return cls(hnsw, pq, pred_params=pred_params)

    def predict(self, X, pred_params=None, **kwargs):
        from .graph import batch_greedy_descent, batch_search_level_pq
        from .pq import build_lut

        params = self.get_pred_params() if pred_params is None else self.PredParams.from_dict(pred_params)
        params.override_with_kwargs(kwargs)
        Q = np.asarray(X.todense(), np.float32) if smat.issparse(X) else np.asarray(X, np.float32)
        B = Q.shape[0]
        g0, uppers = self.hnsw._device()
        if self._codes_d is None:
            self._codes_d = jnp.asarray(self.pq.codes)
        Qd = jnp.asarray(Q)
        cur = jnp.full((B,), self.hnsw.entry_point, jnp.int32)
        for l in range(len(uppers), 0, -1):
            cur = batch_greedy_descent(uppers[l - 1], Qd, cur, max_steps=64)
        lut = jnp.asarray(build_lut(self.pq, Q, self.hnsw.metric))
        ef = max(params.efS, params.num_rerank, params.topk)
        ids, approx = batch_search_level_pq(
            self._codes_d,
            g0.neighbors,
            lut,
            cur[:, None],
            ef=ef,
            max_steps=4 * ef,
        )
        # exact rerank of the top num_rerank (hnsw.hpp:1239-1258)
        from .graph import gather_dist

        top = jnp.asarray(np.asarray(ids)[:, : params.num_rerank])
        exact = gather_dist(Qd, g0.feats, jnp.clip(top, 0, g0.feats.shape[0] - 1), self.hnsw.metric)
        exact = jnp.where(top >= 0, exact, jnp.float32(3.4e38))
        neg_top, pos = jax.lax.top_k(-exact, min(params.topk, exact.shape[1]))
        out_ids = np.asarray(jnp.take_along_axis(top, pos, axis=1))
        out_d = np.asarray(-neg_top)
        return out_ids, out_d

    def get_pred_params(self):
        import copy

        return copy.deepcopy(self.pred_params)

    def save(self, folder: str):
        os.makedirs(folder, exist_ok=True)
        self.hnsw.save(os.path.join(folder, "hnsw"))
        np.savez(
            os.path.join(folder, "pq.npz"),
            codebooks=self.pq.codebooks,
            codes=self.pq.codes,
            dim=np.int64(self.pq.dim),
        )
        with open(os.path.join(folder, "param.json"), "w") as f:
            json.dump(self.append_meta({"pred_kwargs": self.pred_params.to_dict()}), f)

    @classmethod
    def load(cls, folder: str) -> "HNSWProductQuantizer4Bits":
        from .pq import ProductQuantizer4Bits

        hnsw = HNSW.load(os.path.join(folder, "hnsw"))
        z = np.load(os.path.join(folder, "pq.npz"))
        pq = ProductQuantizer4Bits(
            codebooks=z["codebooks"], codes=z["codes"], dim=int(z["dim"])
        )
        with open(os.path.join(folder, "param.json")) as f:
            param = json.load(f)
        return cls(
            hnsw,
            pq,
            pred_params={
                k: v
                for k, v in param.get("pred_kwargs", {}).items()
                if k in ("efS", "topk", "num_rerank", "threads")
            },
        )
