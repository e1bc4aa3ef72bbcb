"""Distributed XR-Linear training: meta model on rank 0, sub-tree models
across ranks, reconstruction into one model.

Reference: pecos/distributed/xmc/xlinear/model.py —
- XLinearLoadBalancer (:27-257): workload ~= sum nnz(Y cols) * log(avg leaf),
  order-preserving bin packing, main node discounted by main_workload_factor.
- DistTraining (:259-617): rank0 trains the meta HierarchicalMLModel, every
  rank trains its assigned sub-tree models, workers ship models to rank0,
  rank0 reconstructs (XLinearModel.reconstruct_model).
"""

from __future__ import annotations

import dataclasses as dc
import logging
from typing import List, Optional, Sequence

import numpy as np
import scipy.sparse as smat

import pecos_tpu
from pecos_tpu.parallel.comm import DistComm
from pecos_tpu.utils import smat_util
from pecos_tpu.xmc import HierarchicalMLModel, MLModel, MLProblem
from pecos_tpu.xmc.xlinear import XLinearModel
from ..base import DistClusterChain, DistClustering

LOGGER = logging.getLogger(__name__)


class XLinearLoadBalancer(object):
    """Order-preserving workload partition of subtrees onto machines."""

    def __init__(self, main_workload_factor: float = 0.3):
        self.main_workload_factor = main_workload_factor

    @staticmethod
    def subtree_workloads(Y: smat.spmatrix, dist_chain: DistClusterChain) -> np.ndarray:
        """workload_t ~= sum of nnz(Y columns in subtree t) * log(avg leaf size)."""
        Y = Y.tocsc()
        col_nnz = np.diff(Y.indptr)
        log_leaf = max(1.0, np.log(max(2, dist_chain.get_avg_leaf_size())))
        return np.array(
            [
                col_nnz[rows].sum() * log_leaf
                for rows in dist_chain.get_sub_tree_assignment()
            ],
            dtype=np.float64,
        )

    def partition(self, workloads: np.ndarray, n_machines: int) -> List[List[int]]:
        """Contiguous (order-preserving) partition; machine 0 gets a reduced
        share because it also trains the meta model."""
        n = len(workloads)
        weights = np.ones(n_machines)
        weights[0] = self.main_workload_factor
        targets = workloads.sum() * weights / weights.sum()
        jobs: List[List[int]] = [[] for _ in range(n_machines)]
        m = 0
        acc = 0.0
        for t in range(n):
            jobs[m].append(t)
            acc += workloads[t]
            while m < n_machines - 1 and acc >= targets[: m + 1].sum():
                m += 1
        return jobs


class DistributedXLinearModel(pecos_tpu.BaseClass):
    """Drop-in distributed trainer producing a standard XLinearModel."""

    @dc.dataclass
    class TrainParams(pecos_tpu.BaseParams):
        hlm_args: Optional[HierarchicalMLModel.TrainParams] = None
        main_workload_factor: float = 0.3
        min_n_sub_tree: Optional[int] = None

    @classmethod
    def train(
        cls,
        X,
        Y,
        dist_comm: DistComm,
        cluster_params=None,
        train_params: Optional["DistributedXLinearModel.TrainParams"] = None,
        pred_params=None,
        dist_chain: Optional[DistClusterChain] = None,
        **kwargs,
    ) -> Optional[XLinearModel]:
        """Returns the reconstructed XLinearModel on rank 0, None elsewhere."""
        params = cls.TrainParams.from_dict(train_params)
        rank = dist_comm.get_rank()
        size = dist_comm.get_size()

        if dist_chain is None:
            dist_chain = DistClustering.dist_get_cluster_chain(
                X, Y, dist_comm, cluster_params, min_n_sub_tree=params.min_n_sub_tree
            )

        n_subtrees = dist_chain.get_num_sub_tree()
        assignments = dist_chain.get_sub_tree_assignment()
        Y_csc = Y.tocsc()

        # ---- workload balance --------------------------------------------------
        balancer = XLinearLoadBalancer(params.main_workload_factor)
        workloads = balancer.subtree_workloads(Y_csc, dist_chain)
        jobs = balancer.partition(workloads, size)
        my_jobs = jobs[rank]

        # ---- rank 0: meta model ------------------------------------------------
        meta_model = None
        if rank == 0:
            meta_Y = dist_chain.get_meta_Y(Y_csc)
            meta_chain = dist_chain.get_meta_tree_chain()
            LOGGER.info(f"rank0 training meta model over {meta_Y.shape[1]} subtree roots")
            meta_prob = MLProblem(X, meta_Y)
            meta_model = HierarchicalMLModel.train(
                meta_prob,
                clustering=meta_chain,
                train_params=params.hlm_args,
                pred_params=pred_params,
                **kwargs,
            )

        # ---- all ranks: sub-tree models ---------------------------------------
        # each sub model sees only the instances carrying its subtree's labels
        # (reference _train_sub_models, distributed/xmc/xlinear/model.py:436-470)
        X_csr = X.tocsr() if smat.issparse(X) else smat.csr_matrix(X)
        my_models = {}
        for t in my_jobs:
            rows = assignments[t]
            sub_chain = dist_chain.get_sub_tree_chain(t)
            Y_sub = Y_csc[:, rows].tocsr()
            inst = np.nonzero(np.diff(Y_sub.indptr) > 0)[0]
            if inst.size == 0:
                inst = np.arange(min(1, Y_sub.shape[0]))
            X_sub = X_csr[inst]
            Y_sub = Y_sub[inst].tocsc()
            LOGGER.info(
                f"rank{rank} training subtree {t} ({len(rows)} labels, {len(inst)} instances)"
            )
            prob = MLProblem(X_sub, Y_sub)
            my_models[t] = HierarchicalMLModel.train(
                prob,
                clustering=sub_chain,
                train_params=params.hlm_args,
                pred_params=pred_params,
                **kwargs,
            )

        gathered = dist_comm.gather(my_models, root=0)
        if rank != 0:
            return None
        all_models = {}
        for part in gathered:
            all_models.update(part)
        sub_models = [all_models[t] for t in range(n_subtrees)]
        return cls.reconstruct(meta_model, sub_models, assignments)

    @staticmethod
    def reconstruct(
        meta_model: HierarchicalMLModel,
        sub_models: Sequence[HierarchicalMLModel],
        assignments: Sequence[np.ndarray],
    ) -> XLinearModel:
        """Merge: meta chain + per-level block-diag of sub models; the bottom
        layer's label columns are mapped back to original label ids
        (reference reconstruct_model, pecos/xmc/xlinear/model.py:356)."""
        depth_sub = sub_models[0].depth
        if any(s.depth != depth_sub for s in sub_models):
            raise ValueError("sub models must share depth")
        assignment_arr = np.concatenate(list(assignments))
        nr_labels = len(assignment_arr)
        chain = list(meta_model.model_chain)
        for d in range(depth_sub):
            Ws = [s.model_chain[d].W for s in sub_models]
            Cs = [s.model_chain[d].C for s in sub_models]
            W = smat_util.hstack_csc(Ws)
            C = smat_util.block_diag_csc([c.tocsc() for c in Cs])
            if d == depth_sub - 1:
                # permute columns of W (labels) and rows of C back to original ids
                perm = np.empty(nr_labels, dtype=np.int64)
                perm[assignment_arr] = np.arange(nr_labels)
                W = W.tocsc()[:, perm]
                C = C.tocsc(copy=True)
                C.indices = assignment_arr[C.indices].astype(C.indices.dtype)
                # transposing the row remap: rebuild with remapped rows
                C = smat.csc_matrix(
                    (C.data, C.indices, C.indptr), shape=(nr_labels, C.shape[1])
                )
                C.sort_indices()
            chain.append(
                MLModel(
                    W=W,
                    C=C,
                    bias=sub_models[0].model_chain[d].bias,
                    pred_params=sub_models[0].model_chain[d].get_pred_params(),
                )
            )
        return XLinearModel(HierarchicalMLModel(chain))
