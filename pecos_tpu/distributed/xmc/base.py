"""Distributed (meta/sub-tree partitioned) clustering.

Rebuild of the reference's tree-partitioned label-space scaling
(pecos/distributed/xmc/base.py:31-524): a small **meta tree** is built over
all labels on the root rank, its leaves define per-subtree label subsets,
each rank builds the sub-trees for its subtrees, and the chains are assembled
back into one ClusterChain whose upper levels are the meta tree and lower
levels the block-diagonal sub-trees (with the bottom layer's rows remapped to
original label ids).

The comm layer is DistComm-shaped (pecos_tpu.parallel.comm): DummyComm for
single-process runs/tests, MultihostComm over jax multihost utilities for
pods.  Device compute inside each rank's Indexer.gen is the batched TPU
k-means (pecos_tpu.xmc.clustering).
"""

from __future__ import annotations

import dataclasses as dc
import logging
import math
from typing import List, Optional

import numpy as np
import scipy.sparse as smat

import pecos_tpu
from pecos_tpu.parallel.comm import DistComm
from pecos_tpu.utils import smat_util
from pecos_tpu.utils.cluster_util import ClusterChain
from pecos_tpu.xmc import HierarchicalKMeans, Indexer, LabelEmbeddingFactory

LOGGER = logging.getLogger(__name__)


def csc_col_nonzero(M: smat.spmatrix) -> List[np.ndarray]:
    """Per-column nonzero row indices (reference smat_util.get_csc_col_nonzero)."""
    M = M.tocsc()
    return [
        np.sort(M.indices[M.indptr[c] : M.indptr[c + 1]]) for c in range(M.shape[1])
    ]


class DistClusterChain(object):
    """Full chain + the depth at which meta-tree ends and sub-trees begin."""

    def __init__(self, cluster_chain: ClusterChain, split_depth: int):
        if not isinstance(cluster_chain, ClusterChain):
            cluster_chain = ClusterChain(cluster_chain)
        if len(cluster_chain) < 2:
            raise ValueError("cluster chain needs >= 2 layers to split")
        if not (1 <= split_depth < len(cluster_chain)):
            raise ValueError(f"bad split_depth {split_depth}")
        self._chain = cluster_chain
        self._split_depth = split_depth
        self._meta_leaf = None

    def get_cluster_chain(self) -> ClusterChain:
        return self._chain

    def get_split_depth(self) -> int:
        return self._split_depth

    def get_num_sub_tree(self) -> int:
        return self._chain[self._split_depth].shape[1]

    def get_nr_splits(self) -> int:
        if len(self._chain) <= 2:
            return self._chain[0].shape[0]
        return self._chain[1].shape[0] // self._chain[0].shape[0]

    def get_avg_leaf_size(self) -> int:
        return max(1, self._chain[-1].shape[0] // self._chain[-2].shape[0])

    def get_meta_tree_chain(self) -> ClusterChain:
        return ClusterChain(self._chain[: self._split_depth])

    def get_meta_tree_leaf_cluster(self) -> smat.csc_matrix:
        """Label -> subtree assignment matrix (compose bottom layers down to
        the split boundary)."""
        if self._meta_leaf is None:
            M = self._chain[-1]
            for d in reversed(range(self._split_depth, len(self._chain) - 1)):
                M = (M @ self._chain[d]).tocsc()
            self._meta_leaf = M.tocsc()
        return self._meta_leaf

    def get_sub_tree_assignment(self, sub_tree_idx: Optional[int] = None):
        assignments = csc_col_nonzero(self.get_meta_tree_leaf_cluster())
        return assignments if sub_tree_idx is None else assignments[sub_tree_idx]

    def get_sub_tree_chain(self, sub_tree_idx: int) -> ClusterChain:
        """Rebuild subtree chain from the bottom layer (reference :125-143):
        slice the leaf cluster to the subtree's labels/clusters, then complete
        upward with from_partial_chain — block-diag assembly keeps cluster ids
        contiguous per subtree, so id//nr_splits grouping reproduces the
        original intermediate levels."""
        nr_splits = self.get_nr_splits()
        leaf = self._chain[-1].tocsr()
        rows = self.get_sub_tree_assignment(sub_tree_idx)
        sub = leaf[rows, :]  # csr: indices are column (cluster) ids
        keep_cols = np.unique(sub.indices)
        sub = sub.tocsc()[:, keep_cols]
        return ClusterChain.from_partial_chain(sub, min_codes=nr_splits, nr_splits=nr_splits)

    def get_meta_Y(self, Y: smat.spmatrix) -> smat.csc_matrix:
        return (Y @ self.get_meta_tree_leaf_cluster()).tocsc()

    def new_instance_re_split(self, min_n_sub_tree: int) -> "DistClusterChain":
        if self._chain[-1].shape[1] < min_n_sub_tree:
            raise ValueError("not enough clusters to split")
        for d in range(1, len(self._chain)):
            if self._chain[d].shape[1] >= min_n_sub_tree:
                break
        return DistClusterChain(self._chain, d)

    @classmethod
    def assemble_from_meta_sub_chain(
        cls, meta_chain: ClusterChain, sub_chains: List[ClusterChain]
    ) -> "DistClusterChain":
        """meta chain (incl. its leaf = label->subtree matrix) + per-subtree
        chains -> one full chain (reference :168-209)."""
        chain = [meta_chain[i] for i in range(len(meta_chain) - 1)]
        split_depth = len(chain)
        assignment = np.concatenate(csc_col_nonzero(meta_chain[-1]))
        n_sub_depth = len(sub_chains[0])
        if any(len(s) != n_sub_depth for s in sub_chains):
            raise ValueError("all sub chains must share depth")
        for d in range(n_sub_depth):
            layer = smat_util.block_diag_csc([s[d] for s in sub_chains])
            if d == n_sub_depth - 1:
                layer = layer.tocsc(copy=True)
                layer.indices = assignment[layer.indices].astype(layer.indices.dtype)
            chain.append(layer)
        return cls(ClusterChain(chain), split_depth)

    @classmethod
    def broadcast(cls, comm: DistComm, dist_chain: Optional["DistClusterChain"], root: int = 0):
        split_depth = comm.bcast(
            dist_chain.get_split_depth() if comm.get_rank() == root else None, root=root
        )
        chain = comm.bcast(
            dist_chain.get_cluster_chain() if comm.get_rank() == root else None, root=root
        )
        return cls(chain, split_depth)


class DistClustering(pecos_tpu.BaseClass):
    """Distributed hierarchical clustering driver (reference :283-524)."""

    @dc.dataclass
    class ClusterParams(pecos_tpu.BaseParams):
        indexer_params: Optional[HierarchicalKMeans.TrainParams] = None
        meta_label_embedding_method: str = "pifa"
        sub_label_embedding_method: str = "pifa"

    @classmethod
    def dist_get_cluster_chain(
        cls,
        X,
        Y,
        dist_comm: DistComm,
        cluster_params: Optional["DistClustering.ClusterParams"] = None,
        min_n_sub_tree: Optional[int] = None,
    ) -> DistClusterChain:
        params = cls.ClusterParams.from_dict(cluster_params)
        indexer_params = HierarchicalKMeans.TrainParams.from_dict(params.indexer_params)
        nr_machines = dist_comm.get_size()
        if min_n_sub_tree is None:
            min_n_sub_tree = nr_machines
        nr_labels = Y.shape[1]
        nr_splits = indexer_params.nr_splits

        # ---- rank 0: meta tree over all labels --------------------------------
        meta_chain = None
        if dist_comm.get_rank() == 0:
            label_feat = LabelEmbeddingFactory.create(
                Y, X, method=params.meta_label_embedding_method
            )
            # meta leaf size: enough leaves for every machine, aligned to the
            # nr_splits tree arithmetic (reference :315-351)
            n_subtrees = nr_splits
            while n_subtrees < min_n_sub_tree:
                n_subtrees *= nr_splits
            meta_leaf_size = max(1, int(math.ceil(nr_labels / n_subtrees)))
            meta_params = HierarchicalKMeans.TrainParams.from_dict(indexer_params.to_dict())
            meta_params.max_leaf_size = meta_leaf_size
            meta_chain = Indexer.gen(label_feat, train_params=meta_params)
        meta_chain = dist_comm.bcast(meta_chain, root=0)
        n_subtrees = meta_chain[-1].shape[1]

        # ---- scatter subtree assignments --------------------------------------
        assignments = csc_col_nonzero(meta_chain[-1])
        my_subtrees = [t for t in range(n_subtrees) if t % nr_machines == dist_comm.get_rank()]

        # ---- each rank: sub-trees over its label subsets ----------------------
        my_chains = {}
        for t in my_subtrees:
            rows = assignments[t]
            Y_sub = Y.tocsc()[:, rows]
            sub_feat = LabelEmbeddingFactory.create(
                Y_sub, X, method=params.sub_label_embedding_method
            )
            sub_params = HierarchicalKMeans.TrainParams.from_dict(indexer_params.to_dict())
            my_chains[t] = Indexer.gen(sub_feat, train_params=sub_params)

        # ---- gather + assemble + broadcast ------------------------------------
        gathered = dist_comm.gather(my_chains, root=0)
        dist_chain = None
        if dist_comm.get_rank() == 0:
            all_chains = {}
            for part in gathered:
                all_chains.update(part)
            sub_list = [all_chains[t] for t in range(n_subtrees)]
            # pad shallow sub-chains to a common depth with identity layers
            max_depth = max(len(s) for s in sub_list)
            sub_list = [_pad_chain_to_depth(s, max_depth) for s in sub_list]
            dist_chain = DistClusterChain.assemble_from_meta_sub_chain(meta_chain, sub_list)
        return DistClusterChain.broadcast(dist_comm, dist_chain, root=0)


def _pad_chain_to_depth(chain: ClusterChain, depth: int) -> ClusterChain:
    """Prepend identity layers so every sub chain has the same depth."""
    mats = list(chain.chain)
    while len(mats) < depth:
        n = mats[0].shape[1]
        mats.insert(0, smat.identity(n, dtype=np.float32, format="csc"))
    return ClusterChain(mats)
