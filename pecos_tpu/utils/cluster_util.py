"""ClusterChain: the hierarchical label tree container.

Host-side counterpart of the reference's pecos/utils/cluster_util.py (281 LoC).
A chain is a list of sparse matrices ``C_0 .. C_{D-1}`` where ``C_d`` has shape
``(n_nodes[d+1], n_nodes[d])`` mapping each child node at level d+1 to its
parent at level d (exactly one nonzero per row).  ``C_{D-1}`` maps labels to
leaf clusters; ``C_0`` maps level-1 nodes to the root-level nodes.

TPU-specific addition: :meth:`ClusterChain.padded_children` converts a level's
CSC into a fixed-degree children table ``(n_parents, max_children)`` — the
static-shape structure beam search expands over on device.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
import scipy.sparse as smat

from . import smat_util


class ClusterChain(object):
    """Validated list of child->parent assignment matrices (CSC)."""

    def __init__(self, chain: Sequence[smat.spmatrix]):
        if isinstance(chain, ClusterChain):
            chain = chain.chain
        if smat.issparse(chain):
            chain = [chain]
        chain = [smat.csc_matrix(C, dtype=np.float32) for C in chain]
        if len(chain) == 0:
            raise ValueError("empty cluster chain")
        for d in range(1, len(chain)):
            if chain[d].shape[1] != chain[d - 1].shape[0]:
                raise ValueError(
                    f"chain[{d}].shape[1]={chain[d].shape[1]} != chain[{d-1}].shape[0]={chain[d-1].shape[0]}"
                )
        for d, C in enumerate(chain):
            if (np.diff(C.tocsr().indptr) != 1).any():
                raise ValueError(f"chain[{d}] must have exactly one parent per child")
        self.chain: List[smat.csc_matrix] = chain

    # -- basic container protocol ------------------------------------------------
    def __len__(self) -> int:
        return len(self.chain)

    def __getitem__(self, d):
        return self.chain[d]

    def __iter__(self):
        return iter(self.chain)

    def __eq__(self, other) -> bool:
        if not isinstance(other, ClusterChain) or len(self) != len(other):
            return False
        return all(
            A.shape == B.shape and (A != B).nnz == 0 for A, B in zip(self.chain, other.chain)
        )

    @property
    def nr_labels(self) -> int:
        return self.chain[-1].shape[0]

    # -- constructors --------------------------------------------------------------
    @classmethod
    def from_partial_chain(
        cls, C: smat.spmatrix, min_codes: Optional[int] = None, nr_splits: int = 16
    ) -> "ClusterChain":
        """Complete a label->cluster matrix into a full chain by grouping parents
        ``nr_splits`` at a time until the top level has <= min_codes nodes.

        Accepts an existing chain (ClusterChain or list) and passes it through.
        Reference: cluster_util.py:132-175.
        """
        if isinstance(C, (ClusterChain, list, tuple)):
            chain = list(C.chain) if isinstance(C, ClusterChain) else list(C)
        else:
            chain = [smat.csc_matrix(C, dtype=np.float32)]
        if min_codes is None:
            min_codes = nr_splits
        cur = chain[0].shape[1]
        if min_codes <= 1:
            min_codes = cur
        while cur > min_codes:
            n_parent = (cur + nr_splits - 1) // nr_splits
            rows = np.arange(cur)
            cols = rows // nr_splits
            M = smat.csc_matrix(
                (np.ones(cur, dtype=np.float32), (rows, cols)), shape=(cur, n_parent)
            )
            chain.insert(0, M)
            cur = n_parent
        if cur > 1:
            chain.insert(0, smat.csc_matrix(np.ones((cur, 1), dtype=np.float32)))
        return cls(chain)

    @classmethod
    def from_codes(cls, codes: np.ndarray, n_clusters: int) -> smat.csc_matrix:
        """Flat assignment array -> one-hot CSC (n_elements, n_clusters)."""
        n = len(codes)
        return smat.csc_matrix(
            (np.ones(n, dtype=np.float32), (np.arange(n), codes)), shape=(n, n_clusters)
        )

    # -- persistence ---------------------------------------------------------------
    def save(self, folder: str) -> None:
        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, "config.json"), "w") as f:
            json.dump({"len": len(self.chain)}, f)
        for d, C in enumerate(self.chain):
            smat_util.save_matrix(os.path.join(folder, f"C{d}.npz"), C)

    @classmethod
    def load(cls, folder: str) -> "ClusterChain":
        with open(os.path.join(folder, "config.json")) as f:
            cfg = json.load(f)
        chain = [
            smat_util.load_matrix(os.path.join(folder, f"C{d}.npz")) for d in range(cfg["len"])
        ]
        return cls(chain)

    # -- derived chains ------------------------------------------------------------
    def _check_partial_dict(self, M_dict: dict) -> Tuple[int, int]:
        """Validate a partial chain dict keyed by levels-above-leaf (0 = leaf)."""
        nr_labels = self.chain[-1].shape[0]
        if not set(M_dict.keys()) <= set(range(len(self) + 1)):
            raise ValueError("partial chain dict got invalid key")
        nr_insts = [v.shape[0] for v in M_dict.values() if v is not None]
        if len(set(nr_insts)) > 1:
            raise ValueError("partial chain dict first dims do not match")
        if M_dict.get(0, None) is not None and M_dict[0].shape[1] != nr_labels:
            raise ValueError("level-0 matrix must have nr_labels columns")
        for i in range(1, len(self) + 1):
            Mi = M_dict.get(i, None)
            if Mi is not None and Mi.shape[1] != self.chain[-i].shape[1]:
                raise ValueError(f"level-{i} matrix has wrong column count")
        return nr_insts[0], nr_labels

    def generate_matching_chain(self, M_dict: Optional[dict]) -> List[Optional[smat.csc_matrix]]:
        """User-supplied-negative matching chain from a partial dict.

        Keys are levels above the leaf (0 = leaf labels).  Each level's matrix
        is rolled up through the chain and OR-ed (binarized sum) with any
        user-supplied matrix at that level.  Output list is aligned with
        training layers: out[t] has ``C_t.shape[1]`` columns.
        Reference: cluster_util.generate_matching_chain (:205-238).
        """
        out: List[Optional[smat.csc_matrix]] = [None] * (len(self) + 1)
        if M_dict is None or all(v is None for v in M_dict.values()):
            return out[:-1]
        nr_insts, nr_labels = self._check_partial_dict(M_dict)
        if M_dict.get(0, None) is not None:
            out[0] = smat_util.binarized(M_dict[0])
        else:
            out[0] = smat.csc_matrix((nr_insts, nr_labels), dtype=np.float32)
        for i in range(1, len(self) + 1):
            rolled = (out[i - 1] @ self.chain[-i]).tocsc()
            if M_dict.get(i, None) is not None:
                rolled = rolled + smat_util.binarized(M_dict[i])
            out[i] = rolled.tocsc()
            out[i].sort_indices()
        out.reverse()
        return out[:-1]

    def generate_relevance_chain(
        self, R_dict: Optional[dict], norm_type: Optional[str] = None, induce: bool = True
    ) -> List[Optional[smat.csr_matrix]]:
        """Cost-sensitive relevance chain from a partial dict.

        Output aligned with training layers: out[t] matches Y_t's label space.
        Reference: cluster_util.generate_relevance_chain (:240-280).
        """
        out: List[Optional[smat.spmatrix]] = [None] * (len(self) + 1)
        if R_dict is None or all(v is None for v in R_dict.values()):
            return out[1:]
        self._check_partial_dict(R_dict)
        out[0] = R_dict.get(0, None)
        for i in range(1, len(self) + 1):
            if R_dict.get(i, None) is not None:
                out[i] = R_dict[i]
            elif out[i - 1] is not None and induce:
                out[i] = (out[i - 1] @ self.chain[-i]).tocsc()
        out.reverse()
        if norm_type not in (None, "no-norm"):
            out = [
                smat_util.normalize(r.tocsr(), axis=1, norm=norm_type) if r is not None else None
                for r in out
            ]
        return out[1:]

    # -- TPU padded views ----------------------------------------------------------
    def padded_children(self, d: int, pad_child: int = -1) -> Tuple[np.ndarray, int]:
        """Children table for level-d matrix: (n_parents, max_children) int32.

        Entry [p, j] is the j-th child node id of parent p, ``pad_child`` where
        the parent has fewer children.  This is what device beam-search gathers
        to expand a beam: child ids come out in ascending order (deterministic).
        """
        C = self.chain[d].tocsc()
        C.sort_indices()
        n_children, n_parents = C.shape
        counts = np.diff(C.indptr)
        max_c = int(counts.max()) if n_parents else 0
        table = np.full((n_parents, max_c), pad_child, dtype=np.int32)
        rows = np.repeat(np.arange(n_parents), counts)
        offs = np.arange(C.nnz) - np.repeat(C.indptr[:-1], counts)
        table[rows, offs] = C.indices
        return table, max_c

    def parents_of(self, d: int) -> np.ndarray:
        """parent id per child node for level-d matrix, shape (n_children,)."""
        C = self.chain[d].tocsr()
        return C.indices.astype(np.int32)  # one nnz per row
