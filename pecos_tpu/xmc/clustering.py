"""TPU-native hierarchical balanced spherical 2-means + label embeddings.

Replaces the reference's C++/OpenMP recursive clustering
(pecos/core/utils/clustering.hpp:404-503) with a *batched* formulation: at tree
level d all 2^d nodes are split simultaneously.  The per-node work — scoring
every member against the difference of the two tentative centers and splitting
at the median rank (clustering.hpp:202-212, "rank-based balancing") — becomes:

- one segment-sum to form all 2^{d+1} centers at once,
- one gathered row-wise dot product for all labels at once,
- one global two-key sort (node id, score) whose within-node rank yields the
  balanced side assignment.

Everything is static-shape and jit-compiled per level; the level loop runs in
Python over a static depth (~log2(L/max_leaf_size)).

Balance semantics match the reference (strictly balanced rank-split):
each split puts ceil(n/2) labels with the larger scores into the right child.
"""

from __future__ import annotations

import dataclasses as dc
import functools
import logging
import math
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as smat

import pecos_tpu
from pecos_tpu.utils import smat_util
from pecos_tpu.utils.cluster_util import ClusterChain

LOGGER = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# core batched level split
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_nodes_max", "n_iter", "spherical"))
def _level_split(
    feats: jax.Array,  # (L, D) float32
    codes: jax.Array,  # (L,) int32 node id in [0, n_nodes_max)
    key: jax.Array,
    sample_rate: jax.Array,  # scalar float in (0, 1]
    imbalanced_ratio: jax.Array,  # scalar float in [0, 0.5)
    *,
    n_nodes_max: int,
    n_iter: int,
    spherical: bool,
) -> jax.Array:
    """Split every node into two balanced halves; returns codes at next level.

    ``n_nodes_max`` is the segment-space capacity (2^(depth-1) for the whole
    tree): early levels simply leave most segments empty, so ONE compiled
    kernel serves every level — remote compiles through the TPU tunnel cost
    30-240 s each, and per-level shapes would pay that depth times.

    ``imbalanced_ratio`` > 0 relaxes the strict median split: the boundary
    rank may land anywhere within ±ratio·n of the median, chosen at the
    largest score gap in that window (natural cluster boundary).  This is the
    `imbalanced_ratio` knob newer pecos forks expose (see
    examples/pina/scripts/params/*.json); 0 reproduces the reference's strict
    rank-based balancing (clustering.hpp:202-212).  Traced as a scalar, so
    changing it never recompiles.
    """
    L = feats.shape[0]
    n_nodes = n_nodes_max
    k_init, k_sample = jax.random.split(key)

    counts_node = jax.ops.segment_sum(jnp.ones((L,), jnp.float32), codes, num_segments=n_nodes)

    def balanced_side(score: jax.Array) -> jax.Array:
        # sort by (node, score) ascending; within-node rank >= boundary -> side 1
        idx = jnp.arange(L, dtype=jnp.int32)
        sorted_codes, sorted_score, sorted_idx = jax.lax.sort((codes, score, idx), num_keys=2)
        starts = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(counts_node)])[:-1]
        rank = jnp.arange(L, dtype=jnp.float32) - starts[sorted_codes]
        n_of_node = counts_node[sorted_codes]
        median = jnp.ceil(0.5 * n_of_node)
        # widest-gap boundary within the allowed imbalance window
        lo = jnp.maximum(jnp.ceil((0.5 - imbalanced_ratio) * n_of_node), 1.0)
        hi = jnp.minimum(jnp.floor((0.5 + imbalanced_ratio) * n_of_node), n_of_node - 1.0)
        same_node = jnp.concatenate(
            [jnp.zeros((1,), jnp.bool_), sorted_codes[1:] == sorted_codes[:-1]]
        )
        gap = jnp.concatenate([jnp.zeros((1,)), sorted_score[1:] - sorted_score[:-1]])
        eligible = same_node & (rank >= lo) & (rank <= hi)
        gval = jnp.where(eligible, gap, -jnp.inf)
        gmax = jax.ops.segment_max(gval, sorted_codes, num_segments=n_nodes)
        is_best = eligible & (gval >= gmax[sorted_codes])
        first_best = jax.ops.segment_min(
            jnp.where(is_best, rank, jnp.float32(L + 1)), sorted_codes, num_segments=n_nodes
        )
        boundary_node = jnp.where(jnp.isfinite(gmax) & (first_best <= L), first_best, 0.0)
        boundary = jnp.where(
            (imbalanced_ratio > 0) & (boundary_node[sorted_codes] > 0),
            boundary_node[sorted_codes],
            median,
        )
        side_sorted = (rank >= boundary).astype(jnp.int32)
        side = jnp.zeros((L,), jnp.int32).at[sorted_idx].set(side_sorted)
        return side

    # init: balanced split along a random direction per node (random hyperplane)
    dirs = jax.random.normal(k_init, (n_nodes, feats.shape[1]), dtype=feats.dtype)
    side = balanced_side(jnp.sum(feats * dirs[codes], axis=1))

    # optional subsampling of points used to form centers (clustering.hpp:150-168)
    w_sample = jnp.where(
        jax.random.uniform(k_sample, (L,)) < sample_rate, 1.0, 0.0
    ).astype(feats.dtype)

    def body(_, side):
        cluster = codes * 2 + side
        sums = jax.ops.segment_sum(feats * w_sample[:, None], cluster, num_segments=2 * n_nodes)
        cnts = jax.ops.segment_sum(w_sample, cluster, num_segments=2 * n_nodes)
        centers = sums / jnp.maximum(cnts, 1.0)[:, None]
        if spherical:
            norm = jnp.linalg.norm(centers, axis=1, keepdims=True)
            centers = centers / jnp.maximum(norm, 1e-12)
        diff = centers[1::2] - centers[0::2]  # (n_nodes, D)
        score = jnp.sum(feats * diff[codes], axis=1)
        return balanced_side(score)

    side = jax.lax.fori_loop(0, n_iter, body, side)
    return codes * 2 + side


def hierarchical_balanced_kmeans(
    feats: np.ndarray,
    depth: int,
    *,
    max_iter: int = 20,
    spherical: bool = True,
    seed: int = 0,
    sample_rates: Optional[np.ndarray] = None,
    imbalanced_ratio: float = 0.0,
    imbalanced_depth: int = 100,
) -> np.ndarray:
    """Run `depth` levels of batched balanced binary (spherical) k-means.

    Returns leaf codes in [0, 2**depth).  With imbalanced_ratio=0 (default)
    per-node sizes differ by at most 1 across the whole tree (strict
    balance); otherwise levels shallower than ``imbalanced_depth`` may split
    up to ±ratio off the median, at the widest score gap.
    """
    feats_d = jnp.asarray(feats, dtype=jnp.float32)
    codes = jnp.zeros((feats.shape[0],), dtype=jnp.int32)
    key = jax.random.PRNGKey(seed)
    n_nodes_max = 2 ** max(depth - 1, 0)
    for d in range(depth):
        key, sub = jax.random.split(key)
        rate = 1.0 if sample_rates is None else float(sample_rates[d])
        ratio = float(imbalanced_ratio) if d < imbalanced_depth else 0.0
        codes = _level_split(
            feats_d,
            codes,
            sub,
            jnp.float32(rate),
            jnp.float32(min(max(ratio, 0.0), 0.49)),
            n_nodes_max=n_nodes_max,
            n_iter=max_iter,
            spherical=spherical,
        )
    return np.asarray(jax.device_get(codes))


def sample_schedule(depth: int, do_sample: bool, min_rate: float, max_rate: float, warmup_ratio: float):
    """Per-level center-subsampling rates (reference ClusteringSampler,
    clustering.hpp:150-168): min_rate during the warmup fraction of levels,
    then linear ramp up to max_rate at the last level."""
    if not do_sample:
        return None
    warmup = int(math.ceil(warmup_ratio * depth))
    rates = np.full(depth, max_rate, dtype=np.float64)
    for d in range(depth):
        if d < warmup:
            rates[d] = min_rate
        else:
            t = (d - warmup) / max(depth - warmup - 1, 1)
            rates[d] = min_rate + t * (max_rate - min_rate)
    return np.clip(rates, 0.0, 1.0)


def random_project(feat_mat, proj_dim: int, seed: int = 0, block: int = 65536) -> np.ndarray:
    """Seeded gaussian sketch of (possibly sparse) features to proj_dim dims.

    Computed blockwise over the feature axis so the dense projection matrix
    never exceeds (block, proj_dim); rows are L2-normalized afterwards so
    spherical k-means sees the same geometry scale.
    """
    L, D = feat_mat.shape
    out = np.zeros((L, proj_dim), np.float32)
    rng = np.random.default_rng(seed)
    A = feat_mat.tocsc() if smat.issparse(feat_mat) else np.asarray(feat_mat, np.float32)
    scale = 1.0 / np.sqrt(proj_dim)
    for s in range(0, D, block):
        e = min(s + block, D)
        R = (rng.standard_normal((e - s, proj_dim)) * scale).astype(np.float32)
        if smat.issparse(A):
            out += np.asarray((A[:, s:e] @ R), np.float32)
        else:
            out += A[:, s:e] @ R
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


# ---------------------------------------------------------------------------
# HierarchicalKMeans / Indexer (reference pecos/xmc/base.py:39-238)
# ---------------------------------------------------------------------------


class HierarchicalKMeans(pecos_tpu.BaseClass):
    """B-ary hierarchical clustering built from grouped binary levels."""

    @dc.dataclass
    class TrainParams(pecos_tpu.BaseParams):
        nr_splits: int = 16
        min_codes: Optional[int] = None
        max_leaf_size: int = 100
        # TPU extra: label features with more dims than this are sketched with
        # a seeded gaussian random projection before clustering (cosine
        # geometry approximately preserved; the batched k-means then runs on a
        # dense (L, proj_dim) matrix regardless of the raw feature width)
        max_cluster_feature_dim: int = 100_000
        proj_dim: int = 512
        # relaxed-balance splits (knob from newer pecos forks — see reference
        # examples/pina/scripts/params/*.json): a split may deviate up to
        # ±imbalanced_ratio from the median, cut at the widest score gap;
        # only levels shallower than imbalanced_depth are relaxed
        imbalanced_ratio: float = 0.0
        imbalanced_depth: int = 100
        spherical: bool = True
        seed: int = 0
        kmeans_max_iter: int = 20
        threads: int = -1  # accepted for API parity; TPU path ignores it
        do_sample: bool = False
        max_sample_rate: float = 1.0
        min_sample_rate: float = 0.1
        warmup_ratio: float = 0.4
        verbose: int = 0

    @classmethod
    def gen(
        cls,
        feat_mat: Union[np.ndarray, smat.spmatrix],
        train_params: Optional["HierarchicalKMeans.TrainParams"] = None,
        **kwargs,
    ) -> ClusterChain:
        params = cls.TrainParams.from_dict(train_params)
        params.override_with_kwargs(kwargs)
        # nr_splits need not be a power of 2: the binary tree is built to
        # max_leaf_size depth and upper levels group leaves nr_splits at a
        # time, exactly the reference recipe (xmc/base.py:191,
        # cluster_util.py:164 `cur_codes // nr_splits`)
        if params.nr_splits < 2:
            raise ValueError(f"nr_splits must be >= 2, got {params.nr_splits}")
        nr_labels = feat_mat.shape[0]
        if nr_labels <= params.max_leaf_size:
            return ClusterChain(
                [smat.csc_matrix(np.ones((nr_labels, 1), dtype=np.float32))]
            )
        depth = max(1, int(math.ceil(math.log2(nr_labels / params.max_leaf_size))))
        if 2**depth > nr_labels:
            depth = int(math.floor(math.log2(nr_labels)))
        D = feat_mat.shape[1]
        if D > params.max_cluster_feature_dim:
            LOGGER.info(
                f"projecting label features {D} -> {params.proj_dim} dims for clustering"
            )
            feats = random_project(feat_mat, params.proj_dim, seed=params.seed)
        elif smat.issparse(feat_mat):
            feats = np.asarray(feat_mat.todense(), dtype=np.float32)
        else:
            feats = np.asarray(feat_mat, dtype=np.float32)
        rates = sample_schedule(
            depth, params.do_sample, params.min_sample_rate, params.max_sample_rate, params.warmup_ratio
        )
        codes = hierarchical_balanced_kmeans(
            feats,
            depth,
            max_iter=params.kmeans_max_iter,
            spherical=params.spherical,
            seed=params.seed,
            sample_rates=rates,
            imbalanced_ratio=params.imbalanced_ratio,
            imbalanced_depth=params.imbalanced_depth,
        )
        C = ClusterChain.from_codes(codes, 2**depth)
        min_codes = params.min_codes if params.min_codes is not None else params.nr_splits
        return ClusterChain.from_partial_chain(C, min_codes=min_codes, nr_splits=params.nr_splits)


class Indexer(pecos_tpu.BaseClass):
    """String-dispatched indexer registry (reference pecos/xmc/base.py:39-69)."""

    indexer_dict = {"hierarchicalkmeans": HierarchicalKMeans}

    @classmethod
    def gen(cls, feat_mat, indexer_type: str = "hierarchicalkmeans", **kwargs) -> ClusterChain:
        if indexer_type not in cls.indexer_dict:
            raise ValueError(f"unknown indexer type {indexer_type!r}")
        return cls.indexer_dict[indexer_type].gen(feat_mat, **kwargs)


# ---------------------------------------------------------------------------
# Label embeddings (reference pecos/xmc/base.py:1903-2094)
# ---------------------------------------------------------------------------


class LabelEmbeddingFactory(object):
    @staticmethod
    def create(Y=None, X=None, Z=None, method: str = "pifa", **kwargs):
        method = method.lower()
        if method == "pifa":
            return LabelEmbeddingFactory.pifa(Y, X)
        elif method == "pifa_lf_concat":
            return LabelEmbeddingFactory.pifa_lf_concat(Y, X, Z)
        elif method == "pifa_lf_convex_combine":
            return LabelEmbeddingFactory.pifa_lf_convex_combine(
                Y, X, Z, alpha=kwargs.get("alpha", 0.5)
            )
        elif method == "pii":
            return LabelEmbeddingFactory.pii(Y)
        raise ValueError(f"unknown label embedding method {method!r}")

    @staticmethod
    def pifa(Y, X):
        """Positive Instance Feature Aggregation: l2-normalized rows of Y^T X.

        Both sparse: parallel native SpGEMM (spgemm_util, the reference's
        spmm_mat_t role, matrix.hpp:740) — the Y^T X product touches every
        training nonzero and dominates index-build time at Wiki-500K scale."""
        if smat.issparse(Y) and smat.issparse(X):
            from pecos_tpu.utils.spgemm_util import spgemm_atb

            emb = spgemm_atb(Y, X)
        else:
            YT = Y.T.tocsr() if smat.issparse(Y) else smat.csr_matrix(np.asarray(Y).T)
            emb = YT @ X
        return smat_util.normalize(emb, axis=1, norm="l2")

    @staticmethod
    def pifa_lf_concat(Y, X, Z):
        pifa = LabelEmbeddingFactory.pifa(Y, X)
        Zn = smat_util.normalize(Z, axis=1, norm="l2")
        if smat.issparse(pifa) or smat.issparse(Zn):
            return smat_util.hstack_csr([pifa, Zn])
        return np.hstack([pifa, Zn])

    @staticmethod
    def pifa_lf_convex_combine(Y, X, Z, alpha: float = 0.5):
        pifa = LabelEmbeddingFactory.pifa(Y, X)
        Zn = smat_util.normalize(Z, axis=1, norm="l2")
        if smat.issparse(pifa):
            pifa = np.asarray(pifa.todense())
        if smat.issparse(Zn):
            Zn = np.asarray(Zn.todense())
        if pifa.shape[1] != Zn.shape[1]:
            raise ValueError("pifa_lf_convex_combine requires matching feature dims")
        return alpha * pifa + (1.0 - alpha) * Zn

    @staticmethod
    def pii(Y):
        """Positive Instance Indices: l2-normalized rows of Y^T."""
        YT = Y.T.tocsr() if smat.issparse(Y) else smat.csr_matrix(np.asarray(Y).T)
        return smat_util.normalize(YT, axis=1, norm="l2")
