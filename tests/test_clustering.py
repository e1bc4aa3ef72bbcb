"""Hierarchical k-means property tests.

Mirrors the reference's balance/shape assertions
(test/pecos/xmc/test_xmc.py:56-107): strict +-1 balance at every tree level
and correct chain shapes for variable depth / nr_splits.
"""

import numpy as np
import scipy.sparse as smat

from pecos_tpu.utils.cluster_util import ClusterChain
from pecos_tpu.xmc import HierarchicalKMeans, Indexer, LabelEmbeddingFactory
from pecos_tpu.xmc.clustering import hierarchical_balanced_kmeans


def _feats(L, D, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((L, D)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return X


def test_binary_codes_balance():
    L, depth = 100, 3
    codes = hierarchical_balanced_kmeans(_feats(L, 16), depth, max_iter=10, seed=0)
    assert codes.shape == (L,)
    assert codes.min() >= 0 and codes.max() < 2**depth
    counts = np.bincount(codes, minlength=2**depth)
    assert counts.max() - counts.min() <= 1


def test_balance_every_level():
    L = 37  # odd, prime-ish
    depth = 4
    codes = hierarchical_balanced_kmeans(_feats(L, 8, seed=1), depth, max_iter=5, seed=1)
    for d in range(1, depth + 1):
        level_codes = codes >> (depth - d)
        counts = np.bincount(level_codes, minlength=2**d)
        assert counts.max() - counts.min() <= 1, f"imbalance at level {d}: {counts}"


def test_hierarchicalkmeans_gen_chain_shapes():
    L = 260
    chain = HierarchicalKMeans.gen(_feats(L, 12, seed=2), max_leaf_size=10, nr_splits=4)
    assert isinstance(chain, ClusterChain)
    assert chain[-1].shape[0] == L
    assert chain[0].shape[1] == 1
    for d in range(1, len(chain)):
        assert chain[d].shape[1] == chain[d - 1].shape[0]
    # every node has exactly one parent
    for C in chain:
        assert (np.diff(C.tocsr().indptr) == 1).all()


def test_small_label_set_single_cluster():
    chain = HierarchicalKMeans.gen(_feats(7, 4), max_leaf_size=100)
    assert len(chain) == 1
    assert chain[0].shape == (7, 1)


def test_indexer_dispatch():
    chain = Indexer.gen(_feats(64, 8), indexer_type="hierarchicalkmeans", max_leaf_size=8)
    assert chain.nr_labels == 64


def test_clusters_capture_structure():
    # two well-separated blobs must end up in different top-level clusters
    rng = np.random.default_rng(7)
    a = rng.normal(loc=+5, scale=0.1, size=(32, 6)).astype(np.float32)
    b = rng.normal(loc=-5, scale=0.1, size=(32, 6)).astype(np.float32)
    feats = np.vstack([a, b])
    codes = hierarchical_balanced_kmeans(feats, 1, max_iter=10, seed=0, spherical=False)
    assert len(set(codes[:32])) == 1
    assert len(set(codes[32:])) == 1
    assert codes[0] != codes[-1]


def test_pifa_embeddings():
    rng = np.random.default_rng(0)
    X = smat.random(50, 20, density=0.3, random_state=rng, format="csr", dtype=np.float32)
    Y = smat.random(50, 12, density=0.2, random_state=rng, format="csr", dtype=np.float32)
    emb = LabelEmbeddingFactory.create(Y, X, method="pifa")
    assert emb.shape == (12, 20)
    norms = np.sqrt(np.asarray(emb.multiply(emb).sum(axis=1)).ravel())
    nz = norms > 0
    np.testing.assert_allclose(norms[nz], 1.0, rtol=1e-5)

    pii = LabelEmbeddingFactory.create(Y, method="pii")
    assert pii.shape == (12, 50)


def test_padded_children_table():
    C = smat.csc_matrix(
        (np.ones(6, np.float32), (np.arange(6), np.array([0, 0, 0, 1, 1, 2]))), shape=(6, 3)
    )
    chain = ClusterChain([C])
    table, maxc = chain.padded_children(len(chain.chain) - 1)
    assert maxc == 3
    assert table.shape == (3, 3)
    assert table[0].tolist() == [0, 1, 2]
    assert table[1].tolist() == [3, 4, -1]
    assert table[2].tolist() == [5, -1, -1]


def test_random_projection_clustering():
    """Huge-D label features get sketched before clustering; blob structure
    must survive the projection."""
    from pecos_tpu.xmc.clustering import random_project

    rng = np.random.default_rng(3)
    D = 5000
    # two communities: shared community base vector + per-member sparse noise
    base_a = smat.random(1, 2 * D, density=0.01, random_state=rng, format="csr", dtype=np.float32)
    base_b = smat.random(1, 2 * D, density=0.01, random_state=rng, format="csr", dtype=np.float32)
    members = []
    for base in (base_a, base_b):
        for _ in range(32):
            noise = smat.random(1, 2 * D, density=0.002, random_state=rng, format="csr", dtype=np.float32)
            members.append((base * 3.0 + noise).tocsr())
    feats = smat.vstack(members, format="csr")
    proj = random_project(feats, 64, seed=0)
    assert proj.shape == (64, 64)
    chain = HierarchicalKMeans.gen(
        feats, max_leaf_size=16, nr_splits=2, max_cluster_feature_dim=1000, proj_dim=64
    )
    top = chain[1].tocsr().indices  # node at level 1 per level-2 node... use leaf codes
    # check the level-1 split separates the two communities via leaf rollup
    leaf = chain[-1].tocsr().indices  # parent per label at the leaf level
    M = chain[-1]
    for d in range(len(chain) - 2, 0, -1):
        M = (M @ chain[d]).tocsr()
    top_assign = M.tocsr().indices  # level-1 node per label
    assert len(set(top_assign[:32])) == 1
    assert len(set(top_assign[32:])) == 1
    assert top_assign[0] != top_assign[-1]


def test_non_power_of_two_nr_splits():
    """Reference groups binary-tree leaves nr_splits at a time with integer
    division (cluster_util.py:164), so any nr_splits >= 2 is valid."""
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((100, 8)).astype(np.float32)
    chain = Indexer.gen(feats, nr_splits=5, max_leaf_size=4)
    assert chain.nr_labels == 100
    for C in chain:  # every child has exactly one parent
        assert (np.diff(C.tocsr().indptr) == 1).all()
    # internal out-degree bounded by nr_splits
    for C in chain[:-1]:
        assert np.diff(C.tocsc().indptr).max() <= 5


def test_imbalanced_ratio_splits():
    """imbalanced_ratio > 0 (knob from newer pecos forks, used by reference
    examples/pina params JSONs): the boundary may deviate up to ±ratio·n from
    the median, cut at the widest score gap — so a 24/40 two-community mix
    can split 24/40 rather than 32/32."""
    rng = np.random.default_rng(7)
    a = rng.standard_normal(12).astype(np.float32)
    b = rng.standard_normal(12).astype(np.float32)
    feats = np.vstack(
        [a + 0.05 * rng.standard_normal((24, 12)).astype(np.float32),
         b + 0.05 * rng.standard_normal((40, 12)).astype(np.float32)]
    )
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    codes = hierarchical_balanced_kmeans(
        feats, 1, max_iter=10, seed=0, imbalanced_ratio=0.3
    )
    counts = np.bincount(codes, minlength=2)
    assert sorted(counts.tolist()) == [24, 40], counts
    # side assignment matches the community structure exactly
    assert len(set(codes[:24])) == 1 and len(set(codes[24:])) == 1
    # ratio=0 keeps the strict median split
    codes0 = hierarchical_balanced_kmeans(feats, 1, max_iter=10, seed=0)
    c0 = np.bincount(codes0, minlength=2)
    assert abs(int(c0[0]) - int(c0[1])) <= 1
    # imbalanced_depth=0 disables relaxation even with ratio set
    codes_d = hierarchical_balanced_kmeans(
        feats, 1, max_iter=10, seed=0, imbalanced_ratio=0.3, imbalanced_depth=0
    )
    cd = np.bincount(codes_d, minlength=2)
    assert abs(int(cd[0]) - int(cd[1])) <= 1
