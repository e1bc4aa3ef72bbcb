"""HNSW recall property tests (reference idiom: test/pecos/ann/test_hnsw.py:58-123 —
recall@10 vs exact brute force ~= 1.0 at efS in {50, 75, 100})."""

import os

import numpy as np
import pytest

from pecos_tpu.ann import HNSW


def _data(n=400, nq=50, d=16, seed=0, normalize=True):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d)).astype(np.float32)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    if normalize:
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    return X, Q


def _exact_topk(X, Q, k, metric):
    if metric == "ip":
        d = 1.0 - Q @ X.T
    else:
        d = ((Q[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=1, kind="stable")[:, :k]


def _recall(pred_ids, true_ids):
    hits = 0
    for p, t in zip(pred_ids, true_ids):
        hits += len(set(p.tolist()) & set(t.tolist()))
    return hits / true_ids.size


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_recall_vs_bruteforce(metric):
    """Reference threshold: recall ~= 1.0 +- 0.01 (test_hnsw.py:66-123)."""
    X, Q = _data()
    model = HNSW.train(X, M=16, efC=60, metric_type=metric, max_level_upper_bound=3)
    true_ids = _exact_topk(X, Q, 10, metric)
    for efS in (50, 75, 100):
        ids, dists = model.predict(Q, efS=efS, topk=10)
        rec = _recall(ids, true_ids)
        assert rec >= 0.99, f"metric={metric} efS={efS} recall={rec}"
        # distances must be ascending
        assert (np.diff(dists, axis=1) >= -1e-5).all()


def _sparse_data(n=800, nq=60, d=20000, nnz=32, n_anchor=25, seed=3):
    """Structured sparse rows: anchor prototype (scaled) + row-unique noise —
    the sparse analog of a clustered TF-IDF corpus."""
    import scipy.sparse as smat

    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), nnz)
    cols = rng.integers(0, d, size=n * nnz)
    vals = rng.standard_normal(n * nnz).astype(np.float32)
    noise = smat.csr_matrix((vals, (rows, cols)), shape=(n, d))
    anchors = noise[:n_anchor]
    X = (anchors[rng.integers(0, n_anchor, size=n)].multiply(3.0) + noise).tocsr()
    X = X.astype(np.float32)
    return X, X[:nq]


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_sparse_recall_vs_bruteforce(metric):
    """CSR feature storage at the reference threshold (reference feeds the
    SAME data through drm and csr models and asserts recall ~= 1.0 both ways,
    test_hnsw.py:107-123; its csr distance is the block intersection of
    feat_vectors.hpp:195-340, ours the broadcast id-intersection kernels)."""
    X, Q = _data()
    model = HNSW.train(
        import_csr(X), M=16, efC=60, metric_type=metric,
        max_level_upper_bound=3, data_type="csr",
    )
    assert model._device()[0].feats.__class__.__name__ == "SparseFeats"
    true_ids = _exact_topk(X, Q, 10, metric)
    for efS in (50, 100):
        ids, dists = model.predict(import_csr(Q), efS=efS, topk=10)
        rec = _recall(ids, true_ids)
        assert rec >= 0.99, f"sparse metric={metric} efS={efS} recall={rec}"
        assert (np.diff(dists, axis=1) >= -1e-5).all()


def import_csr(A):
    import scipy.sparse as smat

    return smat.csr_matrix(A)


def test_sparse_highdim_recall():
    """TF-IDF-width CSR (d=20000, infeasible to densify at corpus scale).

    Anchored-cluster sparse rows are near-equidistant within a cluster (noise
    supports barely overlap), so ranking within a cluster carries almost no
    metric signal — recall is tie-aware (ann-benchmarks protocol) and the
    bar is necessarily below the easy-geometry tests above."""
    X, Q = _sparse_data()
    model = HNSW.train(
        X, M=16, efC=100, metric_type="ip", data_type="csr", build_batch_size=256
    )
    Xd = np.asarray(X.todense(), np.float64)
    Qd = np.asarray(Q.todense(), np.float64)
    dall = 1.0 - Qd @ Xd.T
    kth = np.sort(dall, axis=1)[:, 9]
    ids, _ = model.predict(Q, efS=150, topk=10)
    pred_d = np.take_along_axis(dall, ids.astype(np.int64), axis=1)
    rec = float((pred_d <= kth[:, None] + 1e-4).mean())
    assert rec >= 0.9, f"sparse high-dim tie-aware recall={rec}"


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_sparse_lazy_select_matches_cross_matrix(metric):
    """The lazy Alg-4 selection (candidate vs <=M already-selected rows, E*M
    work — the reference's on-demand evaluation order, hnsw.hpp:555-592) must
    pick exactly the same neighbors as the E^2 cross-distance-matrix variant
    it replaced on the sparse build path."""
    import jax.numpy as jnp

    from pecos_tpu.ann.hnsw.graph import (
        _select_sparse_lazy,
        _sparse_cross_dots,
        batch_select_neighbors,
        build_sparse_feats,
    )

    X, _ = _sparse_data(n=300, nq=1, d=2000, nnz=20, seed=9)
    feats = build_sparse_feats(X)
    rng = np.random.default_rng(0)
    B, E, M = 6, 48, 8
    ids = np.stack([rng.choice(300, size=E, replace=False) for _ in range(B)])
    dists = np.sort(rng.uniform(0.1, 2.0, size=(B, E)).astype(np.float32), axis=1)
    ids[:, -5:] = -1  # trailing pad, as search_batch produces
    dists[:, -5:] = 3.4e38
    ids_d, dists_d = jnp.asarray(ids.astype(np.int32)), jnp.asarray(dists)
    lazy_ids, lazy_d = _select_sparse_lazy(feats, ids_d, dists_d, M=M, metric=metric)
    dots = _sparse_cross_dots(feats, ids_d)
    if metric == "ip":
        cross = 1.0 - dots
    else:
        nn = feats.sq[jnp.clip(ids_d, 0, feats.sq.shape[0] - 1)]
        cross = nn[:, :, None] + nn[:, None, :] - 2.0 * dots
    ref_ids, ref_d = batch_select_neighbors(ids_d, dists_d, cross, M=M)
    np.testing.assert_array_equal(np.asarray(lazy_ids), np.asarray(ref_ids))
    np.testing.assert_allclose(np.asarray(lazy_d), np.asarray(ref_d), rtol=1e-6)


def test_pq_guided_build_recall():
    """build_pq="true" forces the PQ-guided level-0 build: insertion searches
    walk packed 4-bit neighbor descriptors (one row gather per popped node)
    and the candidate list is exact-rescored before Alg-4 edge selection
    (hnsw.hpp:1239-1258 rerank semantics applied at build time), so the
    finished graph's recall tracks the exact build."""
    X, Q = _data(n=500, nq=50, d=32, seed=11)
    model = HNSW.train(X, M=16, efC=80, metric_type="l2", build_pq="true")
    true_ids = _exact_topk(X, Q, 10, "l2")
    ids, dists = model.predict(Q, efS=100, topk=10)
    rec = _recall(ids, true_ids)
    assert rec >= 0.97, f"pq-guided build recall={rec}"
    assert (np.diff(dists, axis=1) >= -1e-5).all()


def test_scan_build_recall():
    """build_scan="true" forces the lax.scan megakernel build (upper-level
    points inserted eagerly first, level-0 sweep + refine + reverse-merge as
    scans); graph quality must track the eager build.  Covers the dense,
    dense+PQ-guided and sparse variants at forced-small scale (auto only
    enables the scan at N >= 65536)."""
    X, Q = _data(n=600, nq=50, d=32, seed=13)
    true_ids = _exact_topk(X, Q, 10, "l2")
    for extra in (dict(), dict(build_pq="true", build_pq_min_points=0)):
        model = HNSW.train(
            X, M=16, efC=80, metric_type="l2", build_batch_size=128,
            build_scan="true", **extra,
        )
        ids, _ = model.predict(Q, efS=100, topk=10)
        rec = _recall(ids, true_ids)
        assert rec >= 0.97, f"scan build recall={rec} ({extra})"

    Xs, Qs = _sparse_data(n=500, nq=30, d=4096, seed=14)
    m = HNSW.train(
        Xs, M=8, efC=60, data_type="csr", build_batch_size=128, build_scan="true"
    )
    m_eager = HNSW.train(
        Xs, M=8, efC=60, data_type="csr", build_batch_size=128, build_scan="false"
    )
    i1, _ = m.predict(Qs, efS=60, topk=5)
    i2, _ = m_eager.predict(Qs, efS=60, topk=5)
    # same operating point: the scanned sparse build must stay within a few
    # points of the eager build's agreement with itself
    agree = (np.asarray(i1) == np.asarray(i2)).mean()
    assert agree > 0.6, f"scan/eager sparse overlap {agree}"


def test_sparse_save_load_identical(tmp_path):
    X, Q = _sparse_data(n=300, nq=10, d=4096, seed=4)
    model = HNSW.train(X, M=8, efC=40, data_type="csr", build_batch_size=128)
    folder = str(tmp_path / "hnsw_sparse")
    model.save(folder)
    loaded = HNSW.load(folder)
    import scipy.sparse as smat

    assert smat.issparse(loaded.feats)
    i1, d1 = model.predict(Q, efS=30, topk=5)
    i2, d2 = loaded.predict(Q, efS=30, topk=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5)


def test_save_load_identical(tmp_path):
    X, Q = _data(n=150, nq=10)
    model = HNSW.train(X, M=8, efC=40)
    folder = str(tmp_path / "hnsw")
    model.save(folder)
    loaded = HNSW.load(folder)
    i1, d1 = model.predict(Q, efS=30, topk=5)
    i2, d2 = loaded.predict(Q, efS=30, topk=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_predict_csr_output():
    X, Q = _data(n=100, nq=8)
    model = HNSW.train(X, M=8, efC=40)
    P = model.predict(Q, efS=30, topk=5, ret_csr=True)
    assert P.shape == (8, 100)
    assert (np.diff(P.indptr) == 5).all()


def test_degree_caps():
    X, _ = _data(n=200, nq=1)
    M = 8
    model = HNSW.train(X, M=M, efC=40)
    assert model.neighbors0.shape[1] == 2 * M
    assert (model.neighbors0 >= -1).all() and (model.neighbors0 < 200).all()
    # no self-loops at level 0
    for i in range(200):
        assert i not in set(model.neighbors0[i][model.neighbors0[i] >= 0].tolist())


def test_pq4_recall_with_rerank():
    from pecos_tpu.ann.hnsw.model import HNSWProductQuantizer4Bits

    X, Q = _data(n=300, nq=30, d=32, seed=5)
    model = HNSWProductQuantizer4Bits.train(
        X,
        train_params={
            "hnsw_params": {"M": 16, "efC": 60, "metric_type": "l2", "max_level_upper_bound": 3},
            "num_subspaces": 16,
            "kmeans_iters": 8,
        },
    )
    true_ids = _exact_topk(X, Q, 10, "l2")
    ids, dists = model.predict(Q, efS=80, topk=10, num_rerank=60)
    rec = _recall(ids, true_ids)
    assert rec >= 0.9, f"pq4 recall={rec}"
    assert (np.diff(dists, axis=1) >= -1e-5).all()


def test_pq4_packed_matches_unpacked():
    """Packed neighbor descriptors change the memory layout only: the packed
    search scores the same codes against the same LUT, so predictions must be
    identical to the unpacked kernel."""
    from pecos_tpu.ann.hnsw.model import HNSWProductQuantizer4Bits

    X, Q = _data(n=300, nq=30, d=32, seed=9)
    model = HNSWProductQuantizer4Bits.train(
        X,
        train_params={
            "hnsw_params": {"M": 16, "efC": 60, "metric_type": "l2", "max_level_upper_bound": 3},
            "num_subspaces": 16,
            "kmeans_iters": 8,
        },
    )
    i_un, d_un = model.predict(Q, efS=80, topk=10, num_rerank=60, packed="false")
    i_pk, d_pk = model.predict(Q, efS=80, topk=10, num_rerank=60, packed="true")
    np.testing.assert_array_equal(i_un, i_pk)
    np.testing.assert_allclose(d_un, d_pk, rtol=1e-6)


def test_pq4_save_load(tmp_path):
    from pecos_tpu.ann.hnsw.model import HNSWProductQuantizer4Bits

    X, Q = _data(n=120, nq=5, d=16, seed=6)
    model = HNSWProductQuantizer4Bits.train(
        X, train_params={"hnsw_params": {"M": 8, "efC": 40}, "num_subspaces": 8}
    )
    folder = str(tmp_path / "pq4")
    model.save(folder)
    loaded = HNSWProductQuantizer4Bits.load(folder)
    i1, d1 = model.predict(Q, efS=30, topk=5)
    i2, d2 = loaded.predict(Q, efS=30, topk=5)
    np.testing.assert_array_equal(i1, i2)


def test_pq4_from_hnsw_matches_train():
    """from_hnsw grafts PQ codebooks onto an existing graph: identical graph,
    same codebook training -> identical predictions to a fresh PQ train with
    the same seeds."""
    from pecos_tpu.ann.hnsw.model import HNSW, HNSWProductQuantizer4Bits

    X, Q = _data(n=200, nq=10, d=32, seed=7)
    hnsw = HNSW.train(X, M=8, efC=40, metric_type="l2")
    grafted = HNSWProductQuantizer4Bits.from_hnsw(hnsw, num_subspaces=8, kmeans_iters=6)
    ids, dists = grafted.predict(Q, efS=40, topk=5, num_rerank=30)
    true_ids = _exact_topk(X, Q, 5, "l2")
    assert _recall(ids, true_ids) >= 0.85
    # sparse-feature graphs cannot be PQ-quantized
    import pytest as _pytest
    import scipy.sparse as _smat

    sp = HNSW.train(_smat.csr_matrix(X), M=8, efC=40, data_type="csr")
    with _pytest.raises(ValueError):
        HNSWProductQuantizer4Bits.from_hnsw(sp)


def test_hnsw_cli_end_to_end(tmp_path):
    """Mirror of the reference CLI test (test/pecos/ann/test_hnsw.py:125):
    train via CLI, predict via CLI with -y/-o, check recall output + saved csr."""
    import subprocess
    import sys

    import scipy.sparse as smat

    from pecos_tpu.utils import smat_util

    rng = np.random.default_rng(0)
    X = rng.standard_normal((500, 16)).astype(np.float32)
    Xt = X[:50] + 0.01 * rng.standard_normal((50, 16)).astype(np.float32)
    model_dir = str(tmp_path / "hnsw_model")
    x_path = str(tmp_path / "X.npy")
    xt_path = str(tmp_path / "Xt.npy")
    np.save(x_path, X)
    np.save(xt_path, Xt)
    # ground truth: exact top-10 by l2
    d = ((Xt[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    topk = np.argsort(d, axis=1)[:, :10]
    rows = np.repeat(np.arange(50), 10)
    Y = smat.csr_matrix(
        (np.ones(500, np.float32), (rows, topk.ravel())), shape=(50, 500)
    )
    y_path = str(tmp_path / "Y.npz")
    smat_util.save_matrix(y_path, Y)
    pred_path = str(tmp_path / "pred.npz")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, "-m", "pecos_tpu.ann.hnsw.train",
        "-x", x_path, "-m", model_dir, "--metric-type", "l2",
        "-M", "8", "-efC", "50",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    cmd = [
        sys.executable, "-m", "pecos_tpu.ann.hnsw.predict",
        "-x", xt_path, "-m", model_dir, "-efS", "50", "-k", "10",
        "-y", y_path, "-o", pred_path,
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert "Recall10@10" in r.stdout
    recall = float(r.stdout.split("Recall10@10")[1].split("%")[0])
    assert recall >= 99.0, r.stdout
    P = smat_util.load_matrix(pred_path)
    assert P.shape == (50, 500)


def test_pq_apply_lut_matches_direct_indexing():
    """The select-tree LUT apply must equal sum_s LUT[b, s, c[b, k, s]]."""
    import jax.numpy as jnp

    from pecos_tpu.ann.hnsw.pq import pq_apply_lut

    rng = np.random.default_rng(0)
    B, K, S = 4, 13, 8
    lut = rng.standard_normal((B, S, 16)).astype(np.float32)
    c = rng.integers(0, 16, size=(B, K, S), dtype=np.int32)
    got = np.asarray(pq_apply_lut(jnp.asarray(lut), jnp.asarray(c)))
    s_idx = np.arange(S)
    ref = lut[np.arange(B)[:, None, None], s_idx[None, None, :], c].sum(-1)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_scan_build_partial_refine():
    """refine_fraction < 1 re-searches only the earliest-inserted level-0
    fraction (plus all upper-level points) against the LIVE graph instead of
    rebuilding every node's list; recall must track the full-refine build.
    Also exercises build_intra_k (same-batch candidate merge, on by default
    for dense scan builds) and its off branch."""
    X, Q = _data(n=600, nq=50, d=32, seed=17)
    true_ids = _exact_topk(X, Q, 10, "l2")
    for extra in (
        dict(),
        dict(build_intra_k=0),
        dict(build_pq="true", build_pq_min_points=0),
    ):
        model = HNSW.train(
            X, M=16, efC=80, metric_type="l2", build_batch_size=128,
            build_scan="true", refine_iters=1, refine_fraction=0.3, **extra,
        )
        ids, _ = model.predict(Q, efS=100, topk=10)
        rec = _recall(ids, true_ids)
        assert rec >= 0.97, f"partial-refine scan build recall={rec} ({extra})"
