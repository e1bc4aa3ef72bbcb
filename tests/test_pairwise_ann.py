"""PairwiseANN tests (reference idiom: test_pairwise_ann.py:64 dense-vs-sparse
consistency + exact label-conditioned results)."""

import numpy as np
import scipy.sparse as smat

from pecos_tpu.ann.pairwise import PairwiseANN


def _data(n=60, d=8, L=10, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Y = smat.random(n, L, density=0.25, random_state=rng, format="csr", dtype=np.float32)
    Y.data[:] = rng.uniform(0.1, 1.0, Y.nnz)
    return X, Y


def test_exact_label_conditioned():
    X, Y = _data()
    model = PairwiseANN.train(X, Y, metric_type="ip")
    searchers = model.searchers_create(num_searcher=1)
    label_keys = np.array([0, 3, 7], dtype=np.uint32)
    Q = X[:3]
    I, M, D, V = model.predict(Q, label_keys, searchers, is_same_input=False)
    Yc = Y.tocsc()
    for b, l in enumerate(label_keys):
        rows = Yc.indices[Yc.indptr[l] : Yc.indptr[l + 1]]
        dists = 1.0 - X[rows] @ Q[b]
        order = np.argsort(dists, kind="stable")[: M[b].sum()]
        np.testing.assert_array_equal(np.sort(I[b][M[b] > 0]), np.sort(rows[order]))
        np.testing.assert_allclose(np.sort(D[b][M[b] > 0]), np.sort(dists[order]), rtol=1e-5)
        # Vmat carries Y values of returned rows
        for idx, val, m in zip(I[b], V[b], M[b]):
            if m:
                assert np.isclose(val, Y[idx, l])


def test_dense_sparse_consistency():
    X, Y = _data(seed=1)
    m_dense = PairwiseANN.train(X, Y)
    m_sparse = PairwiseANN.train(smat.csr_matrix(X), Y)
    keys = np.array([1, 2, 5, 5], dtype=np.uint32)
    Q = X[:4]
    out_d = m_dense.predict(Q, keys)
    out_s = m_sparse.predict(smat.csr_matrix(Q), keys)
    for a, b in zip(out_d, out_s):
        np.testing.assert_allclose(a, b, rtol=1e-5)


def test_is_same_input():
    X, Y = _data(seed=2)
    model = PairwiseANN.train(X, Y)
    keys = np.array([0, 1, 2], dtype=np.uint32)
    out1 = model.predict(X[:1], keys, is_same_input=True)
    out2 = model.predict(np.vstack([X[0]] * 3), keys, is_same_input=False)
    for a, b in zip(out1, out2):
        np.testing.assert_allclose(a, b)


def test_save_load(tmp_path):
    X, Y = _data(seed=3)
    model = PairwiseANN.train(X, Y)
    folder = str(tmp_path / "pw")
    model.save(folder)
    loaded = PairwiseANN.load(folder)
    keys = np.array([4, 6], dtype=np.uint32)
    for a, b in zip(model.predict(X[:2], keys), loaded.predict(X[:2], keys)):
        np.testing.assert_allclose(a, b)


def test_empty_label_column():
    X, Y = _data(seed=4)
    Y = Y.tolil()
    Y[:, 5] = 0
    Y = smat.csr_matrix(Y)
    model = PairwiseANN.train(X, Y)
    I, M, D, V = model.predict(X[:1], np.array([5], dtype=np.uint32))
    assert M.sum() == 0
