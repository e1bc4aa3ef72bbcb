import numpy as np
import scipy.sparse as smat

from pecos_tpu.utils import smat_util


def _rand_csr(n, d, density=0.2, seed=0):
    rng = np.random.default_rng(seed)
    M = smat.random(n, d, density=density, random_state=rng, format="csr", dtype=np.float32)
    return M


def test_sorted_csr_topk():
    A = smat.csr_matrix(
        np.array([[0.5, 0.0, 2.0, 1.0], [0.0, 0.0, 0.0, 0.0], [3.0, 1.0, 2.0, 0.0]], np.float32)
    )
    S = smat_util.sorted_csr(A, only_topk=2)
    assert S.indptr.tolist() == [0, 2, 2, 4]
    # row 0: top2 = cols 2 (2.0), 3 (1.0)
    assert S.indices[:2].tolist() == [2, 3]
    assert S.data[:2].tolist() == [2.0, 1.0]


def test_topk_csr_from_dense_matches_sorted_csr():
    rng = np.random.default_rng(1)
    X = rng.standard_normal((10, 20)).astype(np.float32)
    ours = smat_util.topk_csr_from_dense(X, 5)
    ref = smat_util.sorted_csr(smat.csr_matrix(X), only_topk=5)
    assert (ours != ref).nnz == 0


def test_padded_roundtrip():
    A = _rand_csr(13, 31, seed=3)
    P = smat_util.csr_to_padded(A)
    B = smat_util.padded_to_csr(P)
    assert (A != B).nnz == 0


def test_csr_from_topk_arrays():
    idx = np.array([[2, 0, -1], [-1, -1, -1]], np.int64)
    val = np.array([[0.9, 0.1, 0.0], [0.0, 0.0, 0.0]], np.float32)
    C = smat_util.csr_from_topk_arrays(idx, val, 4)
    assert C.shape == (2, 4)
    assert C.nnz == 2
    assert C[0, 2] == np.float32(0.9)


def test_metrics_generate():
    tY = smat.csr_matrix(np.array([[1, 0, 1, 0], [0, 1, 0, 0]], np.float32))
    # predictions: row0 ranks [2, 1], row1 ranks [1, 0]
    pY = smat.csr_matrix(np.array([[0, 0.5, 0.9, 0], [0.3, 0.8, 0, 0]], np.float32))
    m = smat_util.Metrics.generate(tY, pY, topk=2)
    # P@1: row0 hit (label 2), row1 hit (label 1) -> 1.0
    assert np.isclose(m.prec[0], 1.0)
    # P@2: row0 second pred label1 miss, row1 second pred label0 miss -> (1/2 + 1/2)/2
    assert np.isclose(m.prec[1], 0.5)
    # R@2: row0 1/2, row1 1/1
    assert np.isclose(m.recall[1], 0.75)


def test_normalize_sparse_dense_agree():
    A = _rand_csr(8, 10, seed=5)
    d = smat_util.normalize(np.asarray(A.todense()), norm="l2")
    s = smat_util.normalize(A, norm="l2")
    np.testing.assert_allclose(np.asarray(s.todense()), d, rtol=1e-5)


def test_save_load_roundtrip(tmp_path):
    A = _rand_csr(5, 7)
    p = str(tmp_path / "mat.npz")
    smat_util.save_matrix(p, A)
    B = smat_util.load_matrix(p)
    assert (A != B).nnz == 0
    X = np.arange(6, dtype=np.float32).reshape(2, 3)
    p2 = str(tmp_path / "arr.npy")
    smat_util.save_matrix(p2, X)
    Y = smat_util.load_matrix(p2)
    np.testing.assert_array_equal(X, Y)


def test_cocluster_spectral_embeddings():
    rng = np.random.default_rng(0)
    # two block communities
    A = np.zeros((40, 30), np.float32)
    A[:20, :15] = rng.uniform(0.5, 1.0, (20, 15))
    A[20:, 15:] = rng.uniform(0.5, 1.0, (20, 15))
    A += rng.uniform(0, 0.05, A.shape)
    re, ce = smat_util.get_cocluster_spectral_embeddings(smat.csr_matrix(A), dim=2)
    assert re.shape == (40, 2) and ce.shape == (30, 2)
    # first dimension separates the two row blocks
    s0 = np.sign(re[:20, 0]).mean()
    s1 = np.sign(re[20:, 0]).mean()
    assert abs(s0 - s1) > 1.5, (s0, s1)


def test_native_spgemm_matches_scipy():
    """Parallel SpGEMM (Y^T X for PIFA) vs scipy, canonical CSR
    (reference role: clib.sparse_matmul / matrix.hpp:740 spmm_mat_t)."""
    import scipy.sparse as smat

    from pecos_tpu.utils.spgemm_util import spgemm_atb

    rng = np.random.default_rng(4)
    Y = smat.random(300, 50, density=0.05, random_state=rng, format="csc", dtype=np.float32)
    X = smat.random(300, 80, density=0.1, random_state=rng, format="csr", dtype=np.float32)
    Z = spgemm_atb(Y, X, threads=2)
    Z_ref = (Y.T @ X).tocsr()
    Z_ref.sort_indices()
    assert Z.shape == Z_ref.shape
    np.testing.assert_allclose(
        np.asarray(Z.todense()), np.asarray(Z_ref.todense()), rtol=1e-5, atol=1e-6
    )
