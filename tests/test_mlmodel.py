"""Solver + single-layer model tests.

Anchors (reference test idiom, test/pecos/xmc/xlinear/test_xlinear.py):
- solver solution vs sklearn LinearSVC on the same primal objective
  (primal-vs-dual equivalence anchor, :248)
- cost-sensitive equivalence: Cp=2 == R=2 (:21-73)
- device predict vs numpy reference predict consistency (:106)
"""

import numpy as np
import scipy.sparse as smat

from pecos_tpu.xmc import MLModel, MLProblem
from pecos_tpu.xmc.postprocessor import PostProcessor


def _toy_problem(n=120, d=10, L=6, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((L, d)) * 3
    rows, cols = [], []
    X = np.zeros((n, d), np.float32)
    for i in range(n):
        l = i % L
        X[i] = centers[l] + rng.standard_normal(d) * 0.3
        rows.append(i)
        cols.append(l)
    Y = smat.csr_matrix((np.ones(n, np.float32), (rows, cols)), shape=(n, L))
    return smat.csr_matrix(X), Y


def test_train_separable_high_accuracy():
    X, Y = _toy_problem()
    prob = MLProblem(X, Y)
    model = MLModel.train(prob, train_params=MLModel.TrainParams(threshold=0.0))
    P = model.predict(X, only_topk=1, post_processor="noop")
    truth = np.asarray(Y.argmax(axis=1)).ravel()
    pred = np.asarray(P.argmax(axis=1)).ravel()
    acc = (truth == pred).mean()
    assert acc > 0.95, f"train accuracy {acc}"


def test_solver_matches_sklearn():
    # binary problem; compare primal objective value against sklearn LinearSVC
    from sklearn.svm import LinearSVC

    X, Y = _toy_problem(n=80, d=6, L=2, seed=1)
    prob = MLProblem(X, Y)
    tp = MLModel.TrainParams(threshold=0.0, bias=1.0, newton_eps=1e-3, max_newton_iter=50)
    model = MLModel.train(prob, train_params=tp)
    W = np.asarray(model.W.todense())  # (d+1, 2)

    Xd = np.asarray(X.todense())
    Xb = np.hstack([Xd, np.ones((Xd.shape[0], 1), np.float32)])
    for l in range(2):
        y = np.where(np.asarray(Y[:, l].todense()).ravel() > 0, 1.0, -1.0)
        sk = LinearSVC(loss="squared_hinge", C=1.0, fit_intercept=False, tol=1e-6, max_iter=50000)
        sk.fit(Xb, y)
        w_sk = sk.coef_.ravel()

        def obj(w):
            m = Xb @ w
            return 0.5 * w @ w + np.sum(np.maximum(1 - y * m, 0) ** 2)

        ours, theirs = obj(W[:, l]), obj(w_sk)
        assert ours <= theirs * 1.01 + 1e-4, f"label {l}: obj {ours} vs sklearn {theirs}"


def test_cost_sensitive_Cp_equals_R():
    # Cp=2 with no R must equal Cp=1 with R=2 on all positives (reference :21-73)
    X, Y = _toy_problem(n=60, d=8, L=3, seed=2)
    R = Y.copy().tocsc() * 2.0
    tp1 = MLModel.TrainParams(threshold=0.0, Cp=2.0, newton_eps=1e-4, max_newton_iter=50)
    tp2 = MLModel.TrainParams(threshold=0.0, Cp=1.0, newton_eps=1e-4, max_newton_iter=50)
    m1 = MLModel.train(MLProblem(X, Y), train_params=tp1)
    m2 = MLModel.train(MLProblem(X, Y, R=R), train_params=tp2)
    W1 = np.asarray(m1.W.todense())
    W2 = np.asarray(m2.W.todense())
    np.testing.assert_allclose(W1, W2, rtol=1e-3, atol=1e-3)


def test_predict_device_vs_numpy_consistency():
    X, Y = _toy_problem(n=60, d=8, L=8, seed=3)
    C = smat.csc_matrix(
        (np.ones(8, np.float32), (np.arange(8), np.repeat(np.arange(4), 2))), shape=(8, 4)
    )
    prob = MLProblem(X, Y, C=C)
    model = MLModel.train(prob, train_params=MLModel.TrainParams(threshold=0.0))
    for pp in ["noop", "sigmoid", "l3-hinge", "log-l1-hinge"]:
        Pd = model.predict(X, only_topk=4, post_processor=pp)
        Pn = model.predict_numpy(X, only_topk=4, post_processor=pp)
        dd = np.asarray(Pd.todense())
        nn = np.asarray(Pn.todense())
        np.testing.assert_allclose(dd, nn, rtol=2e-4, atol=2e-5, err_msg=f"pp={pp}")


def test_predict_with_csr_codes_consistency():
    X, Y = _toy_problem(n=40, d=8, L=8, seed=4)
    C = smat.csc_matrix(
        (np.ones(8, np.float32), (np.arange(8), np.repeat(np.arange(4), 2))), shape=(8, 4)
    )
    model = MLModel.train(MLProblem(X, Y, C=C), train_params=MLModel.TrainParams(threshold=0.0))
    rng = np.random.default_rng(0)
    # random beam: 2 active clusters per row with values
    codes = np.zeros((X.shape[0], 4), np.float32)
    for i in range(X.shape[0]):
        act = rng.choice(4, size=2, replace=False)
        codes[i, act] = rng.uniform(0.5, 1.0, size=2)
    csr_codes = smat.csr_matrix(codes)
    for pp in ["l3-hinge", "sigmoid", "log-l2-hinge"]:
        Pd = model.predict(X, csr_codes=csr_codes, only_topk=3, post_processor=pp)
        Pn = model.predict_numpy(X, csr_codes=csr_codes, only_topk=3, post_processor=pp)
        np.testing.assert_allclose(
            np.asarray(Pd.todense()), np.asarray(Pn.todense()), rtol=2e-4, atol=2e-5
        )


def test_weight_pruning():
    X, Y = _toy_problem(n=60, d=20, L=4, seed=5)
    tp = MLModel.TrainParams(threshold=0.0, max_nonzeros_per_label=3)
    model = MLModel.train(MLProblem(X, Y), train_params=tp)
    nnz_per_label = np.diff(model.W.tocsc().indptr)
    assert (nnz_per_label <= 3).all()


def test_logistic_solver():
    X, Y = _toy_problem(n=80, d=8, L=4, seed=6)
    tp = MLModel.TrainParams(threshold=0.0, solver_type="L2R_LR_DUAL")
    model = MLModel.train(MLProblem(X, Y), train_params=tp)
    P = model.predict(X, only_topk=1, post_processor="noop")
    truth = np.asarray(Y.argmax(axis=1)).ravel()
    pred = np.asarray(P.argmax(axis=1)).ravel()
    assert (truth == pred).mean() > 0.9


def test_save_load_roundtrip(tmp_path):
    X, Y = _toy_problem(n=30, d=6, L=4)
    model = MLModel.train(MLProblem(X, Y))
    folder = str(tmp_path / "mlmodel")
    model.save(folder)
    loaded = MLModel.load(folder)
    assert (loaded.W != model.W).nnz == 0
    assert (loaded.C != model.C).nnz == 0
    assert loaded.bias == model.bias
    assert loaded.pred_params.post_processor == model.pred_params.post_processor


def test_postprocessor_registry():
    names = PostProcessor.valid_list()
    for expect in ["noop", "sigmoid", "log-sigmoid"] + [
        f"l{p}-hinge" for p in range(1, 5)
    ] + [f"log-l{p}-hinge" for p in range(1, 5)]:
        assert expect in names
    pp = PostProcessor.get("l3-hinge")
    v = np.array([-1.0, 0.5, 2.0])
    np.testing.assert_allclose(pp.transform_np(v), np.exp(-np.maximum(1 - v, 0) ** 3))


def test_bucketed_solver_matches_dense():
    """Cluster-bucketed solver must reproduce the masked-dense solutions
    (same convex problems, gathered instead of masked)."""
    X, Y = _toy_problem(n=120, d=10, L=8, seed=9)
    C = smat.csc_matrix(
        (np.ones(8, np.float32), (np.arange(8), np.repeat(np.arange(4), 2))), shape=(8, 4)
    )
    tp_dense = MLModel.TrainParams(threshold=0.0, solver_mode="dense", newton_eps=1e-3, max_newton_iter=40)
    tp_buck = MLModel.TrainParams(threshold=0.0, solver_mode="bucketed", newton_eps=1e-3, max_newton_iter=40)
    m_dense = MLModel.train(MLProblem(X, Y, C=C), train_params=tp_dense)
    m_buck = MLModel.train(MLProblem(X, Y, C=C), train_params=tp_buck)
    Wd = np.asarray(m_dense.W.todense())
    Wb = np.asarray(m_buck.W.todense())
    np.testing.assert_allclose(Wb, Wd, rtol=5e-3, atol=5e-3)
    Pd = m_dense.predict(X, only_topk=2)
    Pb = m_buck.predict(X, only_topk=2)
    np.testing.assert_allclose(
        np.asarray(Pb.todense()), np.asarray(Pd.todense()), rtol=1e-2, atol=1e-3
    )


def test_bucketed_solver_with_relevance():
    X, Y = _toy_problem(n=60, d=8, L=4, seed=10)
    R = Y.copy().tocsc() * 1.5
    C = smat.csc_matrix(
        (np.ones(4, np.float32), (np.arange(4), np.repeat(np.arange(2), 2))), shape=(4, 2)
    )
    tp1 = MLModel.TrainParams(threshold=0.0, solver_mode="bucketed", Cp=1.5, newton_eps=1e-4, max_newton_iter=50)
    tp2 = MLModel.TrainParams(threshold=0.0, solver_mode="bucketed", Cp=1.0, newton_eps=1e-4, max_newton_iter=50)
    m1 = MLModel.train(MLProblem(X, Y, C=C), train_params=tp1)
    m2 = MLModel.train(MLProblem(X, Y, C=C, R=R), train_params=tp2)
    np.testing.assert_allclose(
        np.asarray(m1.W.todense()), np.asarray(m2.W.todense()), rtol=1e-3, atol=1e-3
    )


def test_bucketed_big_cluster_path_matches_dense(monkeypatch):
    """Force the global sparse-rows (big-cluster) branch on toy data and
    check it reproduces the masked-dense solution (same convex objective)."""
    import pecos_tpu.xmc.base as xmc_base

    X, Y = _toy_problem(n=48, d=12, L=8, seed=5)
    C = smat.csc_matrix(
        (np.ones(8, np.float32), (np.arange(8), np.repeat(np.arange(4), 2))), shape=(8, 4)
    )
    prob = MLProblem(X, Y, C=C)
    tp_dense = MLModel.TrainParams(
        threshold=0.0, solver_mode="dense", newton_eps=1e-4, max_newton_iter=50
    )
    tp_big = MLModel.TrainParams(
        threshold=0.0, solver_mode="bucketed", newton_eps=1e-4, max_newton_iter=50
    )
    m_dense = MLModel.train(prob, train_params=tp_dense)
    monkeypatch.setattr(xmc_base, "_LOCAL_DENSE_BUDGET", 1)  # everything is "big"
    m_big = MLModel.train(prob, train_params=tp_big)
    Wd = np.asarray(m_dense.W.todense())
    Wb = np.asarray(m_big.W.todense())
    assert np.allclose(Wd, Wb, atol=5e-2), np.abs(Wd - Wb).max()


def test_l1_hinge_solver_vs_sklearn():
    """L2R_L1LOSS_SVC_DUAL maps to the smoothed-primal L1 hinge; its solution
    must achieve an exact-hinge objective within ~2% of sklearn's dual solver
    (reference solver: linear_solver.hpp:419-528)."""
    from sklearn.svm import LinearSVC

    X, Y = _toy_problem(n=80, d=6, L=2, seed=2)
    prob = MLProblem(X, Y)
    tp = MLModel.TrainParams(
        threshold=0.0,
        bias=1.0,
        solver_type="L2R_L1LOSS_SVC_DUAL",
        newton_eps=1e-4,
        max_newton_iter=100,
    )
    model = MLModel.train(prob, train_params=tp)
    W = np.asarray(model.W.todense())

    Xd = np.asarray(X.todense())
    Xb = np.hstack([Xd, np.ones((Xd.shape[0], 1), np.float32)])
    for l in range(2):
        y = np.where(np.asarray(Y[:, l].todense()).ravel() > 0, 1.0, -1.0)
        sk = LinearSVC(loss="hinge", C=1.0, fit_intercept=False, tol=1e-6, max_iter=200000)
        sk.fit(Xb, y)

        def hinge_obj(w):
            margins = y * (Xb @ w)
            return 0.5 * (w @ w) + np.maximum(1.0 - margins, 0.0).sum()

        ours, theirs = hinge_obj(W[:, l]), hinge_obj(sk.coef_.ravel())
        assert ours <= theirs * 1.02 + 1e-6, (ours, theirs)


def test_solve_sparse_rows_dense_vs_scatter_layout():
    """solve_sparse_rows has two X layouts — densified MXU matmuls (small
    P*Db) and chunked gather/scatter (huge clusters).  Same Newton-CG driver,
    so the solutions must agree to float tolerance on an identical problem."""
    import jax
    import jax.numpy as jnp

    from pecos_tpu.xmc import solvers

    rng = np.random.default_rng(3)
    P, xcap, Db, ns = 120, 10, 50, 6
    ids = rng.integers(0, Db, size=(P, xcap)).astype(np.int32)
    vals = rng.standard_normal((P, xcap)).astype(np.float32)
    y = np.where(rng.uniform(size=(P, ns)) < 0.25, 1.0, -1.0).astype(np.float32)
    c = np.where(y > 0, 1.0, 0.5).astype(np.float32)
    args = (jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(y), jnp.asarray(c))

    W_dense = np.asarray(solvers.solve_sparse_rows(*args, Db=Db, loss="sqhinge"))
    old = solvers._GLOBAL_DENSE_BUDGET
    try:
        solvers._GLOBAL_DENSE_BUDGET = 0  # force the scatter layout
        jax.clear_caches()  # the layout choice is baked in at trace time
        W_scatter = np.asarray(solvers.solve_sparse_rows(*args, Db=Db, loss="sqhinge"))
    finally:
        solvers._GLOBAL_DENSE_BUDGET = old
        jax.clear_caches()
    assert np.allclose(W_dense, W_scatter, rtol=2e-3, atol=2e-4), (
        np.abs(W_dense - W_scatter).max()
    )
