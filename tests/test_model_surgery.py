"""Model surgery + selected-output predict + Platt calibration tests
(reference idioms: test_xlinear.py:1059 topk-vs-selected-output consistency,
output-constraint tests, test_clib.py Platt fit)."""

import numpy as np
import scipy.sparse as smat

from pecos_tpu.xmc.calibration import apply_platt, fit_platt_transform
from pecos_tpu.xmc.xlinear import XLinearModel
from pecos_tpu.xmc import Indexer, LabelEmbeddingFactory


def _model(n=120, d=10, L=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((L, d)).astype(np.float32) * 3
    X = np.vstack(
        [centers[i % L] + rng.standard_normal(d).astype(np.float32) * 0.3 for i in range(n)]
    )
    Y = smat.csr_matrix(
        (np.ones(n, np.float32), (np.arange(n), np.arange(n) % L)), shape=(n, L)
    )
    X = smat.csr_matrix(X)
    chain = Indexer.gen(LabelEmbeddingFactory.create(Y, X, "pifa"), max_leaf_size=2, nr_splits=2)
    return X, Y, XLinearModel.train(X, Y, C=chain, threshold=0.0)


def test_selected_outputs_matches_topk():
    X, Y, xlm = _model()
    # full predict, then re-score exactly the predicted pairs: values must match
    P = xlm.predict(X, beam_size=16, only_topk=4)
    S = xlm.predict_on_selected_outputs(X, P)
    d1 = np.asarray(P.todense())
    d2 = np.asarray(S.todense())
    nz = d1 != 0
    np.testing.assert_allclose(d2[nz], d1[nz], rtol=2e-4, atol=2e-5)


def test_set_output_constraint():
    X, Y, xlm = _model(seed=1)
    keep = [0, 1, 2, 3, 8, 9]
    xlm.set_output_constraint(keep)
    P = xlm.predict(X, beam_size=16, only_topk=16)
    pred_labels = set(P.tocoo().col.tolist())
    assert pred_labels <= set(keep), pred_labels


def test_split_and_submodel():
    X, Y, xlm = _model(seed=2)
    hm = xlm.model
    split = xlm.split_model_at_depth(1, reindex=True)
    parent = split["parent_model"]
    children = split["child_models"]
    assert parent.depth == 1
    assert len(children) == hm.model_chain[1].nr_codes
    # label mappings partition the label space
    all_labels = np.sort(np.concatenate([m for _, m in children]))
    np.testing.assert_array_equal(all_labels, np.arange(Y.shape[1]))
    # each child is a valid chain
    for sub, mapping in children:
        assert sub.nr_labels == len(mapping)


def test_get_submodel_reindex_scores_match():
    X, Y, xlm = _model(seed=3)
    split = xlm.split_model_at_depth(1, reindex=True)
    sub, mapping = split["child_models"][0]
    # within one subtree the upper-level path contribution is a per-query
    # constant, so rankings must agree; use the log post-processor (additive)
    # to avoid float32 underflow of deep products
    P_full = xlm.predict(
        X[:8], beam_size=16, only_topk=Y.shape[1], post_processor="log-l3-hinge"
    )
    P_sub = sub.predict(
        X[:8], beam_size=16, only_topk=len(mapping), post_processor="log-l3-hinge"
    )
    df = np.asarray(P_full.todense())[:, mapping]
    ds = np.asarray(P_sub.todense())
    np.testing.assert_array_equal(np.argsort(-df, axis=1)[:, :3], np.argsort(-ds, axis=1)[:, :3])


def test_platt_fit_recovers_sigmoid():
    rng = np.random.default_rng(0)
    s = rng.uniform(-4, 4, size=2000)
    true_A, true_B = -1.7, 0.4
    p = 1.0 / (1.0 + np.exp(true_A * s + true_B))
    y = (rng.uniform(size=len(s)) < p).astype(np.float64)
    A, B, status = fit_platt_transform(s, y)
    assert status == 0
    assert abs(A - true_A) < 0.25, (A, true_A)
    assert abs(B - true_B) < 0.25, (B, true_B)
    probs = apply_platt(s, A, B)
    assert 0 <= probs.min() and probs.max() <= 1


def test_layer_statistics():
    X, Y, xlm = _model(seed=4)
    stats = xlm.model.get_layer_statistics()
    assert len(stats) == xlm.model.depth
    for st in stats:
        assert st["w_col_nnz"]["max"] >= st["w_col_nnz"]["min"]


def test_compile_mmap_model_fast_load(tmp_path):
    """Compiled predict-only format must reproduce normal predictions
    (reference idiom: test_xlinear.py:1140 test_mmap)."""
    X, Y, xlm = _model(seed=7)
    folder = str(tmp_path / "m")
    compiled = str(tmp_path / "mc")
    xlm.save(folder)
    XLinearModel.compile_mmap_model(folder, compiled)
    loaded = XLinearModel.load(compiled, is_predict_only=True)
    P1 = xlm.predict(X, beam_size=4, only_topk=3)
    P2 = loaded.predict(X, beam_size=4, only_topk=3)
    assert (P1 != P2).nnz == 0
    import pytest as _pytest

    with _pytest.raises(Exception):
        loaded.model.save(str(tmp_path / "nope"))


def test_aux_utils():
    from pecos_tpu.utils.profile_util import MemInfo
    from pecos_tpu.utils.cli import str2bool
    from pecos_tpu.utils.parallel_util import run_parallel
    from pecos_tpu.utils.jax_util import set_seed

    assert "rss" in MemInfo.mem_info()
    assert str2bool("yes") and not str2bool("0")
    assert run_parallel(lambda x: x * 2, [1, 2, 3], num_workers=1) == [2, 4, 6]
    key = set_seed(42)
    assert key is not None


def test_comm_self_test():
    from pecos_tpu.distributed.diagnostic_tools import run_comm_self_test
    from pecos_tpu.distributed.diagnostic_tools.comm_check import run_device_collective_probe
    from pecos_tpu.parallel.comm import DummyComm

    assert run_comm_self_test(DummyComm(), verbose=False) == []
    assert run_device_collective_probe()


def test_lazy_streaming_load_matches_eager(tmp_path):
    """r_lazy analog: streaming per-level upload must reproduce the eager
    compiled model exactly (reference mmap open modes, mmap_util.hpp:345)."""
    from pecos_tpu.xmc.inference import load_compiled_layers

    X, Y, xlm = _model(seed=11)
    folder = str(tmp_path / "m")
    compiled = str(tmp_path / "mc")
    xlm.save(folder)
    XLinearModel.compile_mmap_model(folder, compiled)
    import os

    cdir = os.path.join(compiled, "compiled")
    eager = load_compiled_layers(cdir)
    # budget 0 -> every layer streamed per predict call
    lazy = load_compiled_layers(cdir, lazy=True, resident_budget_bytes=0)
    # partial residency too
    lazy_res = load_compiled_layers(cdir, lazy=True, resident_budget_bytes=1 << 20)
    P1 = eager.predict(X, beam_size=4, only_topk=3)
    P2 = lazy.predict(X, beam_size=4, only_topk=3)
    P3 = lazy_res.predict(X, beam_size=4, only_topk=3)
    assert (P1 != P2).nnz == 0
    assert (P1 != P3).nnz == 0
