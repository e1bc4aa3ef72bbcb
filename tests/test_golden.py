"""Golden-file regression tests (reference idiom: test_xlinear.py:314 —
train on checked-in toy data, compare predictions to stored golden npz)."""

import os

import numpy as np

from pecos_tpu.utils import smat_util
from pecos_tpu.xmc import Indexer, LabelEmbeddingFactory
from pecos_tpu.xmc.xlinear import XLinearModel

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def test_golden_regression():
    X = smat_util.load_feature_matrix(os.path.join(DATA, "X.trn.npz"))
    Y = smat_util.load_label_matrix(os.path.join(DATA, "Y.trn.npz"))
    Xt = smat_util.load_feature_matrix(os.path.join(DATA, "X.tst.npz"))
    Yt = smat_util.load_label_matrix(os.path.join(DATA, "Y.tst.npz"))
    golden = smat_util.load_matrix(os.path.join(DATA, "Yt_pred.golden.npz"))
    golden_prec = np.load(os.path.join(DATA, "golden_prec.npy"))

    chain = Indexer.gen(
        LabelEmbeddingFactory.create(Y, X, method="pifa"),
        max_leaf_size=4,
        nr_splits=2,
        seed=11,
    )
    model = XLinearModel.train(X, Y, C=chain, threshold=0.0)
    P = model.predict(Xt, beam_size=8, only_topk=5)

    m = smat_util.Metrics.generate(Yt, P, topk=5)
    np.testing.assert_allclose(m.prec, golden_prec, atol=0.02)
    # predicted label sets match the golden run for nearly every query
    g = golden.tocsr()
    p = P.tocsr()
    same = 0
    for i in range(p.shape[0]):
        gs = set(g.indices[g.indptr[i] : g.indptr[i + 1]].tolist())
        ps = set(p.indices[p.indptr[i] : p.indptr[i + 1]].tolist())
        same += gs == ps
    assert same / p.shape[0] > 0.9, f"only {same}/{p.shape[0]} rows match golden"
    # values close where patterns agree
    inter = golden.minimum(P.tocsr()) if golden.nnz else golden
    np.testing.assert_allclose(
        np.sort(p.data)[:20], np.sort(g.data)[:20], rtol=5e-3, atol=1e-4
    )
