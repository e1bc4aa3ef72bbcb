"""Generate deterministic golden fixtures for regression tests.

Mirrors the reference's checked-in tst-data idiom (SURVEY.md §4): toy X/Y
plus golden predictions from a fixed-seed train/predict run.  Regenerate with
`PYTHONPATH=. python scripts/make_golden_fixtures.py` only when an intended
behavior change shifts the golden outputs (and say so in the commit).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as smat

from pecos_tpu.utils import smat_util
from pecos_tpu.xmc import Indexer, LabelEmbeddingFactory
from pecos_tpu.xmc.xlinear import XLinearModel

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "data")


def make_xmc(n, d, L, seed, centers_seed=7):
    centers = (
        np.random.default_rng(centers_seed).standard_normal((L, d)).astype(np.float32) * 2.5
    )
    rng = np.random.default_rng(seed)
    X = np.zeros((n, d), np.float32)
    rows, cols = [], []
    for i in range(n):
        l = i % L
        X[i] = centers[l] + rng.standard_normal(d).astype(np.float32) * 0.4
        rows.append(i)
        cols.append(l)
        if i % 5 == 0:
            rows.append(i)
            cols.append((l + 3) % L)
    Y = smat.csr_matrix((np.ones(len(rows), np.float32), (rows, cols)), shape=(n, L))
    return smat.csr_matrix(X), Y


def main():
    os.makedirs(OUT, exist_ok=True)
    X, Y = make_xmc(180, 24, 24, seed=123)
    Xt, Yt = make_xmc(60, 24, 24, seed=321)
    smat_util.save_matrix(os.path.join(OUT, "X.trn.npz"), X)
    smat_util.save_matrix(os.path.join(OUT, "Y.trn.npz"), Y)
    smat_util.save_matrix(os.path.join(OUT, "X.tst.npz"), Xt)
    smat_util.save_matrix(os.path.join(OUT, "Y.tst.npz"), Yt)

    chain = Indexer.gen(
        LabelEmbeddingFactory.create(Y, X, method="pifa"),
        max_leaf_size=4,
        nr_splits=2,
        seed=11,
    )
    model = XLinearModel.train(X, Y, C=chain, threshold=0.0)
    P = model.predict(Xt, beam_size=8, only_topk=5)
    smat_util.save_matrix(os.path.join(OUT, "Yt_pred.golden.npz"), P)
    m = smat_util.Metrics.generate(Yt, P, topk=5)
    np.save(os.path.join(OUT, "golden_prec.npy"), m.prec)
    print("golden P@1..5:", np.round(m.prec, 4))


if __name__ == "__main__":
    main()
