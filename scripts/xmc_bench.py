"""Matched-recall XR-Linear benchmark: trained models, both engines, one chain.

Protocol (VERDICT item 2 / BASELINE.json): generate a synthetic sparse XMC
dataset, build ONE hierarchical cluster chain, train both the reference C++
engine and pecos_tpu on it, verify P@1/3/5 and recall@10 agree within 0.5%,
and measure index-build time, train time, and predict QPS (beam=10, topk=10,
the reference's default operating point).

  python scripts/xmc_bench.py --engine tpu   # pecos_tpu on the live backend
  PYTHONPATH=/tmp/ref_build python scripts/xmc_bench.py --engine ref

Results land in <out>/{tpu,ref}.json; data/chain are generated once and
shared via <out>/data.npz + chain.npz.
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np
import scipy.sparse as smat

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def shim_scipy():
    """The reference imports scipy.sparse.sputils, removed in modern scipy."""
    import scipy.sparse as _sp
    from scipy.sparse import _sputils as _priv

    mod = types.ModuleType("scipy.sparse.sputils")
    for name in dir(_priv):
        setattr(mod, name, getattr(_priv, name))
    sys.modules["scipy.sparse.sputils"] = mod
    _sp.sputils = mod


def make_data(n_trn=20000, n_tst=4000, d=4096, L=8192, seed=7):
    """Hierarchically clustered sparse XMC data.

    Labels inherit a sparse GROUP prototype plus a label-specific sparse
    delta, so the label space has real tree structure — beam search over a
    learned hierarchy is only meaningful when cluster membership is linearly
    detectable (labels with i.i.d. random centers are adversarial to ANY
    tree method: every cluster is a random label subset)."""
    rng = np.random.default_rng(seed)
    # label center = sum of prototypes along a balanced 16-ary path + a
    # label-unique delta, so EVERY level of a learned tree has linearly
    # detectable membership (like topical hierarchies in real corpora)
    level_nnz, leaf_delta_nnz = 10, 8
    blocks = []
    size = 16
    while size < L:
        blocks.append(size)
        size *= 16
    centers = smat.csr_matrix((L, d), dtype=np.float32)
    for block in blocks:  # block = labels per prototype at this level
        n_protos = -(-L // block)
        rows = np.repeat(np.arange(n_protos), level_nnz)
        cols = rng.integers(0, d, size=n_protos * level_nnz)
        vals = rng.uniform(1.0, 2.0, size=n_protos * level_nnz).astype(np.float32)
        protos = smat.csr_matrix((vals, (rows, cols)), shape=(n_protos, d))
        centers = centers + protos[np.arange(L) // block]
    rows = np.repeat(np.arange(L), leaf_delta_nnz)
    cols = rng.integers(0, d, size=L * leaf_delta_nnz)
    vals = rng.uniform(0.8, 2.0, size=L * leaf_delta_nnz).astype(np.float32)
    centers = (centers + smat.csr_matrix((vals, (rows, cols)), shape=(L, d))).tocsr()

    def make(n, seed_):
        r = np.random.default_rng(seed_)
        prim = r.integers(0, L, size=n)
        X = centers[prim].copy().tolil()
        noise_cols = r.integers(0, d, size=(n, 6))
        noise_vals = r.uniform(0, 0.8, size=(n, 6)).astype(np.float32)
        rows, cols = [], []
        for i in range(n):
            rows.append(i)
            cols.append(prim[i])
        extra = r.uniform(size=n)
        sec = (prim + 1 + r.integers(0, 3, size=n)) % L
        for i in np.nonzero(extra < 0.3)[0]:
            rows.append(i)
            cols.append(sec[i])
        X = X.tocsr()
        Xn = smat.csr_matrix(
            (noise_vals.ravel(), (np.repeat(np.arange(n), 6), noise_cols.ravel())),
            shape=(n, d),
        )
        X = (X + Xn).tocsr().astype(np.float32)
        Y = smat.csr_matrix(
            (np.ones(len(rows), np.float32), (rows, cols)), shape=(n, L)
        )
        return X, Y

    X, Y = make(n_trn, seed + 1)
    Xt, Yt = make(n_tst, seed + 2)
    return X, Y, Xt, Yt


def ensure_data(out, args):
    data_path = os.path.join(out, "data.npz")
    chain_dir = os.path.join(out, "chain")
    if not os.path.exists(data_path):
        from pecos_tpu.utils import smat_util

        X, Y, Xt, Yt = make_data(args.n_trn, args.n_tst, args.d, args.L)
        np.savez(
            data_path,
            **{
                f"{nm}_{f}": getattr(M.tocsr(), f)
                for nm, M in (("X", X), ("Y", Y), ("Xt", Xt), ("Yt", Yt))
                for f in ("data", "indices", "indptr")
            },
            shapes=np.array([X.shape, Y.shape, Xt.shape, Yt.shape]),
        )
    z = np.load(data_path)
    shapes = z["shapes"]
    mats = []
    for i, nm in enumerate(("X", "Y", "Xt", "Yt")):
        mats.append(
            smat.csr_matrix(
                (z[f"{nm}_data"], z[f"{nm}_indices"], z[f"{nm}_indptr"]),
                shape=tuple(shapes[i]),
            )
        )
    X, Y, Xt, Yt = mats
    if not os.path.exists(os.path.join(chain_dir, "config.json")):
        # chain built once by pecos_tpu (CPU backend is fine) and reused by both
        from pecos_tpu.xmc import Indexer, LabelEmbeddingFactory

        t0 = time.time()
        label_feat = LabelEmbeddingFactory.create(Y, X, method="pifa")
        chain = Indexer.gen(label_feat, nr_splits=16, max_leaf_size=100)
        build_s = time.time() - t0
        chain.save(chain_dir)
        with open(os.path.join(out, "index_build.json"), "w") as f:
            json.dump({"index_build_seconds": build_s, "shapes": [list(C.shape) for C in chain]}, f)
    return X, Y, Xt, Yt, chain_dir


def metrics_and_qps(predict_fn, Xt, Yt, topk=10, repeats=3):
    P = predict_fn(Xt)
    from pecos_tpu.utils import smat_util

    m = smat_util.Metrics.generate(Yt, P, topk=topk)
    best_qps = 0.0
    for _ in range(repeats):
        t0 = time.time()
        predict_fn(Xt)
        dt = time.time() - t0
        best_qps = max(best_qps, Xt.shape[0] / dt)
    return m, best_qps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", choices=["tpu", "ref"], required=True)
    ap.add_argument("--out", default="/tmp/xmcbench")
    ap.add_argument("--n-trn", type=int, default=20000)
    ap.add_argument("--n-tst", type=int, default=4000)
    ap.add_argument("--d", type=int, default=4096)
    ap.add_argument("--L", type=int, default=8192)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--cpu", action="store_true", help="force CPU for the tpu engine")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.engine == "ref":
        shim_scipy()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)

    X, Y, Xt, Yt, chain_dir = ensure_data(args.out, args)
    from pecos_tpu.utils.cluster_util import ClusterChain

    chain = ClusterChain.load(chain_dir)

    if args.engine == "tpu":
        from pecos_tpu.xmc.xlinear import XLinearModel

        t0 = time.time()
        model = XLinearModel.train(X, Y, C=chain, shallow=True)
        train_s = time.time() - t0
        # warm = second train in-process: jitted solver kernels already
        # compiled, so this is the steady re-train number (the persistent
        # XLA compile cache gives fresh processes nearly the same time).
        t0 = time.time()
        model = XLinearModel.train(X, Y, C=chain, shallow=True)
        train_warm_s = time.time() - t0

        def predict(Q):
            return model.predict(Q, beam_size=args.beam, only_topk=args.topk)

        engine = "pecos_tpu"
    else:
        from pecos.xmc.xlinear.model import XLinearModel as RefXLM
        from pecos.utils.cluster_util import ClusterChain as RefChain

        ref_chain = RefChain([C.tocsc() for C in chain.chain])
        t0 = time.time()
        model = RefXLM.train(X, Y, C=ref_chain, shallow=True)
        train_s = time.time() - t0
        # predict through the C++ whole-chain engine (predict-only load)
        import tempfile

        tmpd = tempfile.mkdtemp()
        model.save(tmpd)
        model = RefXLM.load(tmpd, is_predict_only=True)

        def predict(Q):
            return model.predict(Q, beam_size=args.beam, only_topk=args.topk)

        engine = "reference-cpp"

    m, qps = metrics_and_qps(predict, Xt, Yt, topk=args.topk)
    result = {
        "engine": engine,
        "n_trn": int(X.shape[0]),
        "n_tst": int(Xt.shape[0]),
        "d": int(X.shape[1]),
        "L": int(Y.shape[1]),
        "beam": args.beam,
        "topk": args.topk,
        "train_seconds": train_s,
        **(
            {"train_seconds_cold": train_s, "train_seconds_warm": train_warm_s}
            if args.engine == "tpu"
            else {}
        ),
        "prec": [float(v) for v in m.prec],
        "recall": [float(v) for v in m.recall],
        "qps": qps,
    }
    path = os.path.join(args.out, f"{args.engine}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    print("wrote", path)


if __name__ == "__main__":
    main()
