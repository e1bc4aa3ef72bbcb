"""Sparse-feature (TF-IDF-like) HNSW: reference CSR engine vs pecos_tpu.

BASELINE.json config #4: "HNSW sparse-feature ANN on TF-IDF vectors (blocked
sparse inner-product distance kernels)".  Generates a clustered power-law
sparse corpus, computes exact inner-product ground truth, then runs

  --ref : the compiled reference (PYTHONPATH /tmp/ref_build), CSR storage,
          block sorted-list intersection distances, 1 thread
  --tpu : pecos_tpu HNSW with data_type=csr (broadcast id-intersection)

and writes build time + tie-aware recall@10 vs QPS to JSON.

    python scripts/sparse_hnsw_bench.py --gen
    PYTHONPATH=/tmp/ref_build python scripts/sparse_hnsw_bench.py --ref
    python scripts/sparse_hnsw_bench.py --tpu
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np
import scipy.sparse as smat

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def shim_sputils():
    import scipy.sparse as _sp
    from scipy.sparse import _sputils as _priv

    mod = types.ModuleType("scipy.sparse.sputils")
    for name in dir(_priv):
        setattr(mod, name, getattr(_priv, name))
    sys.modules["scipy.sparse.sputils"] = mod
    _sp.sputils = mod


def gen(data_dir, n=100_000, nq=2_000, d=500_000, seed=0):
    """Hierarchically clustered sparse rows with non-degenerate neighbor
    structure: each doc = fine-cluster signature (strong, shared by ~12 docs)
    + topic signature (medium, shared by ~400) + unique noise.  True top-10
    under ip is the doc's fine cluster, clearly separated — a tie-free sparse
    ANN benchmark (uniform-random sparse rows are all near-equidistant)."""
    rng = np.random.default_rng(seed)
    n_topics = 256
    fine_per_topic = 32
    topic_feats = rng.integers(0, d, size=(n_topics, 32))
    fine_feats = rng.integers(0, d, size=(n_topics * fine_per_topic, 16))
    common_pool = rng.integers(0, d, size=64)  # "stopwords": global gradient
    doc_fine = rng.integers(0, n_topics * fine_per_topic, size=n)
    rows_i, cols, vals = [], [], []
    for i in range(n):
        fid = doc_fine[i]
        tid = fid // fine_per_topic
        f_f = fine_feats[fid]
        f_t = rng.choice(topic_feats[tid], size=24, replace=False)
        f_c = rng.choice(common_pool, size=12, replace=False)
        f_n = rng.integers(0, d, size=16)
        f = np.concatenate([f_f, f_t, f_c, f_n])
        v = np.concatenate(
            [
                1.4 + 0.6 * rng.random(16).astype(np.float32),  # fine: strong
                0.7 + 0.4 * rng.random(24).astype(np.float32),  # topic: medium
                0.4 + 0.4 * rng.random(12).astype(np.float32),  # common words
                0.3 * rng.random(16).astype(np.float32),        # noise: weak
            ]
        )
        f, inv = np.unique(f, return_index=True)
        v = v[inv]
        rows_i.append(np.full(len(f), i))
        cols.append(f)
        vals.append(v.astype(np.float32))
    X = smat.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows_i), np.concatenate(cols))),
        shape=(n, d),
        dtype=np.float32,
    )
    # l2 normalize rows (TF-IDF convention)
    norms = np.sqrt(np.asarray(X.multiply(X).sum(axis=1))).ravel()
    X = smat.diags(1.0 / np.maximum(norms, 1e-12)).dot(X).tocsr().astype(np.float32)
    Q = X[rng.choice(n, size=nq, replace=False)].copy()
    os.makedirs(data_dir, exist_ok=True)
    smat.save_npz(os.path.join(data_dir, "sparse_base.npz"), X)
    smat.save_npz(os.path.join(data_dir, "sparse_queries.npz"), Q)
    # exact ip ground truth (blockwise)
    k = 10
    gt_i = np.zeros((nq, k), np.int64)
    gt_d = np.zeros((nq, k), np.float64)
    for s in range(0, nq, 256):
        sims = np.asarray((Q[s : s + 256] @ X.T).todense(), np.float64)
        dist = 1.0 - sims
        idx = np.argpartition(dist, k, axis=1)[:, :k]
        dd = np.take_along_axis(dist, idx, axis=1)
        o = np.argsort(dd, axis=1)
        gt_i[s : s + 256] = np.take_along_axis(idx, o, axis=1)
        gt_d[s : s + 256] = np.take_along_axis(dd, o, axis=1)
    np.save(os.path.join(data_dir, "sparse_gt_i.npy"), gt_i)
    np.save(os.path.join(data_dir, "sparse_gt_d.npy"), gt_d)
    print(f"generated: X={X.shape} nnz/row={X.nnz/n:.1f} queries={Q.shape}")


def tie_recall(ids, X, Q, gt_d):
    k = gt_d.shape[1]
    thr = gt_d[:, k - 1] * (1 + 1e-4) + 1e-6
    sims = np.zeros(ids.shape, np.float64)
    for s in range(0, Q.shape[0], 256):
        block = np.asarray((Q[s : s + 256] @ X.T).todense(), np.float64)
        sims[s : s + 256] = np.take_along_axis(
            block, np.clip(ids[s : s + 256], 0, X.shape[0] - 1).astype(np.int64), axis=1
        )
    d = np.where(ids >= 0, 1.0 - sims, np.inf)
    return float((d <= thr[:, None]).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/annbench")
    ap.add_argument("--out", default="/tmp/annbench")
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--ref", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--M", type=int, default=32)
    ap.add_argument("--efC", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--efS", type=int, nargs="*", default=[25, 50, 100, 200])
    args = ap.parse_args()

    if args.gen:
        gen(args.data)
        return

    X = smat.load_npz(os.path.join(args.data, "sparse_base.npz")).tocsr()
    Q = smat.load_npz(os.path.join(args.data, "sparse_queries.npz")).tocsr()
    gt_d = np.load(os.path.join(args.data, "sparse_gt_d.npy"))
    k = gt_d.shape[1]

    if args.ref:
        shim_sputils()
        from pecos.ann.hnsw import HNSW as RefHNSW

        t0 = time.time()
        model = RefHNSW.train(
            X,
            train_params=RefHNSW.TrainParams(
                M=args.M, efC=args.efC, metric_type="ip", threads=1
            ),
        )
        build_s = time.time() - t0
        print(f"ref sparse build: {build_s:.1f}s", flush=True)
        searchers = model.searchers_create(1)
        sweep = []
        for efS in args.efS:
            best = 0.0
            ids = None
            for _ in range(args.repeats + 1):
                t0 = time.time()
                ids, _ = model.predict(
                    Q, pred_params=RefHNSW.PredParams(efS=efS, topk=k), searchers=searchers, ret_csr=False
                )
                best = max(best, Q.shape[0] / (time.time() - t0))
            r = tie_recall(np.asarray(ids), X, Q, gt_d)
            sweep.append({"efS": efS, "recall_at_10": r, "qps": best})
            print(f"ref efS={efS}: recall@10={r:.4f} qps={best:.0f}", flush=True)
        out = {"engine": "reference-cpp-sparse", "n": X.shape[0], "d": X.shape[1],
               "M": args.M, "efC": args.efC, "threads": 1,
               "build_seconds": build_s, "sweep": sweep}
        with open(os.path.join(args.out, "sparse_hnsw_ref.json"), "w") as f:
            json.dump(out, f, indent=1)
        print("wrote sparse_hnsw_ref.json")

    if args.tpu:
        from pecos_tpu.ann.hnsw import HNSW

        t0 = time.time()
        model = HNSW.train(
            X, M=args.M, efC=args.efC, metric_type="ip", data_type="csr"
        )
        build_s = time.time() - t0
        print(f"tpu sparse build: {build_s:.1f}s", flush=True)
        sweep = []
        for efS in args.efS:
            best = 0.0
            ids = None
            for _ in range(args.repeats + 1):
                t0 = time.time()
                ids, _ = model.predict(Q, efS=efS, topk=k)
                ids = np.asarray(ids)
                best = max(best, Q.shape[0] / (time.time() - t0))
            r = tie_recall(ids, X, Q, gt_d)
            sweep.append({"efS": efS, "recall_at_10": r, "qps": best})
            print(f"tpu efS={efS}: recall@10={r:.4f} qps={best:.0f}", flush=True)
        out = {"engine": "pecos_tpu-sparse", "n": X.shape[0], "d": X.shape[1],
               "M": args.M, "efC": args.efC,
               "build_seconds": build_s, "sweep": sweep}
        with open(os.path.join(args.out, "sparse_hnsw_tpu.json"), "w") as f:
            json.dump(out, f, indent=1)
        print("wrote sparse_hnsw_tpu.json")


if __name__ == "__main__":
    main()
