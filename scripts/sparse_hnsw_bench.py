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


def gen_smooth(data_dir, n=100_000, nq=2_000, d=500_000, seed=0):
    """Smooth-manifold sparse corpus: doc i sits at position p_i on a feature
    ring and samples its nonzeros from a contiguous window around p_i, so
    similarity decays gradually with |p_i - p_j| — graded neighborhoods with
    no hard cluster walls.  This is the geometry HNSW's greedy descent is
    built for — a second corpus with a qualitatively different neighbor
    structure from gen()'s clustered one, so matched-recall comparisons
    don't hinge on a single geometry."""
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, d, size=n)
    rows_i, cols, vals = [], [], []
    # multi-scale windows: narrow (strong weights) + mid + wide (weak) give a
    # similarity gradient at every distance scale, the friendliest possible
    # geometry for greedy graph descent (a single-scale window has zero
    # gradient beyond its width and defeats any incrementally-built graph)
    for i in range(n):
        f1 = (pos[i] + rng.integers(0, 2048, size=32)) % d
        f2 = (pos[i] + rng.integers(0, 32768, size=20)) % d
        f3 = (pos[i] + rng.integers(0, 262144, size=12)) % d
        f = np.concatenate([f1, f2, f3])
        v = np.concatenate(
            [1.2 + 0.4 * rng.random(32), 0.6 + 0.3 * rng.random(20),
             0.3 + 0.2 * rng.random(12)]
        ).astype(np.float32)
        f, inv = np.unique(f, return_index=True)
        rows_i.append(np.full(len(f), i))
        cols.append(f)
        vals.append(v[inv].astype(np.float32))
    X = smat.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows_i), np.concatenate(cols))),
        shape=(n, d), dtype=np.float32,
    )
    norms = np.sqrt(np.asarray(X.multiply(X).sum(axis=1))).ravel()
    X = smat.diags(1.0 / np.maximum(norms, 1e-12)).dot(X).tocsr().astype(np.float32)
    Q = X[rng.choice(n, size=nq, replace=False)].copy()
    os.makedirs(data_dir, exist_ok=True)
    smat.save_npz(os.path.join(data_dir, "sparse2_base.npz"), X)
    smat.save_npz(os.path.join(data_dir, "sparse2_queries.npz"), Q)
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
    np.save(os.path.join(data_dir, "sparse2_gt_i.npy"), gt_i)
    np.save(os.path.join(data_dir, "sparse2_gt_d.npy"), gt_d)
    print(f"generated smooth: X={X.shape} nnz/row={X.nnz/n:.1f} queries={Q.shape}")


def tie_recall(ids, X, Q, gt_d, metric="ip"):
    """gt_d is stored as ip distance (1 - sim); for l2 on unit-normalized rows
    the ranking is identical (d2 = 2 - 2 sim), so the same ground truth serves
    both metrics — only the threshold transform differs."""
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
    ap.add_argument("--gen2", action="store_true", help="generate the smooth-manifold corpus")
    ap.add_argument("--corpus", default="clustered", choices=["clustered", "smooth"])
    ap.add_argument("--ref", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--M", type=int, default=32)
    ap.add_argument("--efC", type=int, default=100)
    ap.add_argument("--refine-iters", type=int, default=1, help="tpu engine only")
    ap.add_argument("--build-efC", type=int, default=0,
                    help="tpu engine only: wider build/refine search beam (0 = efC)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--efS", type=int, nargs="*", default=[25, 50, 100, 200])
    ap.add_argument(
        "--metric", default="ip", choices=["ip", "l2"],
        help="l2 gives the reference a true-metric operating regime (rows are "
             "l2-normalized, so the ip and l2 rankings and ground truth coincide)")
    args = ap.parse_args()

    if args.gen:
        gen(args.data)
        return
    if args.gen2:
        gen_smooth(args.data)
        return

    stem = "sparse" if args.corpus == "clustered" else "sparse2"
    X = smat.load_npz(os.path.join(args.data, f"{stem}_base.npz")).tocsr()
    Q = smat.load_npz(os.path.join(args.data, f"{stem}_queries.npz")).tocsr()
    # canonicalize: the reference's sparse distance kernels intersect rows via
    # binary search (feat_vectors.hpp:288-308 lower_bound) and silently return
    # garbage on unsorted indices — round-2's recorded reference recalls
    # (0.36-capped) were this artifact, not an engine property.  Sort for both
    # engines so the comparison is on canonical CSR.
    X.sort_indices()
    Q.sort_indices()
    gt_d = np.load(os.path.join(args.data, f"{stem}_gt_d.npy"))
    k = gt_d.shape[1]

    if args.ref:
        shim_sputils()
        from pecos.ann.hnsw import HNSW as RefHNSW

        t0 = time.time()
        model = RefHNSW.train(
            X,
            train_params=RefHNSW.TrainParams(
                M=args.M, efC=args.efC, metric_type=args.metric, threads=1
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
               "M": args.M, "efC": args.efC, "threads": 1, "metric": args.metric,
               "build_seconds": build_s, "sweep": sweep}
        suffix = "" if args.metric == "ip" else f"_{args.metric}"
        if args.corpus == "smooth":
            suffix = "_smooth" + suffix
        out["corpus"] = args.corpus
        with open(os.path.join(args.out, f"sparse_hnsw_ref{suffix}.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote sparse_hnsw_ref{suffix}.json")

    if args.tpu:
        from pecos_tpu.ann.hnsw import HNSW

        t0 = time.time()
        model = HNSW.train(
            X, M=args.M, efC=args.build_efC or args.efC, metric_type=args.metric,
            data_type="csr", refine_iters=args.refine_iters,
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
               "M": args.M, "efC": args.build_efC or args.efC, "metric": args.metric,
               "refine_iters": args.refine_iters,
               "build_seconds": build_s, "sweep": sweep}
        suffix = "" if args.metric == "ip" else f"_{args.metric}"
        if args.corpus == "smooth":
            suffix = "_smooth" + suffix
        out["corpus"] = args.corpus
        with open(os.path.join(args.out, f"sparse_hnsw_tpu{suffix}.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote sparse_hnsw_tpu{suffix}.json")


if __name__ == "__main__":
    main()
