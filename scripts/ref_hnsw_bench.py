"""Run the reference (amzn/pecos C++) HNSW on the SIFT-1M-protocol dataset.

Measures build time and a recall@10-vs-QPS sweep over efS, writing JSON to
<out>/ref_hnsw.json. Protocol: /root/reference/examples/ann-hnsw-pq4bits/
README.md:29-76 (10x repeated inference, best run); operating point M=32,
efC=100 (library defaults, pecos/ann/hnsw/model.py:45-63).

Run with PYTHONPATH pointing at the compiled reference (e.g. /tmp/ref_build).
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np

# shim: the reference imports scipy.sparse.sputils, removed in modern scipy
import scipy.sparse as _sp
from scipy.sparse import _sputils as _priv

_mod = types.ModuleType("scipy.sparse.sputils")
for _name in dir(_priv):
    setattr(_mod, _name, getattr(_priv, _name))
sys.modules["scipy.sparse.sputils"] = _mod
_sp.sputils = _mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/annbench")
    ap.add_argument("--out", default="/tmp/annbench")
    ap.add_argument("--M", type=int, default=32)
    ap.add_argument("--efC", type=int, default=100)
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--efS", type=int, nargs="*", default=[10, 25, 50, 100, 200, 400])
    ap.add_argument("--limit", type=int, default=0, help="truncate base to first N points")
    args = ap.parse_args()

    from pecos.ann.hnsw import HNSW

    base = np.load(os.path.join(args.data, "base.npy"))
    queries = np.load(os.path.join(args.data, "queries.npy"))
    gt = np.load(os.path.join(args.data, "gt_i.npy"))
    gt_d = np.load(os.path.join(args.data, "gt_d.npy"))
    if args.limit:
        base = base[: args.limit]

    def tie_aware_recall(ids: np.ndarray) -> float:
        """ann-benchmarks-style: a returned id is a hit iff its true distance
        is <= the k-th ground-truth distance (+eps), so distance ties among
        equidistant points never count as misses."""
        k = gt.shape[1]
        thr = gt_d[:, k - 1] * (1 + 1e-4) + 1e-6
        got = base[ids.reshape(-1)].reshape(ids.shape[0], k, -1)
        d = ((got - queries[:, None, :]) ** 2).sum(-1)
        return float((d <= thr[:, None]).mean())

    t0 = time.time()
    model = HNSW.train(
        base,
        train_params=HNSW.TrainParams(
            M=args.M, efC=args.efC, metric_type="l2", threads=args.threads
        ),
    )
    build_s = time.time() - t0
    print(f"ref build: {build_s:.1f}s (M={args.M} efC={args.efC} threads={args.threads})", flush=True)

    searchers = model.searchers_create(max(1, args.threads))
    sweep = []
    k = gt.shape[1]
    for efS in args.efS:
        best_qps = 0.0
        for _ in range(args.repeats):
            t0 = time.time()
            ids, _ = model.predict(
                queries,
                pred_params=HNSW.PredParams(efS=efS, topk=k),
                searchers=searchers,
                ret_csr=False,
            )
            dt = time.time() - t0
            best_qps = max(best_qps, queries.shape[0] / dt)
        recall = tie_aware_recall(np.asarray(ids))
        sweep.append({"efS": efS, "recall_at_10": recall, "qps": best_qps})
        print(f"ref efS={efS}: recall@10={recall:.4f} qps={best_qps:.0f}", flush=True)

    out = {
        "engine": "reference-cpp",
        "n": int(base.shape[0]),
        "d": int(base.shape[1]),
        "M": args.M,
        "efC": args.efC,
        "threads": args.threads,
        "build_seconds": build_s,
        "sweep": sweep,
    }
    with open(os.path.join(args.out, "ref_hnsw.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.join(args.out, "ref_hnsw.json"))


if __name__ == "__main__":
    main()
