"""pecos_tpu HNSW on the SIFT-1M-protocol dataset (one TPU chip).

Mirror of scripts/ref_hnsw_bench.py: build time + recall@10-vs-QPS sweep over
efS with tie-aware recall, JSON to <out>/tpu_hnsw.json. Protocol:
/root/reference/examples/ann-hnsw-pq4bits/README.md:29-76; operating point
M=32, efC=100 (reference library defaults).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/annbench")
    ap.add_argument("--out", default="/tmp/annbench")
    ap.add_argument("--M", type=int, default=32)
    ap.add_argument("--efC", type=int, default=100)
    ap.add_argument("--refine-iters", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--efS", type=int, nargs="*", default=[10, 25, 50, 100, 200, 400])
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--pq", action="store_true", help="bench HNSWProductQuantizer4Bits")
    ap.add_argument("--rerank-mult", type=int, default=2, help="PQ num_rerank = mult * efS")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--save-model", default="")
    ap.add_argument("--load-model", default="")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pecos_tpu.ann.hnsw import HNSW, HNSWProductQuantizer4Bits

    base = np.load(os.path.join(args.data, "base.npy"))
    queries = np.load(os.path.join(args.data, "queries.npy"))
    gt = np.load(os.path.join(args.data, "gt_i.npy"))
    gt_d = np.load(os.path.join(args.data, "gt_d.npy"))
    if args.limit:
        base = base[: args.limit]

    def tie_aware_recall(ids: np.ndarray) -> float:
        k = gt.shape[1]
        thr = gt_d[:, k - 1] * (1 + 1e-4) + 1e-6
        got = base[np.clip(ids.reshape(-1), 0, len(base) - 1)].reshape(ids.shape[0], k, -1)
        d = ((got - queries[:, None, :]) ** 2).sum(-1)
        d = np.where(ids >= 0, d, np.inf)
        return float((d <= thr[:, None]).mean())

    cls = HNSWProductQuantizer4Bits if args.pq else HNSW
    if args.load_model:
        if args.pq and not os.path.exists(os.path.join(args.load_model, "pq.npz")):
            # plain HNSW dir: graft PQ4 codebooks onto the existing graph
            t0 = time.time()
            model = HNSWProductQuantizer4Bits.from_hnsw(HNSW.load(args.load_model))
            build_s = time.time() - t0
            print(f"pq-from-hnsw quantize: {build_s:.1f}s", flush=True)
            if args.save_model:
                model.save(args.save_model)
        else:
            model = cls.load(args.load_model)
            build_s = -1.0
            print(f"loaded model from {args.load_model}", flush=True)
    else:
        t0 = time.time()
        if args.pq:
            model = cls.train(
                base,
                hnsw_params=HNSW.TrainParams(
                    M=args.M, efC=args.efC, metric_type="l2", refine_iters=args.refine_iters
                ),
            )
        else:
            model = cls.train(
                base, M=args.M, efC=args.efC, metric_type="l2", refine_iters=args.refine_iters
            )
        build_s = time.time() - t0
        print(f"tpu build: {build_s:.1f}s (M={args.M} efC={args.efC})", flush=True)
        if args.save_model:
            model.save(args.save_model)

    sweep = []
    k = gt.shape[1]
    for efS in args.efS:
        ids = None
        best_qps = 0.0
        kw = {"num_rerank": args.rerank_mult * efS} if args.pq else {}
        for _ in range(args.repeats + 1):  # first rep warms the jit cache
            t0 = time.time()
            ids, _ = model.predict(queries, efS=efS, topk=k, **kw)
            ids = np.asarray(ids)  # forces full sync through the async tunnel
            dt = time.time() - t0
            best_qps = max(best_qps, queries.shape[0] / dt)
        recall = tie_aware_recall(ids)
        sweep.append({"efS": efS, "recall_at_10": recall, "qps": best_qps})
        print(f"tpu efS={efS}: recall@10={recall:.4f} qps={best_qps:.0f}", flush=True)

    out = {
        "engine": "pecos_tpu" + ("-pq4" if args.pq else ""),
        "n": int(base.shape[0]),
        "d": int(base.shape[1]),
        "M": args.M,
        "efC": args.efC,
        "refine_iters": args.refine_iters,
        "build_seconds": build_s,
        "sweep": sweep,
    }
    name = "tpu_hnsw_pq4.json" if args.pq else "tpu_hnsw.json"
    with open(os.path.join(args.out, name), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.join(args.out, name))


if __name__ == "__main__":
    main()
