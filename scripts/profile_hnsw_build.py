"""Attribute HNSW build wall-clock to its device phases.

Monkeypatches the graph kernels with block-until-ready timing wrappers and
runs HNSW.train on a SIFT subset.  Forced syncs serialize the stream, so the
per-phase totals are an upper bound of each phase's share; `overlap loss` =
(timed total - real wall-clock of an unpatched run) is reported when
--baseline is given.

    PYTHONPATH=/root/repo python scripts/profile_hnsw_build.py --n 100000
"""

import argparse
import collections
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--data", default="/tmp/annbench/base.npy")
    ap.add_argument("--sparse", action="store_true", help="data is a CSR .npz (data_type=csr build)")
    ap.add_argument("--M", type=int, default=32)
    ap.add_argument("--efC", type=int, default=100)
    ap.add_argument("--refine-iters", type=int, default=1)
    ap.add_argument("--build-pq", default="auto")
    ap.add_argument("--ef-mult", type=float, default=1.3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--baseline", action="store_true", help="also time an unpatched run")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from pecos_tpu.ann.hnsw import graph as G
    from pecos_tpu.ann.hnsw import model as Mmod

    kw = dict(
        M=args.M, efC=args.efC, refine_iters=args.refine_iters,
        build_pq=args.build_pq, build_pq_ef_mult=args.ef_mult,
    )
    if args.sparse:
        import scipy.sparse as smat

        X = smat.load_npz(args.data).tocsr()[: args.n]
        X.sort_indices()
        kw.update(data_type="csr", metric_type="ip")
    else:
        X = np.load(args.data)[: args.n]

    if args.baseline:
        t0 = time.time()
        Mmod.HNSW.train(X, **kw)
        print(f"unpatched wall-clock: {time.time() - t0:.1f}s")

    totals = collections.Counter()
    counts = collections.Counter()
    maxes = collections.Counter()  # first call ~ compile cost on a cold cache

    def wrap(name, fn):
        def inner(*a, **k):
            t0 = time.time()
            out = fn(*a, **k)
            jax.block_until_ready(out)
            dt = time.time() - t0
            totals[name] += dt
            counts[name] += 1
            maxes[name] = max(maxes[name], dt)
            return out

        return inner

    # patch at both the graph module and the model module import sites
    for name in (
        "batch_search_level",
        "batch_search_level_pq_packed",
        "batch_greedy_descent",
        "scatter_prune_rows",
        "scatter_prune_rows_alg4",
        "scatter_prune_rows_packed",
        "scatter_set_rows_packed",
        "scatter_set_rows_d",
        "scatter_set_rows_packed_d",
        "reverse_merge_closest",
        "reverse_merge_closest_packed",
        "reverse_merge_chunk",
        "reverse_merge_chunk_packed",
        "refine_union_candidates",
        "exact_rescore",
        "pack_rows_codes",
        "gather_dist",
    ):
        orig = getattr(G, name)
        setattr(G, name, wrap(name, orig))
        if hasattr(Mmod, name):
            setattr(Mmod, name, wrap(name, orig))
    for name in ("_scatter_set_rows", "_gather_rows", "batch_select_from_search"):
        for mod in (Mmod, G):
            if hasattr(mod, name):
                setattr(mod, name, wrap(name, getattr(mod, name)))

    t0 = time.time()
    Mmod.HNSW.train(X, **kw)
    wall = time.time() - t0
    print(f"patched wall-clock: {wall:.1f}s  (n={args.n})")
    timed = sum(totals.values())
    for name, tt in totals.most_common():
        n = max(counts[name], 1)
        steady = (tt - maxes[name]) / max(n - 1, 1) * 1e3
        print(
            f"  {name:28s} {tt:8.1f}s  {counts[name]:6d} calls  "
            f"{tt/n*1e3:8.1f} ms/call  max {maxes[name]*1e3:8.0f} ms  steady {steady:8.1f} ms"
        )
    print(f"  {'(host / untimed)':28s} {wall - timed:8.1f}s")


if __name__ == "__main__":
    main()
