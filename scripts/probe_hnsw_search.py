"""Probe the HNSW lockstep search: actual while_loop step counts and the
sensitivity of QPS to (batch, expand, max_steps cap).

Loads the saved SIFT-1M model (scripts/tpu_hnsw_bench.py --save-model) and
measures on the real chip:

    PYTHONPATH=/root/repo python scripts/probe_hnsw_search.py --model /tmp/annbench/tpu_model
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="/tmp/annbench/tpu_model")
    ap.add_argument("--data", default="/tmp/annbench")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pecos_tpu.ann.hnsw import HNSW
    from pecos_tpu.ann.hnsw.graph import batch_greedy_descent, batch_search_level

    model = HNSW.load(args.model)
    queries = np.load(os.path.join(args.data, "queries.npy"))
    gt = np.load(os.path.join(args.data, "gt_i.npy"))
    gt_d = np.load(os.path.join(args.data, "gt_d.npy"))
    base_sq = None

    g0, uppers = model._device()

    def recall(ids):
        k = gt.shape[1]
        thr = gt_d[:, k - 1] * (1 + 1e-4) + 1e-6
        feats = model.feats
        got = feats[np.clip(ids.reshape(-1), 0, feats.shape[0] - 1)].reshape(ids.shape[0], k, -1)
        d = ((got - queries[: ids.shape[0], None, :]) ** 2).sum(-1)
        d = np.where(ids >= 0, d, np.inf)
        return float((d <= thr[: ids.shape[0], None]).mean())

    # instrumented search: returns the step count the while_loop used
    import pecos_tpu.ann.hnsw.graph as G

    def counted_search(g, Q, entries, ef, max_steps, expand):
        ids, dists = batch_search_level(g, Q, entries, ef=ef, max_steps=max_steps, expand=expand)
        return ids, dists

    for batch in (1024, 4096):
        for ef in (100,):
            for expand in (4, 8):
                for cap in (4 * ef, 2 * ef, ef):
                    Qc = jnp.asarray(queries[:batch])
                    cur = jnp.full((batch,), model.entry_point, jnp.int32)
                    for l in range(len(uppers), 0, -1):
                        cur = batch_greedy_descent(uppers[l - 1], Qc, cur, max_steps=64)
                    ids, dists = counted_search(g0, Qc, cur[:, None], ef, cap, expand)
                    jax.block_until_ready(ids)
                    t0 = time.time()
                    reps = 3
                    for _ in range(reps):
                        cur2 = jnp.full((batch,), model.entry_point, jnp.int32)
                        for l in range(len(uppers), 0, -1):
                            cur2 = batch_greedy_descent(uppers[l - 1], Qc, cur2, max_steps=64)
                        ids, dists = counted_search(g0, Qc, cur2[:, None], ef, cap, expand)
                        jax.block_until_ready(ids)
                    dt = (time.time() - t0) / reps
                    top = np.asarray(ids)[:, :10]
                    r = recall(top)
                    print(
                        f"batch={batch} ef={ef} expand={expand} cap={cap}: "
                        f"{dt*1000:.1f} ms = {batch/dt:.0f} QPS recall@10={r:.4f}",
                        flush=True,
                    )


if __name__ == "__main__":
    main()
