"""Benchmark: XR-Linear beam-search predict QPS on a Wiki-500K-scale synthetic model.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Model geometry mirrors the reference's headline workload (BASELINE.md):
~500K labels, ~2.4M-dim sparse weights pruned to <=64 nnz/label (the reference
prunes with threshold + max_nonzeros_per_label, linear_solver.hpp:718-778),
beam_size=10, only_topk=20, post=l3-hinge (reference defaults,
pecos/distributed/xmc/xlinear/model.py:675).

vs_baseline compares against the reference CPU QPS recorded in BASELINE.json
["published"]["synthetic_wiki500k_cpu_qps"] (measured by running the reference
on this host); 0.0 if not yet measured.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_synthetic_model(L=2**19, D=2**18, nnz_per_label=64, nr_splits=16, seed=0):
    """Device model built directly in padded layouts (no host CSC detour)."""
    import jax.numpy as jnp
    from pecos_tpu.xmc.inference import CompiledHierModel, DeviceLayer

    rng = np.random.default_rng(seed)
    # level sizes: L, L/16, ... down to <= 16
    sizes = [L]
    while sizes[0] > nr_splits:
        sizes.insert(0, sizes[0] // nr_splits)
    Db = D + 1

    layers = []
    n_parents = 1
    for li, n_labels in enumerate(sizes):
        deg = n_labels // n_parents
        children = np.arange(n_labels, dtype=np.int32).reshape(n_parents, deg)
        if n_labels * Db <= (1 << 24):
            W = rng.standard_normal((Db, n_labels)).astype(np.float32) * 0.05
            layers.append(DeviceLayer("dense", n_labels, jnp.asarray(children), W=jnp.asarray(W)))
        else:
            ids = rng.integers(0, Db, size=(n_labels, nnz_per_label), dtype=np.int32)
            vals = (rng.standard_normal((n_labels, nnz_per_label)) * 0.05).astype(np.float32)
            packed = np.concatenate([ids, vals.view(np.int32)], axis=1)
            layers.append(
                DeviceLayer(
                    "plabel",
                    n_labels,
                    jnp.asarray(children),
                    packed=jnp.asarray(packed),
                )
            )
        n_parents = n_labels
    return CompiledHierModel(layers, bias=1.0, nr_features=D)


def main():
    import scipy.sparse as smat

    t_setup = time.time()
    model = build_synthetic_model()
    rng = np.random.default_rng(1)
    batch = 1024
    n_queries = 8192  # 8 internal batches; dispatch pipelining hides latency
    # sparse TF-IDF-like queries: ~256 nonzeros/row (Wiki-500K nnz(X)/N ~= 387)
    nnz = 256
    D = model.nr_features
    rows = np.repeat(np.arange(n_queries), nnz)
    cols = rng.integers(0, D, size=n_queries * nnz)
    vals = rng.standard_normal(n_queries * nnz).astype(np.float32) * 0.1
    Xq = smat.csr_matrix((vals, (rows, cols)), shape=(n_queries, D))

    # warmup (compile)
    P = model.predict(Xq[:batch], beam_size=10, only_topk=20, batch_size=batch)
    setup_s = time.time() - t_setup

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        P = model.predict(Xq, beam_size=10, only_topk=20, batch_size=batch)
    dt = (time.time() - t0) / iters / (n_queries / batch)
    qps = batch / dt

    baseline = 0.0
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.json")) as f:
            baseline = float(
                json.load(f).get("published", {}).get("synthetic_wiki500k_cpu_qps", 0.0)
            )
    except Exception:
        pass
    vs = qps / baseline if baseline > 0 else 0.0

    print(
        json.dumps(
            {
                "metric": "xrlinear_beam_predict_qps_synthetic_wiki500k",
                "value": round(qps, 1),
                "unit": "queries/s (beam=10, topk=20, L=524288, D=262144, nnz/label=64)",
                "vs_baseline": round(vs, 3),
            }
        )
    )
    print(
        f"# setup+compile: {setup_s:.1f}s, per-batch latency (pipelined): {dt*1000:.1f} ms, "
        f"pred nnz/row: {P.nnz / P.shape[0]:.1f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
