"""Generate the SIFT-1M-protocol ANN benchmark dataset + exact ground truth.

Protocol mirror of the reference PQ4 example (ann-benchmarks style,
/root/reference/examples/ann-hnsw-pq4bits/README.md:29-76): 1M x 128d base
vectors, 10K queries, euclidean metric, exact top-10 ground truth.  The real
SIFT-1M corpus cannot be downloaded here (zero egress), so the data is a
deterministic synthetic stand-in with SIFT-like cluster structure (mixture of
1024 centers + noise, non-negative, scaled to SIFT's dynamic range).

Ground truth is computed by chunked brute force on whatever backend JAX picks
(one TPU chip does 10K x 1M x 128 in seconds; CPU works too, slower).

Usage: python scripts/ann_bench_data.py [--n 1000000] [--nq 10000] [--out /tmp/annbench]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def make_data(n=1_000_000, nq=10_000, d=128, n_centers=1024, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32) * 40.0
    assign = rng.integers(0, n_centers, size=n + nq)
    pts = centers[assign] + rng.standard_normal((n + nq, d)).astype(np.float32) * 18.0
    pts = np.clip(pts + 90.0, 0, 255).astype(np.float32)  # SIFT-ish non-negative range
    return pts[:n], pts[n:]


def exact_topk(base: np.ndarray, queries: np.ndarray, k=10, qchunk=2048, bchunk=131072):
    """Chunked brute-force exact L2 top-k (smallest distance first).

    Matmul precision is pinned to HIGHEST: the TPU default (bfloat16 passes)
    perturbs distances by ~0.4%, which is larger than neighbor gaps in
    clustered data and silently corrupts the ground truth. Base chunks are
    uploaded once and stay device-resident across all query chunks.
    """
    import jax
    import jax.numpy as jnp

    nb = base.shape[0]

    @jax.jit
    def score_chunk(Q, X, base_off, best_d, best_i):
        d = (
            jnp.sum(Q * Q, axis=1, keepdims=True)
            - 2.0
            * jnp.dot(Q, X.T, preferred_element_type=jnp.float32, precision="highest")
            + jnp.sum(X * X, axis=1)[None, :]
        )
        ids = jnp.arange(X.shape[0], dtype=jnp.int32)[None, :] + base_off
        all_d = jnp.concatenate([best_d, d], axis=1)
        all_i = jnp.concatenate([best_i, jnp.broadcast_to(ids, d.shape)], axis=1)
        neg, pos = jax.lax.top_k(-all_d, k)
        return -neg, jnp.take_along_axis(all_i, pos, axis=1)

    X_chunks = [
        (jnp.asarray(base[b0 : b0 + bchunk]), jnp.int32(b0)) for b0 in range(0, nb, bchunk)
    ]
    out_i = np.empty((queries.shape[0], k), np.int32)
    out_d = np.empty((queries.shape[0], k), np.float32)
    for q0 in range(0, queries.shape[0], qchunk):
        Q = jnp.asarray(queries[q0 : q0 + qchunk])
        best_d = jnp.full((Q.shape[0], k), 3.4e38, jnp.float32)
        best_i = jnp.full((Q.shape[0], k), -1, jnp.int32)
        for X, off in X_chunks:
            best_d, best_i = score_chunk(Q, X, off, best_d, best_i)
        out_d[q0 : q0 + qchunk] = np.asarray(best_d)
        out_i[q0 : q0 + qchunk] = np.asarray(best_i)
    return out_i, out_d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nq", type=int, default=10_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="/tmp/annbench")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend for GT")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    base, queries = make_data(args.n, args.nq, args.d)
    np.save(os.path.join(args.out, "base.npy"), base)
    np.save(os.path.join(args.out, "queries.npy"), queries)
    print(f"data: base={base.shape} queries={queries.shape} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    gt_i, gt_d = exact_topk(base, queries, k=args.k)
    np.save(os.path.join(args.out, "gt_i.npy"), gt_i)
    np.save(os.path.join(args.out, "gt_d.npy"), gt_d)
    print(f"ground truth: {gt_i.shape} ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
