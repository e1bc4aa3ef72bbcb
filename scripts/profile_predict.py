"""Per-stage timing of the XR-Linear beam-search predict hot path.

Builds the same synthetic Wiki-500K-geometry model as bench.py, then times
jitted chain prefixes (depth 1, 2, ..., full) so the marginal cost of every
layer — and of the query scatter — is visible.  Run on the real chip:

    PYTHONPATH=/root/repo python scripts/profile_predict.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from bench import build_synthetic_model
    from pecos_tpu.xmc.inference import chain_predict, prepare_queries_padded, scatter_queries
    import scipy.sparse as smat

    L = 2**19 if "--small" not in sys.argv else 2**15
    model = build_synthetic_model(L=L)
    D = model.nr_features
    batch = 1024
    rng = np.random.default_rng(1)
    nnz = 256
    rows = np.repeat(np.arange(batch), nnz)
    cols = rng.integers(0, D, size=batch * nnz)
    vals = rng.standard_normal(batch * nnz).astype(np.float32)
    Xq = smat.csr_matrix((vals, (rows, cols)), shape=(batch, D))
    ids_all, vals_all = prepare_queries_padded(Xq)
    ids_d, vals_d = jnp.asarray(ids_all), jnp.asarray(vals_all)

    pp = tuple(["l3-hinge"] * model.depth)

    def timed(fn, *args, iters=8):
        out = fn(*args)  # compile
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / iters

    # scatter alone
    sc = jax.jit(lambda i, v: scatter_queries(i, v, D, 1.0))
    t_sc = timed(sc, ids_d, vals_d)
    print(f"scatter_queries: {t_sc*1000:.2f} ms")

    # chain prefixes
    bias = model.bias
    prev = 0.0
    for depth in range(1, model.depth + 1):
        sub = model.layers[:depth]
        has_dense = any(l.kind == "dense" for l in sub)

        def fn(i, v, layers, d=depth):
            X = scatter_queries(i, v, D, bias) if has_dense else None
            B = i.shape[0]
            extra_i = jnp.full((B, 128), D + 1, jnp.int32).at[:, 0].set(D)
            extra_v = jnp.zeros((B, 128), jnp.float32).at[:, 0].set(jnp.float32(bias))
            qi = jnp.concatenate([i, extra_i], axis=1)
            qv = jnp.concatenate([v, extra_v], axis=1)
            k = 20 if d == model.depth else 10
            return chain_predict(X, list(layers), 10, k, pp[:d], qids=qi, qvals=qv)

        jfn = jax.jit(fn, static_argnames=("d",))
        t = timed(jfn, ids_d, vals_d, tuple(sub))
        layer = model.layers[depth - 1]
        print(
            f"depth {depth} ({layer.kind} L={layer.nr_labels}): cumulative "
            f"{t*1000:.2f} ms  marginal {(t-prev)*1000:.2f} ms"
        )
        prev = t


if __name__ == "__main__":
    main()
