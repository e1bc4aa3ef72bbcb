"""Per-level timing probe for the Wiki-500K-geometry beam-search predictor.

Answers two VERDICT-r3 questions with measurements instead of guesses:
  (a) where do the 28.7 ms/batch of compute go, level by level?
  (b) what is the batch-1 latency floor (tunnel RTT, dispatch, per-level)?

Run:  python scripts/probe_predict_levels.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def sync_time(fn, *args, iters=8):
    """Median wall time of fn(*args) with a scalar-tail fetch to sync."""
    import jax

    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as smat

    from bench import build_synthetic_model
    from pecos_tpu.xmc.inference import (
        PostProcessor,
        beam_step,
        prepare_queries_padded,
    )

    model = build_synthetic_model()
    rng = np.random.default_rng(1)
    batch = 1024
    nnz = 256
    D = model.nr_features
    rows = np.repeat(np.arange(batch), nnz)
    cols = rng.integers(0, D, size=batch * nnz)
    vals = rng.standard_normal(batch * nnz).astype(np.float32) * 0.1
    Xq = smat.csr_matrix((vals, (rows, cols)), shape=(batch, D))
    ids_all, vals_all = prepare_queries_padded(Xq)
    cap = ids_all.shape[1]
    ids_d, vals_d = jnp.asarray(ids_all), jnp.asarray(vals_all)

    # RTT floor: trivial jit dispatch + scalar fetch
    f_triv = jax.jit(lambda x: x + 1.0)
    one = jnp.ones((8,), jnp.float32)
    rtt = sync_time(f_triv, one, iters=20)
    print(f"tunnel dispatch+fetch floor: {rtt*1000:.2f} ms")

    pp = PostProcessor.get("l3-hinge")
    bias_id = D

    results = []
    for B in (batch, 1):
        idsB, valsB = ids_d[:B], vals_d[:B]
        parents = jnp.zeros((B, 1), jnp.int32)
        pvals = jnp.zeros((B, 1), jnp.float32)
        print(f"--- batch={B}")
        for d, layer in enumerate(model.layers):
            k = 20 if d == len(model.layers) - 1 else 10

            # layer passed as a pytree ARG (closure capture would embed the
            # 268MB packed array as an XLA constant -> HTTP 413 on the
            # remote-compile tunnel)
            def step(lay, p, pv, qi, qv, kk=k, dd=d):
                return beam_step(
                    None, lay, p, pv, kk, pp, no_prev=(dd == 0),
                    qids=qi, qvals=qv, bias_id=bias_id, bias_val=1.0,
                )

            jstep = jax.jit(step)
            t = sync_time(jstep, layer, parents, pvals, idsB, valsB)
            maxc = layer.children.shape[1]
            K = parents.shape[1] * maxc
            print(
                f"level {d} kind={layer.kind} nl={layer.nr_labels} K={K}: "
                f"{t*1000:.2f} ms"
            )
            results.append({"batch": B, "level": d, "kind": layer.kind,
                            "nl": int(layer.nr_labels), "K": int(K),
                            "ms": t * 1000})
            parents, pvals = jstep(layer, parents, pvals, idsB, valsB)

    # full chain for reference
    for B in (batch, 1):
        fn = model._sparse_predictor(10, 20, ("l3-hinge",) * model.depth, B, cap)
        t = sync_time(fn, ids_d[:B], vals_d[:B], model.layers)
        print(f"full chain batch={B}: {t*1000:.2f} ms")
        results.append({"batch": B, "level": "all", "ms": t * 1000})

    with open("/tmp/probe_levels.json", "w") as f:
        json.dump({"rtt_ms": rtt * 1000, "levels": results}, f, indent=1)
    print("wrote /tmp/probe_levels.json")


if __name__ == "__main__":
    main()
