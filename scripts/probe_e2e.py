"""Dissect the end-to-end predict timeline at the bench.py geometry.

Measures, separately:
  - host prep (prepare_queries_padded)
  - per-batch jnp.asarray upload enqueue cost
  - dispatch enqueue cost
  - total e2e vs compute-only
  - upload-only pipeline (uploads with no compute) to get the wire floor
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as smat

    from bench import build_synthetic_model
    from pecos_tpu.xmc.inference import prepare_queries_padded

    model = build_synthetic_model()
    rng = np.random.default_rng(1)
    batch = 1024
    n_queries = 8192
    nnz = 256
    D = model.nr_features
    rows = np.repeat(np.arange(n_queries), nnz)
    cols = rng.integers(0, D, size=n_queries * nnz)
    vals = rng.standard_normal(n_queries * nnz).astype(np.float32) * 0.1
    Xq = smat.csr_matrix((vals, (rows, cols)), shape=(n_queries, D))

    # warm compile
    P = model.predict(Xq[:batch], beam_size=10, only_topk=20, batch_size=batch)

    # 1. host prep cost
    for _ in range(2):
        t0 = time.time()
        ids_all, vals_all = prepare_queries_padded(Xq)
        prep_s = time.time() - t0
    cap = ids_all.shape[1]
    print(f"prep (8192 q): {prep_s*1000:.1f} ms, cap={cap}")

    nb = n_queries // batch
    ids_r = ids_all.reshape(nb, batch, cap)
    vals_r = vals_all.reshape(nb, batch, cap)

    fn = model._sparse_predictor(10, 20, ("l3-hinge",) * model.depth, batch, cap)

    # 2. upload-only pipeline: enqueue all uploads, sync via tiny computation
    f_touch = jax.jit(lambda a, b: (a[0, 0], b[0, 0]))
    ups = [(jnp.asarray(ids_r[i]), jnp.asarray(vals_r[i])) for i in range(nb)]
    jax.device_get(f_touch(*ups[-1]))
    for trial in range(3):
        t0 = time.time()
        ups = [(jnp.asarray(ids_r[i]), jnp.asarray(vals_r[i])) for i in range(nb)]
        enq_s = time.time() - t0
        outs = [f_touch(a, b) for a, b in ups]
        jax.device_get(outs[-1])
        up_s = time.time() - t0
        print(f"upload-only: enqueue {enq_s*1000:.1f} ms, synced {up_s*1000:.1f} ms "
              f"({2*ids_all.nbytes/up_s/1e6:.0f} MB/s wire)")

    # 3. full e2e with per-phase timestamps
    for trial in range(3):
        t0 = time.time()
        pending = []
        enq_times = []
        for i in range(nb):
            t1 = time.time()
            a = jnp.asarray(ids_r[i])
            b = jnp.asarray(vals_r[i])
            t2 = time.time()
            pending.append(fn(a, b, model.layers))
            enq_times.append((t2 - t1, time.time() - t2))
        t_dispatch_done = time.time()
        stacked = jnp.concatenate([l for l, _ in pending]), jnp.concatenate(
            [v for _, v in pending]
        )
        labels, valso = (np.asarray(x) for x in jax.device_get(stacked))
        t_end = time.time()
        up_ms = sum(u for u, _ in enq_times) * 1000
        dis_ms = sum(d for _, d in enq_times) * 1000
        print(f"e2e: total {1000*(t_end-t0):.1f} ms | enqueue uploads {up_ms:.1f} ms, "
              f"dispatch {dis_ms:.1f} ms, wait-fetch {1000*(t_end-t_dispatch_done):.1f} ms "
              f"-> {n_queries/(t_end-t0):.0f} QPS")

    # 4. compute-only for reference
    ids_d, vals_d = jnp.asarray(ids_r[0]), jnp.asarray(vals_r[0])
    out = fn(ids_d, vals_d, model.layers)
    jax.device_get(out)
    citers = 16
    t0 = time.time()
    outs = [fn(ids_d, vals_d, model.layers) for _ in range(citers)]
    jax.device_get(outs[-1])
    compute_ms = (time.time() - t0) / citers * 1000
    print(f"compute-only: {compute_ms:.2f} ms/batch -> {batch/compute_ms*1000:.0f} QPS")

    # 5. e2e but with pre-uploaded inputs (isolate upload cost from dispatch)
    ups = [(jnp.asarray(ids_r[i]), jnp.asarray(vals_r[i])) for i in range(nb)]
    jax.device_get(f_touch(*ups[-1]))
    for trial in range(2):
        t0 = time.time()
        pending = [fn(a, b, model.layers) for a, b in ups]
        stacked = jnp.concatenate([l for l, _ in pending]), jnp.concatenate(
            [v for _, v in pending]
        )
        jax.device_get(stacked)
        t_end = time.time()
        print(f"e2e-preuploaded: {1000*(t_end-t0):.1f} ms -> {n_queries/(t_end-t0):.0f} QPS")


if __name__ == "__main__":
    main()
