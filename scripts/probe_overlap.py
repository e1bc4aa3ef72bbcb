"""Diagnose upload/compute overlap in the wire predict loop (bench geometry).

Questions:
  1. Does jnp.asarray(wire_buf) block the host until the transfer lands?
  2. Does the tunnel move bytes while the device computes (overlap), or are
     transfers and kernels serialized on one stream?
  3. Do background-thread uploads / jax.device_put change either answer?
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as smat

    from bench import build_synthetic_model
    from pecos_tpu.xmc.inference import encode_wire_batch, prepare_queries_padded

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

    # warm compile through the public path
    model.predict(Xq[:batch], beam_size=10, only_topk=20, batch_size=batch)

    nb = n_queries // batch
    ids_all, vals_all = prepare_queries_padded(Xq)
    cap = ids_all.shape[1]
    bufs = [
        encode_wire_batch(
            ids_all[i * batch : (i + 1) * batch],
            vals_all[i * batch : (i + 1) * batch],
            D,
        )
        for i in range(nb)
    ]
    per_mb = bufs[0].nbytes / 1e6
    print(f"wire buf: {per_mb:.2f} MB/batch, cap={cap}")

    fn = model._wire_predictor(10, 20, ("l3-hinge",) * model.depth, batch, cap)

    f_touch = jax.jit(lambda a: a[0, 0])

    # --- 1. does jnp.asarray block?
    d0 = jnp.asarray(bufs[0])
    jax.device_get(f_touch(d0))
    for name, up in (("jnp.asarray", jnp.asarray), ("device_put", jax.device_put)):
        ts = []
        for i in range(nb):
            t0 = time.time()
            d = up(bufs[i])
            ts.append(time.time() - t0)
        jax.device_get(f_touch(d))
        tot = sum(ts) * 1000
        print(f"{name}: enqueue {tot:.1f} ms for {nb} bufs "
              f"({per_mb*nb/ (tot/1000+1e-9):.0f} MB/s if blocking)")

    # --- 2. upload-only pipeline throughput (sync once at the end)
    for _ in range(2):
        t0 = time.time()
        ds = [jnp.asarray(b) for b in bufs]
        outs = [f_touch(d) for d in ds]
        jax.device_get(outs[-1])
        dt = time.time() - t0
    print(f"upload-only synced: {dt*1000:.1f} ms ({per_mb*nb/dt:.0f} MB/s)")

    # --- 3. compute-only (resident input)
    out = fn(d0, model.layers)
    jax.device_get(out)
    t0 = time.time()
    outs = [fn(d0, model.layers) for _ in range(nb)]
    jax.device_get(outs[-1])
    comp = time.time() - t0
    print(f"compute-only: {comp*1000/nb:.1f} ms/batch, {comp*1000:.1f} ms total")

    # --- 4. real loop: upload+dispatch per batch, one fetch
    for _ in range(3):
        t0 = time.time()
        pending = [fn(jnp.asarray(b), model.layers) for b in bufs]
        stacked = (
            jnp.concatenate([l for l, _ in pending]),
            jnp.concatenate([v for _, v in pending]),
        )
        jax.device_get(stacked)
        dt = time.time() - t0
        print(f"loop upload+dispatch: {dt*1000:.1f} ms -> {n_queries/dt:.0f} QPS "
              f"(serial would be {(comp + per_mb*nb/ (per_mb*nb/dt))*1000:.0f})")

    # --- 5. background-thread uploads: thread pushes buffers, main dispatches
    def bg_loop():
        dev_q = [None] * nb
        done = threading.Event()

        def uploader():
            for i in range(nb):
                dev_q[i] = jnp.asarray(bufs[i])
            done.set()

        t0 = time.time()
        th = threading.Thread(target=uploader)
        th.start()
        pending = []
        for i in range(nb):
            while dev_q[i] is None:
                time.sleep(0.0002)
            pending.append(fn(dev_q[i], model.layers))
        stacked = (
            jnp.concatenate([l for l, _ in pending]),
            jnp.concatenate([v for _, v in pending]),
        )
        jax.device_get(stacked)
        th.join()
        return time.time() - t0

    for _ in range(3):
        dt = bg_loop()
        print(f"bg-thread uploads: {dt*1000:.1f} ms -> {n_queries/dt:.0f} QPS")

    # --- 6. two dispatch streams? interleave uploads k+1 with dispatch k
    for _ in range(3):
        t0 = time.time()
        d = jnp.asarray(bufs[0])
        pending = []
        for i in range(nb):
            nxt = jnp.asarray(bufs[i + 1]) if i + 1 < nb else None
            pending.append(fn(d, model.layers))
            d = nxt
        stacked = (
            jnp.concatenate([l for l, _ in pending]),
            jnp.concatenate([v for _, v in pending]),
        )
        jax.device_get(stacked)
        dt = time.time() - t0
        print(f"prefetch-next upload: {dt*1000:.1f} ms -> {n_queries/dt:.0f} QPS")


if __name__ == "__main__":
    main()
