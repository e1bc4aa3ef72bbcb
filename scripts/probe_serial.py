"""Does the tunnel overlap host->device uploads with device compute?

Measures at the bench.py geometry (wire path, float16 values):
  a. upload-only pipeline: enqueue all 8 wire buffers, sync
  b. compute-only: buffers resident, 8 dispatches, sync
  c. interleaved loop exactly as predict() does it
If c ~= a + b the stream is serial; if c ~= max(a, b) it overlaps.
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

    wd = "float16"
    # warm compile through the public path
    model.predict(Xq[:batch], beam_size=10, only_topk=20, batch_size=batch,
                  wire_value_dtype=wd)

    ids_all, vals_all = prepare_queries_padded(Xq)
    cap = ids_all.shape[1]
    nb = n_queries // batch
    bufs = [
        encode_wire_batch(
            ids_all[i * batch : (i + 1) * batch],
            vals_all[i * batch : (i + 1) * batch],
            D,
            wd,
        )
        for i in range(nb)
    ]
    wire_mb = sum(b.nbytes for b in bufs) / 1e6
    print(f"wire total: {wire_mb:.2f} MB in {nb} buffers, cap={cap}")

    fn = model._wire_predictor(10, 20, ("l3-hinge",) * model.depth, batch, cap, wd)
    f_touch = jax.jit(lambda a: a.ravel()[0])

    # a. upload-only
    for trial in range(3):
        t0 = time.time()
        devs = [jnp.asarray(b) for b in bufs]
        jax.block_until_ready(devs)
        up_s = time.time() - t0
        print(f"a upload-only: {up_s*1000:.1f} ms  ({wire_mb/up_s:.1f} MB/s)")

    # b. compute-only (buffers already resident from last trial)
    for trial in range(3):
        t0 = time.time()
        outs = [fn(d, model.layers) for d in devs]
        jax.block_until_ready(outs)
        comp_s = time.time() - t0
        print(f"b compute-only: {comp_s*1000:.1f} ms")

    # c. interleaved (as predict does: asarray then dispatch, per batch)
    for trial in range(3):
        t0 = time.time()
        outs = []
        for b in bufs:
            outs.append(fn(jnp.asarray(b), model.layers))
        jax.block_until_ready(outs)
        inter_s = time.time() - t0
        print(f"c interleaved: {inter_s*1000:.1f} ms")

    # d. per-batch asarray enqueue cost (does asarray block for the wire?)
    t0 = time.time()
    d0 = jnp.asarray(bufs[0])
    enq_s = time.time() - t0
    jax.block_until_ready(d0)
    tot_s = time.time() - t0
    print(f"d asarray enqueue: {enq_s*1000:.1f} ms, to-ready: {tot_s*1000:.1f} ms")


if __name__ == "__main__" and not os.environ.get("PROBE_CHUNKED"):
    main()


def chunked():
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

    wd = "float16"
    model.predict(Xq[:batch], beam_size=10, only_topk=20, batch_size=batch,
                  wire_value_dtype=wd)
    ids_all, vals_all = prepare_queries_padded(Xq)
    cap = ids_all.shape[1]
    nb = n_queries // batch
    bufs = [
        encode_wire_batch(
            ids_all[i * batch : (i + 1) * batch],
            vals_all[i * batch : (i + 1) * batch], D, wd)
        for i in range(nb)
    ]
    fn = model._wire_predictor(10, 20, ("l3-hinge",) * model.depth, batch, cap, wd)

    for nchunk in (8, 4, 2, 1):
        per = nb // nchunk
        chunks = [np.concatenate(bufs[i * per : (i + 1) * per], axis=0)
                  for i in range(nchunk)]
        # upload-only pipeline
        for trial in range(2):
            t0 = time.time()
            devs = [jnp.asarray(c) for c in chunks]
            jax.block_until_ready(devs)
            up = time.time() - t0
        # interleaved: upload chunk, dispatch its batches (slice on device)
        for trial in range(3):
            t0 = time.time()
            outs = []
            for c in chunks:
                d = jnp.asarray(c)
                for j in range(per):
                    outs.append(fn(d[j * batch : (j + 1) * batch], model.layers))
            jax.block_until_ready(outs)
            inter = time.time() - t0
        print(f"nchunk={nchunk}: upload-only {up*1000:.1f} ms, interleaved {inter*1000:.1f} ms")


if __name__ == "__main__" and os.environ.get("PROBE_CHUNKED"):
    chunked()
