"""Measure e2e predict with the compact wire format (f32 vs bf16 values),
and the top-k agreement between the two."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import scipy.sparse as smat

    from bench import build_synthetic_model

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

    results = {}
    for wd in ["float32", "bfloat16"]:
        P = model.predict(Xq[:batch], beam_size=10, only_topk=20, batch_size=batch,
                          wire_value_dtype=wd)  # compile
        best = None
        for _ in range(4):
            t0 = time.time()
            P = model.predict(Xq, beam_size=10, only_topk=20, batch_size=batch,
                              wire_value_dtype=wd)
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        results[wd] = P
        print(f"wire={wd}: best {best*1000:.1f} ms -> {n_queries/best:.0f} QPS")

    # agreement: top-1 and top-20-set overlap between f32 and bf16 wire
    A, B = results["float32"], results["bfloat16"]
    top1_agree = 0
    set_overlap = 0.0
    for i in range(n_queries):
        ra = A.indices[A.indptr[i]:A.indptr[i + 1]]
        va = A.data[A.indptr[i]:A.indptr[i + 1]]
        rb = B.indices[B.indptr[i]:B.indptr[i + 1]]
        vb = B.data[B.indptr[i]:B.indptr[i + 1]]
        ta = ra[np.argmax(va)]
        tb = rb[np.argmax(vb)]
        top1_agree += ta == tb
        set_overlap += len(np.intersect1d(ra, rb)) / max(len(ra), 1)
    print(f"top-1 agreement: {top1_agree/n_queries:.4f}, "
          f"top-20 set overlap: {set_overlap/n_queries:.4f}")

    if os.environ.get("SKIP_B2048"):
        return
    # batch=2048 variant (fewer dispatches)
    for wd in ["float32", "bfloat16"]:
        P = model.predict(Xq[:2048], beam_size=10, only_topk=20, batch_size=2048,
                          wire_value_dtype=wd)
        best = None
        for _ in range(3):
            t0 = time.time()
            P = model.predict(Xq, beam_size=10, only_topk=20, batch_size=2048,
                              wire_value_dtype=wd)
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        print(f"wire={wd} batch=2048: best {best*1000:.1f} ms -> {n_queries/best:.0f} QPS")


if __name__ == "__main__":
    main()
