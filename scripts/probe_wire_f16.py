"""Measure e2e predict QPS and top-k agreement for f32 vs f16 vs bf16 wire
values at the bench geometry (synthetic Wiki-500K, 8x1024 queries)."""

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
    for dt in ("float32", "float16", "bfloat16", "uint8"):
        # warm compile
        model.predict(Xq[:batch], beam_size=10, only_topk=20, batch_size=batch,
                      wire_value_dtype=dt)
        best = None
        for _ in range(4):
            t0 = time.time()
            P = model.predict(Xq, beam_size=10, only_topk=20, batch_size=batch,
                              wire_value_dtype=dt)
            d = time.time() - t0
            best = d if best is None or d < best else best
        results[dt] = (P, best)
        print(f"{dt}: best {best*1000:.1f} ms -> {n_queries/best:.0f} QPS")

    P32 = results["float32"][0]
    for dt in ("float16", "bfloat16", "uint8"):
        P = results[dt][0]
        # per-row top-20 label agreement + top-1 agreement
        agree = 0
        top1 = 0
        serr = []
        for i in range(n_queries):
            a = P32.indices[P32.indptr[i]:P32.indptr[i + 1]]
            b = P.indices[P.indptr[i]:P.indptr[i + 1]]
            av = P32.data[P32.indptr[i]:P32.indptr[i + 1]]
            bv = P.data[P.indptr[i]:P.indptr[i + 1]]
            agree += len(np.intersect1d(a, b)) / max(len(a), 1)
            # rows are stored topk-sorted by score
            top1 += int(a[np.argmax(av)] == b[np.argmax(bv)]) if len(a) and len(b) else 1
            common, ia, ib = np.intersect1d(a, b, return_indices=True)
            if len(common):
                serr.append(np.max(np.abs(av[ia] - bv[ib]) / (np.abs(av[ia]) + 1e-9)))
        print(f"{dt}: top-20 agreement {agree/n_queries*100:.3f}%, "
              f"top-1 agreement {top1/n_queries*100:.3f}%, "
              f"max rel score err {np.max(serr):.2e}")


if __name__ == "__main__":
    main()
