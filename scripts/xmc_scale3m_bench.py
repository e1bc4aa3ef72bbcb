"""Amazon-3M-geometry XR-Linear scale demo on one TPU chip.

The reference's design point is the ~3M-label regime (reference README.md:9;
data stats: /root/reference/examples/spmm/README.md:86 — amazon-3m has
N=1,717,899 / D=337,067 / L=2,812,281).  This script runs the FULL pecos_tpu
pipeline at that label-space geometry on synthetic hierarchical data:

  1. generate X/Y at D=337,067, L=2,812,281 (N scaled to --n-trn; the label
     space — the dimension that defines the regime — is kept exact)
  2. PIFA label embeddings + hierarchical k-means index (sampled schedule)
  3. train the full chain (bucketed/sparse-rows solvers engage automatically)
  4. compile to the mmap predict-only layout and predict via the lazy
     STREAMING model (MmapCompiledHierModel) so the bottom layer never has
     to be device-resident all at once
  5. record stage wall-clock + peak HBM to benchmarks/xmc_scale_3m_tpu.json

Stages checkpoint to --work so a crash resumes instead of regenerating.

  python scripts/xmc_scale3m_bench.py --work /tmp/xmc3m \
      --bench-out benchmarks/xmc_scale_3m_tpu.json
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import scipy.sparse as smat

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

D_A3M = 337_067
L_A3M = 2_812_281


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def peak_hbm_gb():
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return float(stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))) / 2**30
    except Exception:
        pass
    return -1.0


def gen_data(n_trn, n_tst, d, L, seed=7):
    """Hierarchically structured sparse XMC data at amazon-3m geometry.

    Same recipe as scripts/xmc_bench.py:make_data but built WITHOUT ever
    materializing the (L, d) center matrix: instance rows are assembled from
    per-level prototype lookups, so memory stays O(nnz(X)) even at L=2.8M."""
    rng = np.random.default_rng(seed)
    level_nnz, leaf_nnz = 6, 6
    blocks = []
    size = 16
    while size < L:
        blocks.append(size)
        size *= 16
    protos = []  # (block, csr of n_protos x d)
    for block in blocks:
        n_protos = -(-L // block)
        rows = np.repeat(np.arange(n_protos), level_nnz)
        cols = rng.integers(0, d, size=n_protos * level_nnz)
        vals = rng.uniform(1.0, 2.0, size=n_protos * level_nnz).astype(np.float32)
        protos.append((block, smat.csr_matrix((vals, (rows, cols)), shape=(n_protos, d))))
    log(f"gen: {len(protos)} prototype levels (blocks {blocks})")

    def leaf_delta(labels):
        """Label-specific sparse delta, generated lazily per drawn label via
        a per-label seeded stream (deterministic, no (L, d) materialization)."""
        n = labels.shape[0]
        cols = np.empty((n, leaf_nnz), dtype=np.int64)
        vals = np.empty((n, leaf_nnz), dtype=np.float32)
        # vectorized counter-based draw: hash label id into lanes
        base = labels.astype(np.uint64)[:, None] * np.uint64(0x9E3779B97F4A7C15)
        lane = np.arange(leaf_nnz, dtype=np.uint64)[None, :] * np.uint64(0xBF58476D1CE4E5B9)
        h = base + lane
        h ^= h >> np.uint64(30)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
        cols[:] = (h % np.uint64(d)).astype(np.int64)
        vals[:] = 0.8 + 1.2 * ((h >> np.uint64(16)) % np.uint64(10_000)).astype(np.float32) / 10_000.0
        return cols, vals

    def make(n, seed_, prim_pool=None):
        r = np.random.default_rng(seed_)
        if prim_pool is None:
            prim = r.integers(0, L, size=n)
        else:
            # test labels are drawn from train-supported labels — the standard
            # XMC test-set property (amazon-3m test labels overwhelmingly have
            # train support); without it P@k measures label-coverage luck
            prim = prim_pool[r.integers(0, prim_pool.shape[0], size=n)]
        # row = sum of its path prototypes + leaf delta + noise
        parts_rows, parts_cols, parts_vals = [], [], []
        for block, P in protos:
            sel = P[prim // block]
            sel = sel.tocoo()
            parts_rows.append(sel.row)
            parts_cols.append(sel.col)
            parts_vals.append(sel.data)
        dc_, dv = leaf_delta(prim)
        parts_rows.append(np.repeat(np.arange(n), leaf_nnz))
        parts_cols.append(dc_.reshape(-1))
        parts_vals.append(dv.reshape(-1))
        noise_nnz = 6
        parts_rows.append(np.repeat(np.arange(n), noise_nnz))
        parts_cols.append(r.integers(0, d, size=n * noise_nnz))
        parts_vals.append(r.uniform(0, 0.8, size=n * noise_nnz).astype(np.float32))
        X = smat.csr_matrix(
            (np.concatenate(parts_vals), (np.concatenate(parts_rows), np.concatenate(parts_cols))),
            shape=(n, d),
        )
        X.sum_duplicates()
        X.sort_indices()
        # labels: the primary label + 2 same-16-block siblings (hierarchical
        # co-occurrence, like co-purchased products in one leaf category)
        sib1 = (prim // 16) * 16 + r.integers(0, 16, size=n)
        sib2 = (prim // 16) * 16 + r.integers(0, 16, size=n)
        yr = np.concatenate([np.arange(n)] * 3)
        yc = np.clip(np.concatenate([prim, sib1, sib2]), 0, L - 1)
        Y = smat.csr_matrix((np.ones(3 * n, np.float32), (yr, yc)), shape=(n, L))
        Y.sum_duplicates()
        Y.data[:] = 1.0
        return X, Y, prim

    X_trn, Y_trn, prim_trn = make(n_trn, seed + 1)
    X_tst, Y_tst, _ = make(n_tst, seed + 2, prim_pool=np.unique(prim_trn))
    return X_trn, Y_trn, X_tst, Y_tst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/xmc3m")
    ap.add_argument("--bench-out", default=os.path.join(REPO, "benchmarks", "xmc_scale_3m_tpu.json"))
    ap.add_argument("--n-trn", type=int, default=600_000)
    ap.add_argument("--n-tst", type=int, default=2_048)
    ap.add_argument("--d", type=int, default=D_A3M)
    ap.add_argument("--L", type=int, default=L_A3M)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--stage", default="all", help="all|gen|index|train|compile|predict")
    args = ap.parse_args()
    os.makedirs(args.work, exist_ok=True)
    times_path = os.path.join(args.work, "times.json")
    times = json.load(open(times_path)) if os.path.exists(times_path) else {}

    def save_times():
        with open(times_path, "w") as f:
            json.dump(times, f, indent=1)

    from pecos_tpu.utils import smat_util

    # -- stage 1: data ------------------------------------------------------
    data_path = os.path.join(args.work, "data.npz")
    if not os.path.exists(data_path):
        log(f"generating data: N={args.n_trn} D={args.d} L={args.L}")
        t0 = time.time()
        X_trn, Y_trn, X_tst, Y_tst = gen_data(args.n_trn, args.n_tst, args.d, args.L)
        times["gen_seconds"] = time.time() - t0
        save_times()
        smat_util.save_matrix(os.path.join(args.work, "X_trn.npz"), X_trn)
        smat_util.save_matrix(os.path.join(args.work, "Y_trn.npz"), Y_trn)
        smat_util.save_matrix(os.path.join(args.work, "X_tst.npz"), X_tst)
        smat_util.save_matrix(os.path.join(args.work, "Y_tst.npz"), Y_tst)
        np.savez(data_path, done=1)
        log(f"data done in {times['gen_seconds']:.1f}s nnzX={X_trn.nnz} nnzY={Y_trn.nnz}")
    if args.stage == "gen":
        return

    X_trn = smat_util.load_matrix(os.path.join(args.work, "X_trn.npz")).tocsr()
    Y_trn = smat_util.load_matrix(os.path.join(args.work, "Y_trn.npz")).tocsr()

    # -- stage 2: PIFA + index ---------------------------------------------
    chain_path = os.path.join(args.work, "chain")
    if not os.path.exists(os.path.join(chain_path, "config.json")):
        from pecos_tpu.xmc import Indexer, LabelEmbeddingFactory

        log("PIFA label embeddings ...")
        t0 = time.time()
        Z = LabelEmbeddingFactory.create(Y=Y_trn, X=X_trn, method="pifa")
        times["pifa_seconds"] = time.time() - t0
        log(f"PIFA {times['pifa_seconds']:.1f}s: Z {Z.shape} nnz={Z.nnz}")
        t0 = time.time()
        chain = Indexer.gen(
            Z,
            nr_splits=16,
            max_leaf_size=100,
            do_sample=True,
            max_sample_rate=0.3,
            min_sample_rate=0.05,
            warmup_ratio=0.4,
            kmeans_max_iter=10,
            seed=0,
        )
        times["index_seconds"] = time.time() - t0
        times["chain_shapes"] = [list(c.shape) for c in chain]
        times["peak_hbm_index_gb"] = peak_hbm_gb()
        save_times()
        chain.save(chain_path)
        log(f"index {times['index_seconds']:.1f}s shapes={times['chain_shapes']}")
    if args.stage in ("index",):
        return

    # -- stage 3: train -------------------------------------------------------
    model_dir = os.path.join(args.work, "model")
    if not os.path.exists(os.path.join(model_dir, "param.json")):
        from pecos_tpu.utils.cluster_util import ClusterChain
        from pecos_tpu.xmc.xlinear import XLinearModel

        chain = ClusterChain.load(chain_path)
        log("training full chain ...")
        t0 = time.time()
        model = XLinearModel.train(
            X_trn,
            Y_trn,
            C=chain,
            negative_sampling_scheme="tfn",
            threshold=0.1,
            max_nonzeros_per_label=64,
            beam_size=args.beam,
            only_topk=args.topk,
        )
        times["train_seconds"] = time.time() - t0
        times["peak_hbm_train_gb"] = peak_hbm_gb()
        save_times()
        model.save(model_dir)
        log(f"train {times['train_seconds']:.1f}s  peakHBM={times['peak_hbm_train_gb']:.2f}GB")
        del model
    if args.stage == "train":
        return

    # -- stage 4: compile to the mmap predict-only layout ---------------------
    mmap_dir = os.path.join(args.work, "model_mmap")
    if not os.path.exists(os.path.join(mmap_dir, "compiled", "compiled.json")):
        from pecos_tpu.xmc.xlinear import XLinearModel

        log("compiling mmap predict-only model ...")
        t0 = time.time()
        XLinearModel.compile_mmap_model(model_dir, mmap_dir)
        times["compile_seconds"] = time.time() - t0
        save_times()
        log(f"compile {times['compile_seconds']:.1f}s")
    if args.stage == "compile":
        return

    # -- stage 5: streaming predict -------------------------------------------
    from pecos_tpu.xmc.base import PredictOnlyHierModel
    from pecos_tpu.xmc.inference import load_compiled_layers
    from pecos_tpu.xmc.xlinear import XLinearModel
    from pecos_tpu.utils.smat_util import Metrics

    X_tst = smat_util.load_matrix(os.path.join(args.work, "X_tst.npz")).tocsr()
    Y_tst = smat_util.load_matrix(os.path.join(args.work, "Y_tst.npz")).tocsr()
    log("loading lazy streaming model (bottom layer streams from disk) ...")
    streaming = XLinearModel(
        PredictOnlyHierModel(
            load_compiled_layers(os.path.join(mmap_dir, "compiled"), lazy=True)
        )
    )
    log("predict warmup (compile) ...")
    streaming.predict(X_tst[:1024], beam_size=args.beam, only_topk=args.topk)
    t0 = time.time()
    P = streaming.predict(X_tst, beam_size=args.beam, only_topk=args.topk)
    dt = time.time() - t0
    times["predict_qps_streaming"] = X_tst.shape[0] / dt
    times["peak_hbm_predict_gb"] = peak_hbm_gb()
    m = Metrics.generate(Y_tst, P, topk=args.topk)
    times["prec"] = list(map(float, m.prec))
    times["recall"] = list(map(float, m.recall))
    save_times()
    log(
        f"streaming predict: {times['predict_qps_streaming']:.0f} QPS  "
        f"P@1={m.prec[0]:.4f} R@{args.topk}={m.recall[-1]:.4f}  "
        f"peakHBM={times['peak_hbm_predict_gb']:.2f}GB"
    )

    out = {
        "engine": "pecos_tpu",
        "geometry": "amazon-3m (synthetic; exact D and L, N scaled)",
        "n_trn": args.n_trn,
        "n_tst": args.n_tst,
        "d": args.d,
        "L": args.L,
        "beam": args.beam,
        "topk": args.topk,
        **times,
    }
    with open(args.bench_out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.bench_out}")


if __name__ == "__main__":
    main()
