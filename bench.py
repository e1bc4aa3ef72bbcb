"""Benchmark: XR-Linear beam-search predict QPS on a Wiki-500K-scale synthetic model.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
... roofline + latency keys}.

Model geometry mirrors the reference's headline workload (BASELINE.md):
~500K labels, ~2.4M-dim sparse weights pruned to <=64 nnz/label (the reference
prunes with threshold + max_nonzeros_per_label, linear_solver.hpp:718-778),
beam_size=10, only_topk=20, post=l3-hinge (reference defaults,
pecos/distributed/xmc/xlinear/model.py:675).

vs_baseline compares against the reference CPU QPS recorded in BASELINE.json
["published"]["synthetic_wiki500k_cpu_qps"] (measured by running the reference
on this host); 0.0 if not yet measured.

Roofline attribution: the beam walk's hot work is (a) padded-label-row
gathers (HBM) and (b) the broadcast id-intersection (VPU compare/select/fma)
— there is no large matmul, so MXU peak is irrelevant; we report achieved
HBM bandwidth and achieved VPU throughput against *empirically measured*
chip peaks (microbenchmarks below), and name the binding resource.
Reference hot path this attributes against: inference.hpp:927-1148.
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
            from pecos_tpu.xmc.inference import build_parent_packed

            ids = rng.integers(0, Db, size=(n_labels, nnz_per_label), dtype=np.int32)
            vals = (rng.standard_normal((n_labels, nnz_per_label)) * 0.05).astype(np.float32)
            packed = np.concatenate([ids, vals.view(np.int32)], axis=1)
            layers.append(
                DeviceLayer(
                    "plabel",
                    n_labels,
                    jnp.asarray(children),
                    packed=jnp.asarray(packed),
                    parent_packed=jnp.asarray(build_parent_packed(packed, children)),
                )
            )
        n_parents = n_labels
    return CompiledHierModel(layers, bias=1.0, nr_features=D)


def measure_chip_peaks():
    """Empirical HBM bandwidth and VPU fp32 throughput on this chip.

    block_until_ready is unreliable through the tunnel, so every timing
    dispatches a pipeline and fetches a scalar-sized tail to synchronize.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    # Each dispatch must be kernel-dominated: per-dispatch overhead through
    # the tunnel is ~1-5 ms, so the measured kernel needs >=10 ms of work.
    # HBM: K full read+write sweeps of a 256 MB array inside ONE jit
    # (x = x * c each sweep; the data dependence stops loop hoisting).
    K_BW = 16
    a = jnp.ones((64 * 1024 * 1024,), jnp.float32)  # 256 MB

    f_bw = jax.jit(
        lambda x, c: lax.fori_loop(0, K_BW, lambda i, y: y * c, x)
    )
    c = jnp.float32(1.0000001)
    x = f_bw(a, c)
    jax.device_get(x[:1])
    iters = 4
    t0 = time.time()
    for _ in range(iters):
        x = f_bw(x, c)
    jax.device_get(x[:1])
    hbm_gbps = 2 * a.nbytes * K_BW * iters / (time.time() - t0) / 1e9

    # VPU: 64 inline fma per element per sweep (128 flops / 8 bytes moved =
    # 16 flops/byte, ~4x over the VPU ridge point -> compute-bound)
    K_VPU = 16
    U = 64
    x0 = jnp.full((8 * 1024 * 1024,), 1.0000001, jnp.float32)  # 32 MB

    def sweep(i, y):
        cc = jnp.float32(0.9999999)
        for _ in range(U):
            y = y * cc + cc
        return y

    f_vpu = jax.jit(lambda x: lax.fori_loop(0, K_VPU, sweep, x))
    x = f_vpu(x0)
    jax.device_get(x[:1])
    t0 = time.time()
    for _ in range(iters):
        x = f_vpu(x)
    jax.device_get(x[:1])
    vpu_tops = 2.0 * U * K_VPU * x0.size * iters / (time.time() - t0) / 1e12
    return hbm_gbps, vpu_tops


def analytic_batch_costs(model, batch, cap, beam_size, only_topk):
    """Analytic HBM bytes and VPU ops per query batch for the beam walk.

    plabel layer: gathers (batch*K) packed rows of 2P int32 from HBM and runs
    the broadcast intersection — ~2 VPU ops (compare + select/accumulate) per
    (candidate, weight-slot, query-slot) triple plus the final fma.
    dense-from-sparse layer: gathers batch*cap rows of L f32 and one einsum.
    """
    bytes_total = 0.0
    vpu_ops = 0.0
    n_parents = model.layers[0].children.shape[0]
    width = n_parents
    for d, layer in enumerate(model.layers):
        maxc = layer.children.shape[1]
        K = width * maxc
        if layer.kind == "dense":
            L = layer.W.shape[1]
            bytes_total += batch * cap * L * 4  # gathered W rows
            vpu_ops += 2.0 * batch * cap * L  # einsum (VPU-sized, L tiny)
        else:
            P = layer.packed.shape[1] // 2
            bytes_total += batch * K * (2 * P) * 4  # packed row gathers
            vpu_ops += batch * K * P * (2.0 * cap + 3.0)  # intersection + fma + bias
        width = only_topk if d == len(model.layers) - 1 else beam_size
    return bytes_total, vpu_ops


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as smat

    t_setup = time.time()
    model = build_synthetic_model()
    rng = np.random.default_rng(1)
    batch = 1024
    n_queries = 8192  # 8 batches; per-batch uploads overlap device compute
    # sparse TF-IDF-like queries: ~256 nonzeros/row (Wiki-500K nnz(X)/N ~= 387)
    nnz = 256
    D = model.nr_features
    rows = np.repeat(np.arange(n_queries), nnz)
    cols = rng.integers(0, D, size=n_queries * nnz)
    vals = rng.standard_normal(n_queries * nnz).astype(np.float32) * 0.1
    Xq = smat.csr_matrix((vals, (rows, cols)), shape=(n_queries, D))

    # warmup (compile).  Query values ride the wire as float16 (halves their
    # upload bytes through the ~70 MB/s tunnel); measured top-20 agreement vs
    # the exact float32 wire at this geometry is 99.92% (benchmarks/README.md),
    # and scores on-device are still computed in float32.
    wire_dtype = "float16"
    P = model.predict(
        Xq[:batch], beam_size=10, only_topk=20, batch_size=batch,
        wire_value_dtype=wire_dtype,
    )
    setup_s = time.time() - t_setup

    iters = 4
    best = None
    for _ in range(iters):
        t0 = time.time()
        P = model.predict(
            Xq, beam_size=10, only_topk=20, batch_size=batch,
            wire_value_dtype=wire_dtype,
        )
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    qps = n_queries / best

    # compute-only (resident inputs, pipelined dispatches, tail fetch)
    from pecos_tpu.xmc.inference import prepare_queries_padded

    ids_all, vals_all = prepare_queries_padded(Xq[:batch])
    cap = ids_all.shape[1]
    fn = model._sparse_predictor(10, 20, ("l3-hinge",) * model.depth, batch, cap)
    ids_d, vals_d = jnp.asarray(ids_all), jnp.asarray(vals_all)
    out = fn(ids_d, vals_d, model.layers)
    jax.device_get(out)
    citers = 16
    t0 = time.time()
    outs = [fn(ids_d, vals_d, model.layers) for _ in range(citers)]
    jax.device_get(outs[-1])
    compute_ms = (time.time() - t0) / citers * 1000

    # batch-1 realtime latency through the public serving API: persistent
    # session, one dispatch + one fetch per call (p50/p99), and the
    # engine-only on-device latency via chained dependent walks — separates
    # engine latency from the tunnel round trip (scripts/probe_latency.py
    # measured the empty dispatch+fetch RTT alone at ~28 ms on this testbed;
    # a host-attached chip pays PCIe microseconds).
    sess = model.realtime_session(beam_size=10, only_topk=20, batch=1, cap=cap)
    X1 = Xq[:1]
    sess.predict(X1)  # warm the wire path
    lat = []
    for t in range(50):
        t0 = time.time()
        sess.predict(X1)
        lat.append((time.time() - t0) * 1000)
    b1_p50 = float(np.percentile(lat, 50))
    b1_p99 = float(np.percentile(lat, 99))
    b1_dev_ms = sess.on_device_latency_ms(X1, iters=32)

    # empty dispatch+fetch RTT (the serving floor this testbed's tunnel adds)
    f_id = jax.jit(lambda x: x + 1.0)
    xz = jnp.zeros((1, 8), jnp.float32)
    jax.device_get(f_id(xz))
    rtts = []
    for _ in range(20):
        t0 = time.time()
        jax.device_get(f_id(xz))
        rtts.append((time.time() - t0) * 1000)
    rtt_p50 = float(np.percentile(rtts, 50))

    # empirical roofline
    hbm_gbps, vpu_tops = measure_chip_peaks()
    bytes_b, ops_b = analytic_batch_costs(model, batch, cap, 10, 20)
    t_comp = compute_ms / 1000
    bw_pct = bytes_b / t_comp / 1e9 / hbm_gbps * 100
    vpu_pct = ops_b / t_comp / 1e12 / vpu_tops * 100
    bound = "vpu-intersection" if vpu_pct >= bw_pct else "hbm-gather"

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
                "compute_ms_per_1024": round(compute_ms, 2),
                "compute_only_qps": round(batch / t_comp, 1),
                "batch1_p50_ms": round(b1_p50, 2),
                "batch1_p99_ms": round(b1_p99, 2),
                "batch1_on_device_ms": round(b1_dev_ms, 2),
                "tunnel_rtt_ms": round(rtt_p50, 2),
                "roofline": {
                    "chip_peak_hbm_gbps_measured": round(hbm_gbps, 1),
                    "chip_peak_vpu_tops_measured": round(vpu_tops, 2),
                    "analytic_bytes_per_batch_mb": round(bytes_b / 1e6, 1),
                    "analytic_vpu_gops_per_batch": round(ops_b / 1e9, 1),
                    "achieved_hbm_pct": round(bw_pct, 1),
                    "achieved_vpu_pct": round(vpu_pct, 1),
                    "bound": bound,
                },
            }
        )
    )
    print(
        f"# setup+compile: {setup_s:.1f}s, end-to-end best: {best:.3f}s for {n_queries} queries, "
        f"compute-only {compute_ms:.1f} ms/batch, batch-1 p50 {b1_p50:.1f} ms "
        f"(on-device {b1_dev_ms:.1f} ms + tunnel RTT {rtt_p50:.1f} ms), "
        f"pred nnz/row: {P.nnz / P.shape[0]:.1f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
