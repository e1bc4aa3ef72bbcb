"""Batch-1 latency floor analysis for the XR-Linear beam predictor.

BENCH_r03 measured batch-1 p50 at 29.6 ms — essentially equal to the
batch-1024 compute time — and left open WHERE it goes (VERDICT round 3,
weak #3).  This probe decomposes it:

  1. empty-dispatch RTT       — jit identity on a (1,8) array, fetch result:
                                the tunnel's dispatch+fetch floor.
  2. pipelined on-device time — N sequential DEPENDENT batch-1 chain walks
                                (each consumes the previous output so the
                                device cannot overlap them), fetch once:
                                per-call on-device latency without the
                                per-call tunnel fetch.
  3. batch-1 end-to-end p50   — what a serving caller sees per query.

If (1) ~= (3) and (2) is small, the 30 ms is the remote-tunnel round trip —
an environment artifact of this testbed (the chip is reached over a network
tunnel), not a property of the engine; a host-attached chip pays PCIe/ICI
microseconds instead.  Reference contrast: the C++ realtime path serves a
query in ~0.9 ms on one LOCAL core (inference.hpp:2447-2488) — the honest
comparison to that is (2), the on-device time.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def percentiles(xs):
    return float(np.percentile(xs, 50)), float(np.percentile(xs, 99))


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as smat

    from bench import build_synthetic_model
    from pecos_tpu.xmc.inference import prepare_queries_padded

    print(f"backend: {jax.devices()[0].platform} {jax.devices()[0].device_kind}")

    # --- 1. empty-dispatch RTT ------------------------------------------
    f_id = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((1, 8), jnp.float32)
    jax.device_get(f_id(x))
    lat = []
    for _ in range(50):
        t0 = time.time()
        jax.device_get(f_id(x))
        lat.append((time.time() - t0) * 1000)
    rtt_p50, rtt_p99 = percentiles(lat)
    print(f"empty dispatch+fetch: p50 {rtt_p50:.2f} ms  p99 {rtt_p99:.2f} ms")

    # --- model + one query ----------------------------------------------
    model = build_synthetic_model()
    rng = np.random.default_rng(1)
    D = model.nr_features
    nnz = 256
    cols = rng.integers(0, D, size=nnz)
    vals = rng.standard_normal(nnz).astype(np.float32) * 0.1
    Xq = smat.csr_matrix((vals, (np.zeros(nnz, int), cols)), shape=(1, D))
    ids_np, vals_np = prepare_queries_padded(Xq)
    cap = ids_np.shape[1]
    fn1 = model._sparse_predictor(10, 20, ("l3-hinge",) * model.depth, 1, cap)
    i1, v1 = jnp.asarray(ids_np), jnp.asarray(vals_np)
    jax.device_get(fn1(i1, v1, model.layers))

    # --- 3. end-to-end batch-1 p50 --------------------------------------
    lat = []
    for _ in range(50):
        t0 = time.time()
        jax.device_get(fn1(i1, v1, model.layers))
        lat.append((time.time() - t0) * 1000)
    e2e_p50, e2e_p99 = percentiles(lat)
    print(f"batch-1 end-to-end:  p50 {e2e_p50:.2f} ms  p99 {e2e_p99:.2f} ms")

    # --- 2. pipelined on-device latency ---------------------------------
    # Chain the walks: shift the query ids by the previous output's top
    # label (mod D) so call k+1 depends on call k — the device must run
    # them strictly sequentially, but only ONE fetch crosses the tunnel.
    @jax.jit
    def chained(i, v, layers):
        lbl, _ = fn1(i, v, layers)
        shift = (lbl[0, 0] % jnp.int32(7)).astype(jnp.int32)
        return jnp.where(i >= D + 1, i, (i + shift) % jnp.int32(D)), v, lbl

    K = 32
    ii, vv = i1, v1
    out = None
    ii2, vv2, out = chained(ii, vv, model.layers)
    jax.device_get(out)  # warm
    t0 = time.time()
    ii, vv = i1, v1
    for _ in range(K):
        ii, vv, out = chained(ii, vv, model.layers)
    jax.device_get(out)
    dev_ms = (time.time() - t0) * 1000 / K
    print(f"on-device batch-1 (chained x{K}, one fetch): {dev_ms:.2f} ms/query")

    print(
        "\nfloor analysis: end-to-end p50 = on-device + tunnel RTT "
        f"({dev_ms:.1f} + {rtt_p50:.1f} ~= {e2e_p50:.1f} ms)"
        if abs(dev_ms + rtt_p50 - e2e_p50) < 0.35 * e2e_p50
        else "\nfloor analysis: decomposition does NOT close — investigate"
    )


if __name__ == "__main__":
    main()
