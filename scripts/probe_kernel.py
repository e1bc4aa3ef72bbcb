"""Microbench the Pallas intersection kernel at the bench hot-layer geometry.

Reports ms/call and achieved VPU element-op throughput vs the empirically
measured chip peak (bench.measure_chip_peaks), for the current kernel and
candidate tilings.  Used to attribute the gap to op count vs efficiency.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pecos_tpu.ops import intersect as oi

    N, K, P, Qn = 1024, 160, 64, 256
    D = 2**18
    rng = np.random.default_rng(0)
    qids = np.sort(rng.integers(0, D, size=(N, Qn)), axis=1).astype(np.int32)
    qvals = (rng.standard_normal((N, Qn)) * 0.1).astype(np.float32)
    wi = rng.integers(0, D + 1, size=(N, K, P)).astype(np.int32)
    wv = (rng.standard_normal((N, K, P)) * 0.05).astype(np.float32)
    args = [jnp.asarray(a) for a in (qids, qvals, wi, wv)]

    def timeit(fn, iters=16):
        out = fn(*args)
        jax.device_get(out[:1, :1])
        t0 = time.time()
        outs = [fn(*args) for _ in range(iters)]
        jax.device_get(outs[-1][:1, :1])
        return (time.time() - t0) / iters * 1000

    ms = timeit(lambda *a: oi.intersect_scores_pallas(*a, bias_id=D, bias_val=1.0))
    pairs = N * K * P * Qn
    print(f"current kernel: {ms:.2f} ms  ({pairs/ms/1e9*1000:.1f} Gpair/s)")

    # sweep tilings by monkeypatching _pick_tiles
    orig = oi._pick_tiles
    for bn, kt_k in ((8, 8), (8, 16), (16, 4), (16, 8), (32, 4), (32, 8)):
        if N % bn or K % kt_k:
            continue
        oi._pick_tiles = lambda *a, _b=bn, _k=kt_k: (_b, _k)
        try:
            f = oi.intersect_scores_pallas.__wrapped__  # bypass jit cache
            jf = jax.jit(
                lambda qi, qv, a, b: f(qi, qv, a, b, bias_id=D, bias_val=1.0)
            )
            ms = timeit(jf)
            print(f"bn={bn} kt_k={kt_k}: {ms:.2f} ms")
        except Exception as e:
            print(f"bn={bn} kt_k={kt_k}: FAIL {type(e).__name__} {e}")
        finally:
            oi._pick_tiles = orig


if __name__ == "__main__":
    main()
