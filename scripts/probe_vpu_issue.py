"""VPU issue-rate probe: is the intersection kernel at speed-of-light?

BENCH_r03 reported the beam-walk intersection at "50.4% of VPU peak" —
but the peak was measured with FMAs counted as 2 flops each, while the
intersection issues 1-result compares/selects/adds.  If the VPU issues
~1 vector op per cycle regardless of whether it's an FMA, the right
roofline for the intersection is the ISSUE RATE (vector ops/s), not the
flop rate.  This probe measures, at matched array geometry:

  a. fma chain       (y = y*c + c)           -> flops/s and ops/s
  b. cmp+sel+add mix (the intersection's mix) -> ops/s
  c. int16 / int8 compare-select             -> ops/s (do narrow dtypes
                                                issue wider on this VPU?)
  d. the isolated intersection kernel itself  -> pairs/s, implied ops/pair

If (b) ops/s ~= (a) ops/s (where each fma is ONE op), the 50.4% was an
attribution artifact and the kernel has no pure-engineering headroom; only
algorithmic pair-count reduction or wider-issue dtypes can beat it.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def timed(f, *args, iters=4):
    import jax

    x = f(*args)
    jax.device_get(x.ravel()[:1])
    t0 = time.time()
    for _ in range(iters):
        x = f(*args)
    jax.device_get(x.ravel()[:1])
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print(f"backend: {jax.devices()[0].platform} {jax.devices()[0].device_kind}")
    SZ = 8 * 1024 * 1024  # 32 MB fp32: compute-bound at the unroll depths below
    K = 16

    # --- a. fma chain ----------------------------------------------------
    U = 64
    xf = jnp.full((SZ,), 1.0000001, jnp.float32)

    def fma_sweep(i, y):
        c = jnp.float32(0.9999999)
        for _ in range(U):
            y = y * c + c
        return y

    f_fma = jax.jit(lambda x: lax.fori_loop(0, K, fma_sweep, x))
    dt = timed(f_fma, xf)
    fma_ops = U * K * SZ / dt
    print(f"fma:        {fma_ops/1e12:.3f} T-fma/s  ({2*fma_ops/1e12:.3f} Tflop/s)")

    # --- b. cmp+sel+add mix (int32 ids, f32 vals — the intersection mix) --
    xi = jnp.arange(SZ, dtype=jnp.int32)

    def isect_sweep(i, carry):
        ids, acc = carry
        # per unroll step: 1 cmp (int32), 1 select (f32), 1 add (f32) = 3 ops
        for u in range(U // 3):
            m = ids == (i + u)
            acc = acc + jnp.where(m, jnp.float32(1.5), jnp.float32(0.0))
        return ids, acc

    f_mix = jax.jit(
        lambda ids, acc: lax.fori_loop(0, K, isect_sweep, (ids, acc))[1]
    )
    dt = timed(f_mix, xi, jnp.zeros((SZ,), jnp.float32))
    mix_ops = 3 * (U // 3) * K * SZ / dt
    print(f"cmp+sel+add: {mix_ops/1e12:.3f} T-ops/s  (vs fma issue {fma_ops/1e12:.3f} T-ops/s"
          f" -> {mix_ops/fma_ops:.2f}x)")

    # --- c. narrow dtypes --------------------------------------------------
    for dt_name, dtype in [("int16", jnp.int16), ("int8", jnp.int8)]:
        xn = jnp.arange(SZ, dtype=jnp.int32).astype(dtype)

        def nsweep(i, carry, dtype=dtype):
            ids, acc = carry
            # 2 ops per unroll step: cmp + masked accumulate (same dtype, wraps)
            for u in range(U // 2):
                m = ids == dtype(u)
                acc = acc + m.astype(dtype)
            return ids, acc

        f_n = jax.jit(lambda ids, acc: lax.fori_loop(0, K, nsweep, (ids, acc))[1])
        try:
            t = timed(f_n, xn, jnp.zeros((SZ,), dtype))
            ops = 2 * (U // 2) * K * SZ / t
            print(f"{dt_name} cmp+add: {ops/1e12:.3f} T-ops/s ({ops/mix_ops:.2f}x the f32 mix)")
        except Exception as e:
            print(f"{dt_name}: failed ({type(e).__name__})")

    # --- d. the isolated intersection kernel -------------------------------
    from pecos_tpu.xmc.inference import _intersect_scores

    N, Kp, P, Qn = 1024, 160, 64, 256
    rng = np.random.default_rng(0)
    qids = jnp.asarray(rng.integers(0, 1 << 18, (N, Qn)).astype(np.int32))
    qvals = jnp.asarray(rng.standard_normal((N, Qn)).astype(np.float32))
    wi = jnp.asarray(rng.integers(0, 1 << 18, (N, Kp, P)).astype(np.int32))
    wv = jnp.asarray(rng.standard_normal((N, Kp, P)).astype(np.float32))
    f_k = jax.jit(lambda a, b, c, d: _intersect_scores(a, b, c, d, 8, None, 0.0))
    dt = timed(f_k, qids, qvals, wi, wv, iters=8)
    pairs = N * Kp * P * Qn
    print(
        f"intersection: {dt*1000:.2f} ms for {pairs/1e9:.2f} G-pairs "
        f"-> {pairs/dt/1e12:.3f} T-pairs/s; implied ops/pair at fma-issue rate: "
        f"{fma_ops*dt/pairs:.2f}"
    )


if __name__ == "__main__":
    main()
