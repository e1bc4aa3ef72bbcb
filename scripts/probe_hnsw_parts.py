"""Micro-benchmarks of the HNSW search-step components at SIFT-1M shapes.

Attributes the ~0.9 ms/query lockstep-search cost to gather+distance vs sort
vs scatter work, and measures the actual while_loop step count by timing
fori_loop-forced step counts.

    PYTHONPATH=/root/repo python scripts/probe_hnsw_parts.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def timed(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    N, D = 1_000_000, 128
    B = 1024
    M = 64  # maxM0
    EX = 4  # expand
    EF = 100
    K = EX * M  # neighbors gathered per step

    feats = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    feats16 = feats.astype(jnp.bfloat16)
    Q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, N, size=(B, K)).astype(np.int32))
    nbr_tbl = jnp.asarray(rng.integers(0, N, size=(N, M)).astype(np.int32))
    cand = jnp.asarray(rng.integers(0, N, size=(B, EX)).astype(np.int32))

    # 1. feature gather + distance
    @jax.jit
    def gd(feats, Q, ids):
        F = feats[ids]  # (B, K, D)
        dots = jnp.einsum("bkd,bd->bk", F, Q, preferred_element_type=jnp.float32)
        return dots

    print(f"gather+dot f32 (B={B},K={K},D={D}): {timed(gd, feats, Q, ids)*1e3:.3f} ms")

    @jax.jit
    def gd16(feats16, Q, ids):
        F = feats16[ids]
        dots = jnp.einsum("bkd,bd->bk", F, Q.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return dots

    print(f"gather+dot bf16: {timed(gd16, feats16, Q, ids)*1e3:.3f} ms")

    # 1b. gather alone (sum to force materialization)
    @jax.jit
    def g_only(feats, ids):
        return feats[ids].sum(axis=-1)

    print(f"gather f32 alone: {timed(g_only, feats, ids)*1e3:.3f} ms")

    # 2. neighbor-table gather
    @jax.jit
    def ntbl(nbr_tbl, cand):
        return nbr_tbl[cand].reshape(B, EX * M)

    print(f"neighbor-table gather (B,{EX}x{M}): {timed(ntbl, nbr_tbl, cand)*1e3:.3f} ms")

    # 3. sort of merged beam (EF + K = 356 wide)
    vals = jnp.asarray(rng.standard_normal((B, EF + K)).astype(np.float32))
    vids = jnp.asarray(rng.integers(0, N, size=(B, EF + K)).astype(np.int32))

    @jax.jit
    def srt(vals, vids):
        order = jnp.argsort(vals, axis=1)[:, :EF]
        return (
            jnp.take_along_axis(vids, order, axis=1),
            jnp.take_along_axis(vals, order, axis=1),
        )

    print(f"argsort+2 gathers ({EF+K} wide): {timed(srt, vals, vids)*1e3:.3f} ms")

    @jax.jit
    def topk(vals, vids):
        nv, order = jax.lax.top_k(-vals, EF)
        return jnp.take_along_axis(vids, order, axis=1), -nv

    print(f"top_k({EF}) of {EF+K}: {timed(topk, vals, vids)*1e3:.3f} ms")

    @jax.jit
    def apxk(vals, vids):
        nv, order = jax.lax.approx_max_k(-vals, EF)
        return jnp.take_along_axis(vids, order.astype(jnp.int32), axis=1), -nv

    print(f"approx_max_k({EF}) of {EF+K}: {timed(apxk, vals, vids)*1e3:.3f} ms")

    # 4. dedup compare (K x EF broadcast)
    @jax.jit
    def dedup(nbrs, bids):
        return jnp.any(nbrs[:, :, None] == bids[:, None, :], axis=2)

    nb = jnp.asarray(rng.integers(0, N, size=(B, K)).astype(np.int32))
    bi = jnp.asarray(rng.integers(0, N, size=(B, EF)).astype(np.int32))
    print(f"dedup compare (K x EF): {timed(dedup, nb, bi)*1e3:.3f} ms")

    # 5. dedup-within-popped (two argsorts of K)
    @jax.jit
    def dedup_pop(nbrs):
        first = jnp.argsort(jnp.where(nbrs < 0, jnp.int32(2**30), nbrs), axis=1)
        srt_ = jnp.take_along_axis(nbrs, first, axis=1)
        dup_sorted = jnp.concatenate(
            [jnp.zeros((B, 1), bool), srt_[:, 1:] == srt_[:, :-1]], axis=1
        )
        inv = jnp.argsort(first, axis=1)
        return jnp.take_along_axis(dup_sorted, inv, axis=1)

    print(f"popped-set dedup (2 argsorts of {K}): {timed(dedup_pop, nb)*1e3:.3f} ms")

    # 6. top_k pop + scatter mark
    dists = jnp.asarray(rng.standard_normal((B, EF)).astype(np.float32))
    expd = jnp.asarray(rng.integers(0, 2, size=(B, EF)).astype(bool))

    @jax.jit
    def pop(dists, expd):
        masked = jnp.where(expd, 3.4e38, dists)
        neg_top, cand_pos = jax.lax.top_k(-masked, EX)
        return expd.at[jnp.arange(B)[:, None], cand_pos].set(True)

    print(f"pop top_k({EX}) + scatter: {timed(pop, dists, expd)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
