"""Fused Pallas kernel for sparse-query x sparse-weight intersection scoring.

This is the hot loop of XR-Linear beam-search inference (the TPU analog of
the reference's hash-chunk candidate scoring, pecos/core/xmc/inference.hpp:
705-840 and the batch beam walk at 927-1148).  The XLA formulation
(`pecos_tpu.xmc.inference._intersect_scores`) scans over query chunks with an
(N, K, P) f32 accumulator carried between scan steps — at the Wiki-500K
geometry that accumulator is ~42 MB, so every scan step round-trips it
through HBM, and each chunk ends in a lane reduction.

The Pallas kernel processes bn=8 queries per grid step with the whole
(K*P)-slot weight row block resident in VMEM.  Per k-tile it builds the full
(bn, kt*P, Qn) compare block with query nonzeros on the LANES (128-wide) and
weight slots on sublanes — every compare/select is lane-full, there is no
HBM-resident accumulator, and the only reductions are one lane reduction per
k-tile (the matched-value sum, exact because CSR ids are unique per row so
at most one lane matches per slot) plus the final P-group sum.

Numerical contract: same values as `_intersect_scores` up to the last ulp of
the final P-reduction (a different, but fixed, add order); the matched-value
accumulation itself is exact in both (disjoint singleton adds).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qi_ref, qv_ref, wi_ref, wv_ref, o_ref, *, bn, kt_k, P, Qn, n_kt,
            bias_id, bias_val):
    # query ids relayouted ONCE per grid step onto sublanes (lane->sublane
    # move of bn*Qn elements); weight slots then stay lane-aligned through
    # every compare below — no per-tile transposes.
    qi3 = qi_ref[:][:, :, None]  # (bn, Qn, 1) int32
    qv3 = qv_ref[:][:, :, None]  # (bn, Qn, 1) float32
    kt = kt_k * P
    # P-group summation matrix: prod (bn, kt) @ S (kt, kt_k) on the MXU
    # replaces a reshape+reduce relayout; S is static and loop-invariant.
    rows = jax.lax.broadcasted_iota(jnp.int32, (kt, kt_k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (kt, kt_k), 1)
    S = (rows // P == cols).astype(jnp.float32)
    for t in range(n_kt):  # static unroll over k-tiles
        wi_t = wi_ref[:, t * kt : (t + 1) * kt]  # (bn, kt), kt on lanes
        wv_t = wv_ref[:, t * kt : (t + 1) * kt]
        # all-pairs compare: (bn, Qn, kt) — qi broadcast along lanes,
        # wi broadcast along sublanes, both free
        m = qi3 == wi_t[:, None, :]
        # matched-value sum: sublane reduction over Qn.  Exact regardless of
        # order — each slot matches at most one query id (singleton sums).
        # (An MXU contraction of the mask was measured SLOWER here: the
        # HIGHEST-precision passes over the Qn-deep mask cost more than the
        # VPU tree reduce.)
        g = jnp.sum(jnp.where(m, qv3, 0.0), axis=1)  # (bn, kt)
        prod = g * wv_t
        if bias_id is not None:
            prod = prod + bias_val * jnp.where(wi_t == jnp.int32(bias_id), wv_t, 0.0)
        o_ref[:, t * kt_k : (t + 1) * kt_k] = jnp.dot(
            prod, S,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # f32-exact P-group sums
        )


def _pick_tiles(N, K, P, Qn):
    """(bn, kt_k) with bn | N, kt_k | K, and the compare block <= ~8 MB.

    Swept on v5e at the Wiki-500K geometry (N=1024 K=160 P=64 Qn=256):
    bn=16/kt_k=8 (8 MB compare block) measured best; all (bn, kt_k) combos
    land within ~8% so the exact choice is not load-bearing."""
    bn = 16 if N % 16 == 0 else (8 if N % 8 == 0 else None)
    if bn is None:
        return None
    budget = 1 << 21  # f32 elements in the (bn, Qn, kt) compare block (~8 MB)
    kt_k = 1
    for cand in (32, 16, 8, 4, 2):
        if K % cand == 0 and bn * cand * P * Qn <= budget:
            kt_k = cand
            break
    return bn, kt_k


@functools.partial(jax.jit, static_argnames=("bias_id", "bias_val", "interpret"))
def intersect_scores_pallas(
    qids: jax.Array,  # (N, Qn) int32; pad id any value with qval 0
    qvals: jax.Array,  # (N, Qn) float32
    wi: jax.Array,  # (N, K, P) int32 weight ids (0-padded slots have wv 0)
    wv: jax.Array,  # (N, K, P) float32 weight values
    bias_id=None,
    bias_val: float = 0.0,
    interpret: bool = False,
) -> jax.Array:
    """scores[n, k] = sum_p wv[n,k,p] * qval_match(wi[n,k,p]) (+ bias term).

    Drop-in replacement for `_intersect_scores`; same contract.  Caller must
    check `supports_shapes` first.
    """
    N, Qn = qids.shape
    _, K, P = wi.shape
    bn, kt_k = _pick_tiles(N, K, P, Qn)
    n_kt = K // kt_k
    kern = functools.partial(
        _kernel, bn=bn, kt_k=kt_k, P=P, Qn=Qn, n_kt=n_kt,
        bias_id=bias_id, bias_val=bias_val,
    )
    flops = N * K * P * (2 * Qn + 3)
    bytes_acc = (qids.nbytes + qvals.nbytes + wi.nbytes + wv.nbytes) + N * K * 4
    return pl.pallas_call(
        kern,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((bn, Qn), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Qn), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, K * P), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, K * P), lambda n: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, K), lambda n: (n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(flops), bytes_accessed=int(bytes_acc), transcendentals=0
        ),
        interpret=interpret,
    )(qids, qvals, wi.reshape(N, K * P), wv.reshape(N, K * P))


def supports_shapes(N: int, K: int, P: int, Qn: int) -> bool:
    """True when the kernel's tiling covers these shapes (else use the XLA
    path): batch divisible by 8, K divisible by a power-of-two tile, and the
    resident weight block within VMEM budget."""
    if N % 8 != 0 or P % 8 != 0 or Qn % 8 != 0:
        return False
    tiles = _pick_tiles(N, K, P, Qn)
    if tiles is None or not any(K % c == 0 for c in (32, 16, 8, 4, 2)):
        return False
    bn = tiles[0]
    # resident block: wi+wv blocks (double-buffered) must leave room for the
    # ~8 MB compare tile inside ~16 MB VMEM
    if 2 * 2 * bn * K * P * 4 > 6 * 1024 * 1024:
        return False
    return True
