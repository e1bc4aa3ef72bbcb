"""Batched linear solvers for per-label binary problems on TPU.

The reference trains one small SVM per (cluster, label) pair with a sequential
dual coordinate-descent solver under an OpenMP job queue
(pecos/core/xmc/linear_solver.hpp:419-528, :798-860).  Dual CD is inherently
sequential per label, so the TPU design solves the *same convex objective* in
its primal form — which the reference also ships (L2R_L2LOSS_SVC_PRIMAL via
Newton, linear_solver.hpp:406-417, core/utils/newton.hpp) and whose solutions
agree with the dual solver (reference test:
test/pecos/xmc/xlinear/test_xlinear.py:248 primal-vs-dual consistency).

Formulation: for a block of labels solved jointly,

    f(w_l) = 0.5 ||w_l||^2 + sum_i c_{il} * xi(y_{il} x_i . w_l)

with xi = squared hinge (SVC) or log-loss (LR) and c_{il} the per-instance
cost (Cp/Cn x relevance x active-mask).  Labels are independent, so a joint
Newton-CG over the block is exactly per-label Newton-CG — but every Hessian
product is two dense (N,D)x(D,Lb) matmuls on the MXU instead of L scalar loops.

Active sets (negatives from the matching matrix M, positives from Y —
linear_solver.hpp:667-711) enter as the mask inside c_{il}: inactive pairs
contribute zero loss/gradient/curvature, which is algebraically identical to
solving on the gathered subproblem.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

SOLVER_SQHINGE = "L2R_L2LOSS_SVC_PRIMAL"
SOLVER_SQHINGE_DUAL = "L2R_L2LOSS_SVC_DUAL"  # same objective; solved in primal here
SOLVER_LR = "L2R_LR_DUAL"
SOLVER_LR_PRIMAL = "L2R_LR_PRIMAL"

_LS_STEPS = 8  # backtracking halvings evaluated per line search (vectorized)
# solve_sparse_rows densifies X to (P, Db+1) and runs MXU matmuls when
# P*(Db+2) fits under this element budget (1 GB f32); above it, the chunked
# gather/scatter layout keeps HBM bounded (full-corpus clusters, 300K x 65K+)
_GLOBAL_DENSE_BUDGET = 1 << 28

# Huberized (smoothed) L1 hinge: quadratic on [1-gamma, 1], linear below.
# Newton needs a twice-differentiable objective, so L2R_L1LOSS_SVC_DUAL maps
# to this primal smoothing (solution within O(gamma) of the exact L1-hinge
# SVM; reference solves the exact dual sequentially, linear_solver.hpp:419-528)
_L1_SMOOTH_GAMMA = 0.01  # final smoothing width
_L1_GAMMA_STAGES = (0.2, 0.05, 0.01)  # continuation schedule, warm-started


def _xi(loss: str, ym: jax.Array, gamma: float = _L1_SMOOTH_GAMMA) -> jax.Array:
    """Per-pair loss value as a function of the margin z = y*m."""
    if loss == "sqhinge":
        return jnp.maximum(1.0 - ym, 0.0) ** 2
    if loss == "logistic":
        return jnp.log1p(jnp.exp(-jnp.abs(ym))) + jnp.maximum(-ym, 0.0)
    if loss == "l1hinge":
        g = gamma
        return jnp.where(
            ym >= 1.0,
            0.0,
            jnp.where(ym >= 1.0 - g, (1.0 - ym) ** 2 / (2.0 * g), 1.0 - ym - g / 2.0),
        )
    raise ValueError(loss)


def _dxi(loss: str, y: jax.Array, ym: jax.Array, gamma: float = _L1_SMOOTH_GAMMA) -> jax.Array:
    """d xi / d m (the y chain factor included)."""
    if loss == "sqhinge":
        return -2.0 * y * jnp.maximum(1.0 - ym, 0.0)
    if loss == "logistic":
        return -y * jax.nn.sigmoid(-ym)
    if loss == "l1hinge":
        g = gamma
        dz = jnp.where(
            ym >= 1.0, 0.0, jnp.where(ym >= 1.0 - g, -(1.0 - ym) / g, -1.0)
        )
        return y * dz
    raise ValueError(loss)


def _hess_w(loss: str, c: jax.Array, ym: jax.Array, gamma: float = _L1_SMOOTH_GAMMA) -> jax.Array:
    """Diagonal curvature weights d^2 xi / d m^2 (times cost c)."""
    f32 = jnp.float32
    if loss == "sqhinge":
        return 2.0 * c * (ym < 1.0).astype(f32)
    if loss == "logistic":
        s = jax.nn.sigmoid(ym)
        return c * s * (1.0 - s)
    if loss == "l1hinge":
        g = gamma
        return c * ((ym >= 1.0 - g) & (ym < 1.0)).astype(f32) / g
    raise ValueError(loss)


@functools.partial(
    jax.jit, static_argnames=("loss", "max_newton", "cg_max")
)
def solve_block(
    X: jax.Array,  # (N, D) float32 — bias column already appended
    y: jax.Array,  # (N, Lb) float32 in {+1, -1}
    c: jax.Array,  # (N, Lb) float32 >= 0; 0 where inactive
    *,
    loss: str = "sqhinge",
    eps: float = 0.01,
    max_newton: int = 20,
    cg_max: int = 10,
) -> jax.Array:
    """Solve the block of per-label primal problems; returns W (D, Lb)."""
    return _solve_core(X, y, c, loss=loss, eps=eps, max_newton=max_newton, cg_max=cg_max)


@functools.partial(
    jax.jit, static_argnames=("loss", "max_newton", "cg_max", "has_R")
)
def solve_block_coded(
    X: jax.Array,  # (N, D) float32 — bias column already appended
    codes: jax.Array,  # (N, Lb) uint8: 0 inactive, 1 positive, 2 negative
    Cp: jax.Array,  # f32 scalar (traced: changing it reuses the executable)
    Cn: jax.Array,  # f32 scalar
    R: Optional[jax.Array] = None,  # (N, Lb) float32 positive costs, if has_R
    *,
    loss: str = "sqhinge",
    eps: float = 0.01,
    max_newton: int = 20,
    cg_max: int = 10,
    has_R: bool = False,
) -> jax.Array:
    """solve_block on the uint8 coded wire: (y, c) are decoded ON DEVICE from
    one (N, Lb) uint8 array instead of uploading two (N, Lb) float32 masks —
    8x fewer bytes over the host->device link, which bounds warm train time
    on a remote-attached device.  Semantics anchor: the reference builds the
    same y/c in-process from CSC columns (linear_solver.hpp:667-711)."""
    f32 = jnp.float32
    pos = codes == jnp.uint8(1)
    y = jnp.where(pos, f32(1.0), f32(-1.0))
    pos_cost = Cp * R if has_R else Cp
    c = jnp.where(pos, pos_cost, jnp.where(codes == jnp.uint8(2), Cn, f32(0.0)))
    return _solve_core(X, y, c, loss=loss, eps=eps, max_newton=max_newton, cg_max=cg_max)


def _solve_core(X, y, c, *, loss, eps, max_newton, cg_max):
    """Traceable (non-jit) Newton-CG body, reused by solve_block and the
    per-cluster bucketed solver (vmapped there)."""
    N, D = X.shape
    Lb = y.shape[1]
    f32 = jnp.float32

    def margins(W):
        return jnp.dot(X, W, preferred_element_type=f32)  # (N, Lb)

    def obj(m, gamma=_L1_SMOOTH_GAMMA):
        return jnp.sum(c * _xi(loss, y * m, gamma), axis=0)  # (Lb,)

    def grad_vec(W, m, gamma=_L1_SMOOTH_GAMMA):
        dxi = _dxi(loss, y, y * m, gamma)
        return W + jnp.dot(X.T, c * dxi, preferred_element_type=f32)  # (D, Lb)

    def hess_weights(m, gamma=_L1_SMOOTH_GAMMA):
        return _hess_w(loss, c, y * m, gamma)

    def cg(h, g, active):
        """Solve (I + X^T diag(h) X) d = -g per label; returns d (D, Lb)."""

        def hv(v):
            Xv = jnp.dot(X, v, preferred_element_type=f32)
            return v + jnp.dot(X.T, h * Xv, preferred_element_type=f32)

        d0 = jnp.zeros_like(g)
        r0 = -g
        p0 = r0
        rs0 = jnp.sum(r0 * r0, axis=0)  # (Lb,)
        tol2 = 1e-8 * rs0

        def body(i, carry):
            d, r, p, rs = carry
            Hp = hv(p)
            pHp = jnp.sum(p * Hp, axis=0)
            live = (rs > tol2) & active
            alpha = jnp.where(live, rs / jnp.maximum(pHp, 1e-30), 0.0)
            d = d + alpha[None, :] * p
            r = r - alpha[None, :] * Hp
            rs_new = jnp.sum(r * r, axis=0)
            beta = jnp.where(live, rs_new / jnp.maximum(rs, 1e-30), 0.0)
            p = r + beta[None, :] * p
            return d, r, p, rs_new

        d, _, _, _ = jax.lax.fori_loop(0, cg_max, body, (d0, r0, p0, rs0))
        return d

    def newton_step(W, m, g, active, gamma):
        h = hess_weights(m, gamma)
        d = cg(h, g, active)
        Xd = jnp.dot(X, d, preferred_element_type=f32)  # (N, Lb)
        gTd = jnp.sum(g * d, axis=0)  # (Lb,) (should be < 0)
        f0 = 0.5 * jnp.sum(W * W, axis=0) + obj(m, gamma)
        # vectorized backtracking: evaluate steps 1, 1/2, ..., pick first Armijo-ok
        steps = 0.5 ** jnp.arange(_LS_STEPS, dtype=f32)  # (S,)

        def f_at(step):
            Wn_sq = 0.5 * jnp.sum((W + step * d) ** 2, axis=0)
            return Wn_sq + obj(m + step * Xd, gamma)

        fs = jax.vmap(f_at)(steps)  # (S, Lb)
        armijo = fs <= f0[None, :] + 0.01 * steps[:, None] * gTd[None, :]
        # first (largest) accepted step per label; fall back to smallest step
        first = jnp.argmax(armijo, axis=0)
        any_ok = jnp.any(armijo, axis=0)
        step = jnp.where(any_ok, steps[first], 0.0)
        step = jnp.where(active, step, 0.0)
        W = W + step[None, :] * d
        m = m + step[None, :] * Xd
        return W, m

    def newton_phase(W, m, gamma, iters):
        gnorm0 = jnp.linalg.norm(grad_vec(W, m, gamma), axis=0)  # (Lb,)

        def cond(carry):
            it, W, m, done = carry
            return (it < iters) & jnp.logical_not(jnp.all(done))

        def body(carry):
            it, W, m, done = carry
            g = grad_vec(W, m, gamma)
            gnorm = jnp.linalg.norm(g, axis=0)
            active = jnp.logical_not(done)
            # one extra Newton step is taken on the iteration the criterion
            # fires, so the converged gradient bound is achieved post-step
            W, m = newton_step(W, m, g, active, gamma)
            done = done | (gnorm <= eps * jnp.maximum(gnorm0, 1e-12))
            return it + 1, W, m, done

        _, W, m, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), W, m, jnp.zeros((Lb,), bool))
        )
        return W, m

    W = jnp.zeros((D, Lb), f32)
    m = jnp.zeros((N, Lb), f32)
    if loss == "l1hinge":
        # continuation: heavy smoothing first, warm-start the sharper stages
        # (Newton on the 1/gamma-stiff Hessian diverges from a cold start)
        for gamma in _L1_GAMMA_STAGES:
            W, m = newton_phase(W, m, gamma, max_newton)
    else:
        W, _ = newton_phase(W, m, _L1_SMOOTH_GAMMA, max_newton)
    return W


@functools.partial(
    jax.jit, static_argnames=("F2", "loss", "eps", "max_newton", "cg_max")
)
def solve_cluster_bucket(
    x_ids: jax.Array,  # (Cb, P, xcap) int32 LOCAL feature ids, pad id = F2
    x_vals: jax.Array,  # (Cb, P, xcap) float32, 0 where padded
    y: jax.Array,  # (Cb, P, ns) float32 +-1
    c: jax.Array,  # (Cb, P, ns) float32 cost, 0 inactive/padded
    *,
    F2: int,
    loss: str = "sqhinge",
    eps: float = 0.01,
    max_newton: int = 20,
    cg_max: int = 10,
) -> jax.Array:
    """Per-cluster training in each cluster's LOCAL feature subspace.

    The scalable counterpart of solve_block: instead of masking an (N x L)
    problem, each cluster's active instances are gathered (P rows) and its
    weights restricted to the features those instances touch (F2 columns) —
    sound because gradient components outside the active feature union carry
    only the regularizer, so their optimum is exactly 0.  This is the
    reference's per-cluster SVMJob gathering (linear_solver.hpp:637-711)
    recast as one vmapped dense Newton-CG per bucket of same-shape clusters;
    local dense X is scattered from padded sparse rows on device.

    Returns W_local (Cb, F2, ns).
    """
    Cb, P, xcap = x_ids.shape

    def one(xi, xv, yy, cc):
        rows = jnp.arange(P, dtype=jnp.int32)[:, None]
        X = jnp.zeros((P, F2 + 1), jnp.float32).at[rows, xi].add(xv)[:, :F2]
        return _solve_core(
            X, yy, cc, loss=loss, eps=eps, max_newton=max_newton, cg_max=cg_max
        )

    return jax.vmap(one)(x_ids, x_vals, y, c)


@functools.partial(
    jax.jit, static_argnames=("Db", "loss", "eps", "max_newton", "cg_max")
)
def solve_sparse_rows(
    x_ids: jax.Array,  # (P, xcap) int32 GLOBAL feature ids, pad id = Db
    x_vals: jax.Array,  # (P, xcap) float32, 0 where padded
    y: jax.Array,  # (P, ns)
    c: jax.Array,  # (P, ns)
    *,
    Db: int,
    loss: str = "sqhinge",
    eps: float = 0.01,
    max_newton: int = 20,
    cg_max: int = 10,
) -> jax.Array:
    """Newton-CG with X kept as padded sparse rows in the GLOBAL feature space.

    For huge-active-set clusters (top tree layers: every instance active,
    feature union = everything) neither the masked-dense nor the local-dense
    bucketed layout fits in HBM.  Here the two hot contractions become
    - margins  X @ W  : gather  W[x_ids] . x_vals
    - grads    X^T' G : scatter-add x_vals * G into W-shaped zeros
    Both are O(nnz(X) * ns); W stays dense (Db, ns) which is small because ns
    is the per-cluster child count.
    """
    P, xcap = x_ids.shape
    ns = y.shape[1]
    f32 = jnp.float32
    rows = jnp.arange(P, dtype=jnp.int32)[:, None]

    # MXU fast path: when the densified (P, Db+1) X fits comfortably in HBM,
    # densify ONCE (a single scatter of nnz(X) elements) and run both hot
    # contractions as plain matmuls.  The scatter-add formulation below costs
    # ~220 device scatters per solve (one per CG/Newton step) and TPU
    # scatter-add runs ~2 orders of magnitude below MXU matmul throughput —
    # measured at the matched-recall benchmark geometry (P=20K, Db=4097,
    # ns<=16) the scatter path was ~4 s/cluster vs <0.1 s dense.  The scatter
    # path remains for genuinely huge clusters (full-corpus actives at
    # 300K x 65K+ where P*Db is tens of billions).
    if P * (Db + 2) <= _GLOBAL_DENSE_BUDGET:
        Xd = jnp.zeros((P, Db + 1), f32).at[rows, x_ids].add(x_vals)

        def margins(W):  # W (Db+1, ns)
            return jnp.dot(Xd, W, preferred_element_type=f32)

        def xt_apply(G):  # (P, ns) -> (Db+1, ns)
            return jnp.dot(Xd.T, G, preferred_element_type=f32)

        return _newton_cg_global(
            margins, xt_apply, y, c, Db=Db, ns=ns, loss=loss, eps=eps,
            max_newton=max_newton, cg_max=cg_max,
        )

    # both hot contractions materialize a (pc, xcap, ns) block; chunk the row
    # dimension so that block stays ~64M elements — at full-corpus clusters
    # (P=300K+, top tree levels) the unchunked (P, xcap, ns) tensor plus CG
    # temporaries exceeds HBM (observed 18.4G needed on a 15.75G chip)
    pc = max(1, min(P, (1 << 26) // max(1, xcap * ns)))
    n_chunks = -(-P // pc)
    P_pad = n_chunks * pc
    if P_pad != P:
        x_ids_c = jnp.concatenate(
            [x_ids, jnp.full((P_pad - P, xcap), Db, x_ids.dtype)], axis=0
        )
        x_vals_c = jnp.concatenate(
            [x_vals, jnp.zeros((P_pad - P, xcap), x_vals.dtype)], axis=0
        )
    else:
        x_ids_c, x_vals_c = x_ids, x_vals
    ids_r = x_ids_c.reshape(n_chunks, pc, xcap)
    vals_r = x_vals_c.reshape(n_chunks, pc, xcap)

    def margins(W):  # W (Db+1, ns) with a padding row at Db
        def step(_, blk):
            ids_b, vals_b = blk
            Wg = W[ids_b]  # (pc, xcap, ns)
            return None, jnp.einsum("pxn,px->pn", Wg, vals_b, preferred_element_type=f32)

        _, parts = jax.lax.scan(step, None, (ids_r, vals_r))
        return parts.reshape(P_pad, ns)[:P]

    def xt_apply(G):  # (P, ns) -> (Db+1, ns)
        G_pad = jnp.concatenate([G, jnp.zeros((P_pad - P, ns), f32)], axis=0) if P_pad != P else G
        G_r = G_pad.reshape(n_chunks, pc, ns)

        def step(acc, blk):
            ids_b, vals_b, g_b = blk
            contrib = vals_b[:, :, None] * g_b[:, None, :]  # (pc, xcap, ns)
            return acc.at[ids_b].add(contrib), None

        out, _ = jax.lax.scan(
            step, jnp.zeros((Db + 1, ns), f32), (ids_r, vals_r, G_r)
        )
        return out

    return _newton_cg_global(
        margins, xt_apply, y, c, Db=Db, ns=ns, loss=loss, eps=eps,
        max_newton=max_newton, cg_max=cg_max,
    )


def _newton_cg_global(
    margins, xt_apply, y, c, *, Db, ns, loss, eps, max_newton, cg_max
):
    """Newton-CG on W (Db+1, ns) given the two X contractions as closures.

    Shared by the dense-MXU and chunked-scatter layouts of solve_sparse_rows;
    the last W row (index Db) is the padding row and carries no gradient.
    """
    f32 = jnp.float32

    def obj(m):
        return jnp.sum(c * _xi(loss, y * m), axis=0)

    def grad_vec(W, m):
        g = W + xt_apply(c * _dxi(loss, y, y * m))
        return g.at[Db].set(0.0)  # padding row carries nothing

    def hess_weights(m):
        return _hess_w(loss, c, y * m)

    def cg(h, g, active):
        def hv(v):
            out = v + xt_apply(h * margins(v))
            return out.at[Db].set(0.0)

        d0 = jnp.zeros_like(g)
        r0 = -g
        p0 = r0
        rs0 = jnp.sum(r0 * r0, axis=0)
        tol2 = 1e-8 * rs0

        def body(i, carry):
            d, r, p, rs = carry
            Hp = hv(p)
            pHp = jnp.sum(p * Hp, axis=0)
            live = (rs > tol2) & active
            alpha = jnp.where(live, rs / jnp.maximum(pHp, 1e-30), 0.0)
            d = d + alpha[None, :] * p
            r = r - alpha[None, :] * Hp
            rs_n = jnp.sum(r * r, axis=0)
            beta = jnp.where(live, rs_n / jnp.maximum(rs, 1e-30), 0.0)
            p = r + beta[None, :] * p
            return d, r, p, rs_n

        d, _, _, _ = jax.lax.fori_loop(0, cg_max, body, (d0, r0, p0, rs0))
        return d

    W0 = jnp.zeros((Db + 1, ns), f32)
    m0 = jnp.zeros((y.shape[0], ns), f32)
    gnorm0 = jnp.linalg.norm(grad_vec(W0, m0), axis=0)
    steps = 0.5 ** jnp.arange(_LS_STEPS, dtype=f32)

    def cond(carry):
        it, W, m, done = carry
        return (it < max_newton) & jnp.logical_not(jnp.all(done))

    def body(carry):
        it, W, m, done = carry
        g = grad_vec(W, m)
        gnorm = jnp.linalg.norm(g, axis=0)
        active = jnp.logical_not(done)
        h = hess_weights(m)
        d = cg(h, g, active)
        Xd = margins(d)
        gTd = jnp.sum(g * d, axis=0)
        f0 = 0.5 * jnp.sum(W * W, axis=0) + obj(m)

        def f_at(step):
            return 0.5 * jnp.sum((W + step * d) ** 2, axis=0) + obj(m + step * Xd)

        fs = jax.vmap(f_at)(steps)
        armijo = fs <= f0[None, :] + 0.01 * steps[:, None] * gTd[None, :]
        first = jnp.argmax(armijo, axis=0)
        any_ok = jnp.any(armijo, axis=0)
        step = jnp.where(any_ok & active, steps[first], 0.0)
        W = W + step[None, :] * d
        m = m + step[None, :] * Xd
        done = done | (gnorm <= eps * jnp.maximum(gnorm0, 1e-12))
        return it + 1, W, m, done

    _, W, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), W0, m0, jnp.zeros((ns,), bool))
    )
    return W[:Db]


def loss_name(solver_type: str) -> str:
    st = solver_type.upper()
    if st in (SOLVER_SQHINGE, SOLVER_SQHINGE_DUAL):
        return "sqhinge"
    if st == "L2R_L1LOSS_SVC_DUAL":
        return "l1hinge"  # smoothed primal equivalent (see _L1_SMOOTH_GAMMA)
    if st in (SOLVER_LR, SOLVER_LR_PRIMAL):
        return "logistic"
    raise ValueError(f"unknown solver_type {solver_type!r}")


@functools.partial(jax.jit, static_argnames=("K",))
def prune_topk_device(W: jax.Array, threshold: float, K: int):
    """Device-side weight pruning: |w| < threshold -> 0, keep the K largest
    |w| per label (reference threshold + max_nonzeros_per_label,
    linear_solver.hpp:718-778).

    Returns (idx (Lb, K) int32, vals (Lb, K) f32, vals==0 at dropped slots).
    Rationale: the tunnel between host and chip moves device->host bytes at
    single-digit MB/s, so downloading the dense (D, Lb) solution dominates
    training wall-clock; the sparse top-K download is 10-100x smaller.
    """
    aW = jnp.abs(W)
    aW = jnp.where(aW >= threshold, aW, 0.0)
    mags, idx = jax.lax.top_k(aW.T, K)  # (Lb, K)
    vals = jnp.take_along_axis(W.T, idx, axis=1)
    vals = jnp.where(mags > 0, vals, 0.0)
    return idx.astype(jnp.int32), vals


@jax.jit
def count_above_threshold(W: jax.Array, threshold: float) -> jax.Array:
    """Max per-label count of |w| >= threshold — sizes the top-K download."""
    return jnp.max(jnp.sum(jnp.abs(W) >= threshold, axis=0))
