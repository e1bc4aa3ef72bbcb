"""HNSW as padded fixed-degree arrays + batched best-first search on device.

The reference stores L0 as a fixed-degree flat neighbor array with inlined
features (pecos/core/ann/hnsw.hpp:93-178) — already the right shape for TPU.
What changes is the execution model:

- search: instead of one Searcher (visited-set + two heaps) per OMP thread
  (hnsw.hpp:342-446, libpecos.cpp:526-553), a whole query batch walks the
  graph in lockstep.  The beam (ef best-so-far) is a sorted array carried
  through `jax.lax.while_loop`; each step expands the best unexpanded node,
  gathers its padded neighbor list, computes distances with one batched
  matmul, masks duplicates by comparing ids against the beam, and re-sorts.
  Termination matches best-first semantics: stop when the best unexpanded
  candidate is farther than the worst beam entry (classic HNSW stopping rule).

- build: instead of per-node mutexes (hnsw.hpp:597-672), points are inserted
  in deterministic batches: search the frozen graph for each batch point's
  neighbors (batched on device), apply the select-neighbors heuristic
  (Alg. 4, hnsw.hpp:555-592), then connect + prune reverse edges on the host.
  This is the batch-consistent analog of the reference's lock-consistent
  parallel insertion (whose graphs are already thread-timing dependent);
  recall-vs-QPS parity is the target, not graph equality
  (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PAD = jnp.int32(-1)
INF = jnp.float32(3.4e38)
SPARSE_PAD_ID = np.int32(1 << 30)  # sorts after every real feature id


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseBlock:
    """A batch of sparse rows in padded (ids, vals) form.

    ids are sorted ascending per row and padded with SPARSE_PAD_ID; padded
    vals are 0, so pad-vs-pad id matches contribute nothing to dot products.
    """

    ids: jax.Array  # (B, Q) int32
    vals: jax.Array  # (B, Q) float32
    sq: jax.Array  # (B,) float32 squared norms

    def tree_flatten(self):
        return (self.ids, self.vals, self.sq), ()

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def shape(self):
        return self.ids.shape


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseFeats:
    """All node features in padded sparse form (the CSR analog of the dense
    (N, D) feats array).  The reference instantiates HNSW over CSR features
    with a block sorted-list intersection for sparse-sparse dot products
    (pecos/core/ann/feat_vectors.hpp:195-340, distance_impl/common.hpp:16-103);
    on TPU the intersection is a broadcast id-compare — pure VPU work with no
    per-element gathers (same kernel family as xmc/inference.py
    score_candidates_sparse)."""

    ids: jax.Array  # (N, P) int32, sorted asc, SPARSE_PAD_ID padded
    vals: jax.Array  # (N, P) float32, 0 padded
    sq: jax.Array  # (N,) float32 squared norms

    def tree_flatten(self):
        return (self.ids, self.vals, self.sq), ()

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def shape(self):
        return self.ids.shape

    def __getitem__(self, idx):
        return SparseBlock(self.ids[idx], self.vals[idx], self.sq[idx])


def build_sparse_feats(X, round_to: int = 32, cap: int = 0) -> SparseFeats:
    """Host CSR -> device SparseFeats (row capacity padded to a lane-friendly
    multiple, or the explicit ``cap`` for jit-shape stability across chunks)."""
    import scipy.sparse as smat

    A = X.tocsr() if smat.issparse(X) else smat.csr_matrix(X)
    A.sort_indices()
    nnz = np.diff(A.indptr)
    if not cap:
        cap = int(max(round_to, -(-int(nnz.max() if len(nnz) else 1) // round_to) * round_to))
    ids = np.full((A.shape[0], cap), SPARSE_PAD_ID, np.int32)
    vals = np.zeros((A.shape[0], cap), np.float32)
    rows = np.repeat(np.arange(A.shape[0]), nnz)
    offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], nnz)
    ids[rows, offs] = A.indices
    vals[rows, offs] = A.data
    sq = np.asarray(A.multiply(A).sum(axis=1), np.float32).ravel()
    return SparseFeats(jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(sq))


def _sparse_gather_dots(Q: SparseBlock, feats: SparseFeats, ids: jax.Array) -> jax.Array:
    """<q_b, x_{ids[b,k]}> for sparse q and sparse x: (B, K) dots.

    Chunked over K so the (B, kc, P, Qn) id-compare mask stays in VMEM-sized
    blocks; jax.lax.scan keeps it one fused kernel."""
    B, K = ids.shape
    N, P = feats.ids.shape
    Qn = Q.ids.shape[1]
    safe = jnp.clip(ids, 0, N - 1)
    wi = feats.ids[safe]  # (B, K, P) row gathers (cheap)
    wv = feats.vals[safe]
    # kc * P * Qn * B <= ~2^26 elements per chunk
    kc = max(1, min(K, (1 << 26) // max(1, B * P * Qn)))
    pad_k = (-K) % kc
    if pad_k:
        wi = jnp.concatenate([wi, jnp.full((B, pad_k, P), SPARSE_PAD_ID, jnp.int32)], axis=1)
        wv = jnp.concatenate([wv, jnp.zeros((B, pad_k, P), wv.dtype)], axis=1)
    Kp = wi.shape[1]
    wi_r = wi.reshape(B, Kp // kc, kc, P).swapaxes(0, 1)
    wv_r = wv.reshape(B, Kp // kc, kc, P).swapaxes(0, 1)

    def step(carry, blk):
        wi_b, wv_b = blk  # (B, kc, P)
        m = Q.ids[:, None, None, :] == wi_b[:, :, :, None]  # (B, kc, P, Qn)
        g = jnp.sum(jnp.where(m, Q.vals[:, None, None, :], 0.0), axis=-1)
        return carry, jnp.sum(g * wv_b, axis=-1)  # (B, kc)

    _, out = jax.lax.scan(step, 0.0, (wi_r, wv_r))
    return out.swapaxes(0, 1).reshape(B, Kp)[:, :K]


def _sparse_cross_dots(feats: SparseFeats, ids: jax.Array) -> jax.Array:
    """Pairwise dots among gathered sparse rows: ids (B, E) -> (B, E, E).

    Scans one row-chunk at a time as the "query" side so the 5-d compare
    mask (B, ec, E, pc, P) stays bounded."""
    B, E = ids.shape
    N, P = feats.ids.shape
    safe = jnp.clip(ids, 0, N - 1)
    wi = feats.ids[safe]  # (B, E, P)
    wv = feats.vals[safe]
    # bound mask elems: B * ec * E * pc * P <= ~2^26
    budget = (1 << 26) // max(1, B * E * P)
    pc = max(1, min(P, budget))
    ec = max(1, min(E, budget // pc))
    pad_e = (-E) % ec
    qi, qv = wi, wv
    if pad_e:
        qi = jnp.concatenate([qi, jnp.full((B, pad_e, P), SPARSE_PAD_ID, jnp.int32)], axis=1)
        qv = jnp.concatenate([qv, jnp.zeros((B, pad_e, P), wv.dtype)], axis=1)
    Ep = qi.shape[1]
    pad_p = (-P) % pc
    if pad_p:
        qi = jnp.concatenate([qi, jnp.full((B, Ep, pad_p), SPARSE_PAD_ID, jnp.int32)], axis=2)
        qv = jnp.concatenate([qv, jnp.zeros((B, Ep, pad_p), wv.dtype)], axis=2)
    Pp = qi.shape[2]
    qi_r = qi.reshape(B, Ep // ec, ec, Pp).swapaxes(0, 1)
    qv_r = qv.reshape(B, Ep // ec, ec, Pp).swapaxes(0, 1)

    def step(carry, blk):
        qi_b, qv_b = blk  # (B, ec, Pp)
        qi_p = qi_b.reshape(B, ec, Pp // pc, pc).swapaxes(0, 2).swapaxes(1, 2)
        qv_p = qv_b.reshape(B, ec, Pp // pc, pc).swapaxes(0, 2).swapaxes(1, 2)

        def inner(acc, pblk):
            qi_c, qv_c = pblk  # (B, ec, pc)
            m = qi_c[:, :, None, :, None] == wi[:, None, :, None, :]  # (B,ec,E,pc,P)
            g = jnp.sum(jnp.where(m, qv_c[:, :, None, :, None], 0.0), axis=-2)  # (B,ec,E,P)
            return acc + jnp.sum(g * wv[:, None, :, :], axis=-1), None

        acc, _ = jax.lax.scan(inner, jnp.zeros((B, ec, E), jnp.float32), (qi_p, qv_p))
        return carry, acc

    _, out = jax.lax.scan(step, 0.0, (qi_r, qv_r))
    return out.swapaxes(0, 1).reshape(B, Ep, E)[:, :E, :]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceGraph:
    """One level of the graph + features, device resident."""

    feats: jax.Array  # (N, D) float32 — row-padded node features
    neighbors: jax.Array  # (N, M) int32, -1 padded
    metric: str  # "l2" | "ip" (static)

    def tree_flatten(self):
        return (self.feats, self.neighbors), (self.metric,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], leaves[1], aux[0])


def pairwise_dist(Q: jax.Array, X: jax.Array, metric: str) -> jax.Array:
    """(B, D) x (K, D) -> (B, K) distances (smaller = closer).

    l2: squared L2 (monotone in true L2); ip: 1 - <q, x> like the reference's
    inner-product "distance" (feat_vectors.hpp FeatVecDenseIPSimd).
    """
    dots = jnp.dot(Q, X.T, preferred_element_type=jnp.float32, precision="highest")
    if metric == "ip":
        return 1.0 - dots
    qq = jnp.sum(Q * Q, axis=1, keepdims=True)
    xx = jnp.sum(X * X, axis=1)[None, :]
    return qq + xx - 2.0 * dots


def gather_dist(Q, feats, ids: jax.Array, metric: str) -> jax.Array:
    """Per-query gathered distances: Q (B, D) | SparseBlock, ids (B, K) -> (B, K)."""
    if isinstance(feats, SparseFeats):
        dots = _sparse_gather_dots(Q, feats, ids)
        if metric == "ip":
            return 1.0 - dots
        xx = feats.sq[jnp.clip(ids, 0, feats.sq.shape[0] - 1)]
        return Q.sq[:, None] + xx - 2.0 * dots
    F = feats[jnp.clip(ids, 0, feats.shape[0] - 1)]  # (B, K, D)
    dots = jnp.einsum("bkd,bd->bk", F, Q, preferred_element_type=jnp.float32, precision="highest")
    if metric == "ip":
        return 1.0 - dots
    qq = jnp.sum(Q * Q, axis=1, keepdims=True)
    xx = jnp.sum(F * F, axis=-1)
    return qq + xx - 2.0 * dots


def _beam_search(
    entry_ids: jax.Array,  # (B, E) int32 starting points (-1 padded)
    entry_dists: jax.Array,  # (B, E) distances of the entry points
    neighbor_fn,  # (B, expand) popped ids -> ((B, expand*M) nbr ids, dists)
    *,
    ef: int,
    max_steps: int,
    expand: int,
) -> Tuple[jax.Array, jax.Array]:
    """Best-first beam search skeleton shared by the exact / PQ / packed
    scoring variants (they differ only in how a popped node's neighbors are
    enumerated and scored — ``neighbor_fn``).

    ``expand`` best unexpanded candidates are popped per iteration: the
    sequential pop-one loop of classic HNSW (hnsw.hpp:850-924) is
    latency-bound on an accelerator, so trading a few extra distance
    evaluations for ~expand x fewer sequential steps is a large wall-clock
    win at equal-or-better recall (strictly more nodes are explored).

    Returns (ids (B, ef), dists (B, ef)) sorted ascending by distance.
    """
    B, E = entry_ids.shape

    d0 = jnp.where(entry_ids >= 0, entry_dists, INF)
    ids0 = jnp.where(entry_ids >= 0, entry_ids, -1)
    pad_n = ef - E if E < ef else 0
    if pad_n > 0:
        ids0 = jnp.concatenate([ids0, jnp.full((B, pad_n), -1, jnp.int32)], axis=1)
        d0 = jnp.concatenate([d0, jnp.full((B, pad_n), INF)], axis=1)
    elif E > ef:
        d0, idx = jax.lax.top_k(-d0, ef)
        d0 = -d0
        ids0 = jnp.take_along_axis(ids0, idx, axis=1)
    order = jnp.argsort(d0, axis=1)
    d0 = jnp.take_along_axis(d0, order, axis=1)
    ids0 = jnp.take_along_axis(ids0, order, axis=1)
    expanded0 = ids0 < 0  # padded slots count as expanded

    def cond(state):
        ids, dists, expanded, steps = state
        # continue while any query has an unexpanded candidate not worse than
        # its current worst beam entry
        best_unexp = jnp.min(jnp.where(expanded, INF, dists), axis=1)  # (B,)
        worst = jnp.max(jnp.where(ids >= 0, dists, -INF), axis=1)
        active = best_unexp <= worst
        return jnp.logical_and(steps < max_steps, jnp.any(active))

    def body(state):
        ids, dists, expanded, steps = state
        # pop the `expand` best unexpanded candidates per query
        masked = jnp.where(expanded, INF, dists)
        neg_top, cand_pos = jax.lax.top_k(-masked, expand)  # (B, expand)
        has_cand = -neg_top < INF * 0.5
        cand_id = jnp.take_along_axis(ids, cand_pos, axis=1)  # (B, expand)
        # mark expanded via scatter
        expanded = expanded.at[jnp.arange(B)[:, None], cand_pos].set(True)
        # gather + score neighbors of all popped candidates
        nbrs, nd = neighbor_fn(cand_id)
        M = nbrs.shape[1] // expand
        nbrs = jnp.where(has_cand.repeat(M, axis=1), nbrs, -1)
        nd = jnp.where(nbrs >= 0, nd, INF)
        # dedup: mask out neighbors already present in beam
        dup = jnp.any(nbrs[:, :, None] == ids[:, None, :], axis=2)
        nd = jnp.where(dup, INF, nd)
        nbrs = jnp.where(dup, -1, nbrs)
        # merge beam + neighbors, keep ef best.  One multi-operand lax.sort:
        # measured 3x cheaper per step than argsort + take_along_axis chains
        # inside the loop (full sorts are the dominant in-loop cost on TPU;
        # see scripts/probe_hnsw_parts.py)
        sd, si, se = jax.lax.sort(
            (
                jnp.concatenate([dists, nd], axis=1),
                jnp.concatenate([ids, nbrs], axis=1),
                jnp.concatenate([expanded, nbrs < 0], axis=1),
            ),
            num_keys=1,
        )
        sd, si, se = sd[:, :ef], si[:, :ef], se[:, :ef]
        # a node popped from two parents in the same step enters twice; both
        # copies share one exact distance, so they sort adjacent — disable the
        # second copy (residual non-adjacent ties are cleaned up post-loop)
        dup2 = jnp.concatenate(
            [jnp.zeros((B, 1), bool), (si[:, 1:] == si[:, :-1]) & (si[:, 1:] >= 0)],
            axis=1,
        )
        si = jnp.where(dup2, -1, si)
        sd = jnp.where(dup2, INF, sd)
        se = se | dup2
        return si, sd, se, steps + 1

    ids, dists, _, _ = jax.lax.while_loop(cond, body, (ids0, d0, expanded0, jnp.int32(0)))
    # post-loop exact dedup: group by id, drop copies, restore distance order
    big = jnp.int32(2**30)
    oid = jnp.where(ids < 0, big, ids)
    k_id, k_d = jax.lax.sort((oid, dists), num_keys=1)
    dupf = (
        jnp.concatenate([jnp.zeros((B, 1), bool), k_id[:, 1:] == k_id[:, :-1]], axis=1)
        & (k_id < big)
    )
    k_d = jnp.where(dupf, INF, k_d)
    k_id = jnp.where(dupf, big, k_id)
    d2, id2 = jax.lax.sort((k_d, k_id), num_keys=1)
    return jnp.where(id2 >= big, -1, id2), d2


@functools.partial(jax.jit, static_argnames=("ef", "max_steps", "expand"))
def batch_search_level(
    graph: DeviceGraph,
    Q: jax.Array,  # (B, D)
    entry_ids: jax.Array,  # (B, E) int32 starting points (-1 padded)
    *,
    ef: int,
    max_steps: int,
    expand: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Exact-distance beam search over one graph level (see _beam_search)."""
    B = Q.shape[0] if not isinstance(Q, SparseBlock) else Q.ids.shape[0]
    M = graph.neighbors.shape[1]
    N = graph.neighbors.shape[0]

    def neighbor_fn(cand_id):
        expand_ = cand_id.shape[1]
        nbrs = graph.neighbors[jnp.clip(cand_id, 0, N - 1)].reshape(B, expand_ * M)
        nd = gather_dist(Q, graph.feats, nbrs, graph.metric)
        return nbrs, nd

    d0 = gather_dist(Q, graph.feats, entry_ids, graph.metric)
    return _beam_search(
        entry_ids, d0, neighbor_fn, ef=ef, max_steps=max_steps, expand=expand
    )


@functools.partial(jax.jit, static_argnames=("ef", "max_steps", "expand"))
def batch_search_level_pq(
    codes: jax.Array,  # (N, S) uint8 PQ codes
    neighbors: jax.Array,  # (N, M) int32
    lut: jax.Array,  # (B, S, 16) float32 per-query LUT
    entry_ids: jax.Array,  # (B, E)
    *,
    ef: int,
    max_steps: int,
    expand: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """PQ4 variant of batch_search_level: distances come from the per-query
    LUT gather (quantizer_impl/common.hpp semantics) instead of exact dots."""
    from .pq import pq_gather_dist

    B, E = entry_ids.shape
    M = neighbors.shape[1]
    N = neighbors.shape[0]

    def neighbor_fn(cand_id):
        expand_ = cand_id.shape[1]
        nbrs = neighbors[jnp.clip(cand_id, 0, N - 1)].reshape(B, expand_ * M)
        return nbrs, pq_gather_dist(lut, codes, nbrs)

    d0 = pq_gather_dist(lut, codes, entry_ids)
    return _beam_search(
        entry_ids, d0, neighbor_fn, ef=ef, max_steps=max_steps, expand=expand
    )


@jax.jit
def pack_neighbor_codes(neighbors: jax.Array, codes: jax.Array) -> jax.Array:
    """Inline each node's neighbor PQ codes with its adjacency row:
    (N, M) x (N, S) -> (N, M*S) uint8, row-major per neighbor.

    The TPU analog of the reference's inlined neighbor features
    (hnsw.hpp:93-178 stores features next to the adjacency list): the
    in-loop cost of graph search here is per-ROW gather overhead (~14 ns a
    row regardless of bytes, scripts/probe_hnsw_parts.py), so one gather
    per popped node that returns all M neighbor code rows replaces M
    separate row gathers — M x less gather overhead and ~8x fewer HBM
    bytes than gathering f32 feature rows.

    Stored 2-D on purpose: a (N, M, S) uint8 array is lane-padded by the
    TPU layout (minor dim S=64 -> 128), doubling its HBM footprint (~8.6 GB
    at N=1M/M=64/S=64, measured); (N, M*S) tiles cleanly at true size.  The
    gather runs in row chunks inside one fori_loop so no full-size 3-D
    intermediate is ever materialized (invalid -1 slots gather garbage rows;
    use-sites mask by id sign)."""
    N, M = neighbors.shape
    S = codes.shape[1]
    chunk = min(1 << 16, N)
    nsteps = -(-N // chunk)

    def body(i, out):
        # clamp the final chunk's start; the overlap rewrites identical rows
        s = jnp.minimum(i * chunk, N - chunk)
        nb = jax.lax.dynamic_slice_in_dim(neighbors, s, chunk)
        g = codes[jnp.clip(nb, 0, N - 1)]  # (chunk, M, S)
        return jax.lax.dynamic_update_slice_in_dim(
            out, g.reshape(chunk, M * S), s, axis=0
        )

    out = jnp.zeros((N, M * S), jnp.uint8)
    return jax.lax.fori_loop(0, nsteps, body, out)


@functools.partial(jax.jit, static_argnames=("ef", "max_steps", "expand"))
def batch_search_level_pq_packed(
    codes: jax.Array,  # (N, S) uint8 PQ codes (entry-point scoring only)
    neighbors: jax.Array,  # (N, M) int32
    nbr_codes: jax.Array,  # (N, M*S) uint8 packed neighbor codes (2-D layout)
    lut: jax.Array,  # (B, S, 16) float32 per-query LUT
    entry_ids: jax.Array,  # (B, E)
    *,
    ef: int,
    max_steps: int,
    expand: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Packed-descriptor PQ search: ONE row gather per popped node serves
    the scoring of all its M neighbors (ids + codes ride the same index),
    instead of M per-neighbor code-row gathers.  Search results are
    identical to batch_search_level_pq — only the memory layout changes."""
    from .pq import pq_apply_lut, pq_gather_dist

    B, E = entry_ids.shape
    M = neighbors.shape[1]
    N = neighbors.shape[0]

    S = nbr_codes.shape[1] // M

    def neighbor_fn(cand_id):
        expand_ = cand_id.shape[1]
        safe = jnp.clip(cand_id, 0, N - 1)
        nbrs = neighbors[safe].reshape(B, expand_ * M)
        c = nbr_codes[safe].reshape(B, expand_ * M, S)
        return nbrs, pq_apply_lut(lut, c)

    d0 = pq_gather_dist(lut, codes, entry_ids)
    return _beam_search(
        entry_ids, d0, neighbor_fn, ef=ef, max_steps=max_steps, expand=expand
    )


def _greedy_level(feats, neighbors, Q, entry, metric: str, max_steps: int):
    """Greedy walk on one level's adjacency (the shared while_loop core of
    batch_greedy_descent{,_multi,_stack})."""
    B = Q.shape[0] if not isinstance(Q, SparseBlock) else Q.ids.shape[0]

    def cond(state):
        cur, cur_d, improved, steps = state
        return jnp.logical_and(steps < max_steps, jnp.any(improved))

    def body(state):
        cur, cur_d, improved, steps = state
        nbrs = neighbors[jnp.clip(cur, 0, neighbors.shape[0] - 1)]  # (B, M)
        nd = jnp.where(nbrs >= 0, gather_dist(Q, feats, nbrs, metric), INF)
        best = jnp.argmin(nd, axis=1)
        best_d = jnp.take_along_axis(nd, best[:, None], axis=1)[:, 0]
        best_id = jnp.take_along_axis(nbrs, best[:, None], axis=1)[:, 0]
        take = jnp.logical_and(improved, best_d < cur_d)
        cur = jnp.where(take, best_id, cur)
        cur_d = jnp.where(take, best_d, cur_d)
        return cur, cur_d, take, steps + 1

    cur_d = gather_dist(Q, feats, entry[:, None], metric)[:, 0]
    cur, _, _, _ = jax.lax.while_loop(
        cond, body, (entry, cur_d, jnp.ones((B,), bool), jnp.int32(0))
    )
    return cur


@functools.partial(jax.jit, static_argnames=("max_steps",))
def batch_greedy_descent(
    graph: DeviceGraph,
    Q: jax.Array,  # (B, D)
    entry: jax.Array,  # (B,) int32
    *,
    max_steps: int,
) -> jax.Array:
    """Greedy walk to the locally closest node (upper levels L..1,
    hnsw.hpp:927-944).  Returns (B,) node ids."""
    return _greedy_level(graph.feats, graph.neighbors, Q, entry, graph.metric, max_steps)


@functools.partial(jax.jit, static_argnames=("metric", "max_steps"))
def batch_greedy_descent_multi(
    feats,
    uppers,  # tuple of (N, maxM) adjacencies, TOP level first
    Q,  # (B, D) | SparseBlock
    entry: jax.Array,  # (B,) int32
    *,
    metric: str,
    max_steps: int,
) -> jax.Array:
    """Greedy descent through several upper levels fused into ONE dispatch.

    Takes the build's per-level adjacency arrays directly (no stacking /
    copying): the per-level walks unroll statically, so an insertion search
    pays one tunnel round trip for the whole descent instead of one per
    level — the build profile showed the per-level dispatches costing ~33 ms
    each (~42 s of a 200K build)."""
    cur = entry
    for neighbors in uppers:
        cur = _greedy_level(feats, neighbors, Q, cur, metric, max_steps)
    return cur


@functools.partial(jax.jit, static_argnames=("metric", "n_levels", "max_steps"))
def batch_greedy_descent_stack(
    feats,
    upper_stack: jax.Array,  # (L, N, maxM) adjacency of levels L..1 (index l-1)
    Q: jax.Array,  # (B, D)
    entry: jax.Array,  # (B,) int32
    *,
    metric: str,
    n_levels: int,  # descend levels max_level .. max_level-n_levels+1
    max_steps: int,
) -> jax.Array:
    """Greedy descent through several upper levels fused into ONE dispatch.

    The per-level walk is identical to batch_greedy_descent; levels are
    visited top-down with a fori over the stacked adjacency, so an insertion
    search pays one tunnel round trip for the whole descent instead of one
    per level (hnsw.hpp:927-944 runs this as a nested CPU loop)."""
    B = Q.shape[0]
    L = upper_stack.shape[0]

    def level_body(i, cur):
        neighbors = jax.lax.dynamic_index_in_dim(
            upper_stack, L - 1 - i, axis=0, keepdims=False
        )
        return _greedy_level(feats, neighbors, Q, cur, metric, max_steps)

    return jax.lax.fori_loop(0, n_levels, level_body, entry)


@functools.partial(jax.jit, static_argnames=("M",))
def batch_select_neighbors(
    cand_ids: jax.Array,  # (B, E) candidate ids sorted by distance asc (-1 pad)
    cand_dists: jax.Array,  # (B, E)
    cross: jax.Array,  # (B, E, E) pairwise distances among candidates
    *,
    M: int,
) -> jax.Array:
    """HNSW Alg. 4 select-neighbors for a whole batch in lockstep.

    The greedy scan over sorted candidates is sequential per point, but every
    point in the batch advances together: step i checks, per lane, whether
    candidate i is closer to the query than to all already-selected neighbors.
    Returns (B, M) selected ids (-1 padded).
    """
    B, E = cand_ids.shape
    INF_ = jnp.float32(3.4e38)

    def body(i, state):
        sel_mask, count = state  # (B, E) bool, (B,)
        # min distance from candidate i to already-selected candidates
        di = jnp.where(sel_mask, cross[:, i, :], INF_)  # (B, E)
        min_sel = jnp.min(di, axis=1)
        ok = (
            (cand_ids[:, i] >= 0)
            & (cand_dists[:, i] < INF_ * 0.5)
            & (min_sel >= cand_dists[:, i])
            & (count < M)
        )
        sel_mask = sel_mask.at[:, i].set(ok)
        return sel_mask, count + ok.astype(jnp.int32)

    sel_mask, _ = jax.lax.fori_loop(
        0, E, body, (jnp.zeros((B, E), bool), jnp.zeros((B,), jnp.int32))
    )
    # compact selected ids to the left, pad with -1 / INF
    order = jnp.argsort(jnp.where(sel_mask, jnp.arange(E)[None, :], E), axis=1)[:, :M]
    picked = jnp.take_along_axis(
        jnp.where(sel_mask, cand_ids, -1), order, axis=1
    )
    picked_d = jnp.take_along_axis(
        jnp.where(sel_mask, cand_dists, INF), order, axis=1
    )
    return picked, picked_d


def _select_sparse_lazy(
    feats: "SparseFeats",
    ids: jax.Array,  # (B, E) sorted asc by distance, -1 padded
    dists: jax.Array,  # (B, E)
    *,
    M: int,
    metric: str,
) -> Tuple[jax.Array, jax.Array]:
    """Alg-4 select for sparse features with LAZY cross-distances.

    The reference evaluates candidate-candidate distances on demand — only
    candidate-vs-already-SELECTED pairs (hnsw.hpp:555-592) — which is E*M
    work, not E^2.  The batched E^2 cross matrix (`_sparse_cross_dots`) was
    measured at 1.6 s/dispatch (B=2048, E=100, P=96): >50% of total sparse
    build wall-clock.  This version carries the <=M selected rows' padded
    (ids, vals) in a (B, M, P) buffer and intersects one candidate row per
    fori step against the buffer — identical selection output, ~E/M-fold
    less VPU work, and linear (not quadratic) in the candidate-list width.
    """
    B, E = ids.shape
    N, P = feats.ids.shape
    safe = jnp.clip(ids, 0, N - 1)
    wi = feats.ids[safe]  # (B, E, P)
    wv = feats.vals[safe]
    csq = feats.sq[safe]  # (B, E) candidate squared norms (l2)

    buf_ids0 = jnp.full((B, M, P), SPARSE_PAD_ID, jnp.int32)
    buf_vals0 = jnp.zeros((B, M, P), jnp.float32)
    buf_sq0 = jnp.zeros((B, M), jnp.float32)
    slot = jnp.arange(M, dtype=jnp.int32)[None, :]  # (1, M)

    def body(i, state):
        buf_ids, buf_vals, buf_sq, count, sel_mask = state
        ci = jax.lax.dynamic_index_in_dim(wi, i, axis=1, keepdims=False)  # (B, P)
        cv = jax.lax.dynamic_index_in_dim(wv, i, axis=1, keepdims=False)
        # dots of candidate i against every selected row (pad-vs-pad id
        # matches contribute 0: pad vals are 0 on both sides)
        m = buf_ids[:, :, :, None] == ci[:, None, None, :]  # (B, M, P, P)
        g = jnp.sum(jnp.where(m, buf_vals[:, :, :, None], 0.0), axis=2)  # (B, M, P)
        dots = jnp.sum(g * cv[:, None, :], axis=-1)  # (B, M)
        if metric == "ip":
            cross = 1.0 - dots
            ci_sq = None
        else:
            ci_sq = jax.lax.dynamic_index_in_dim(csq, i, axis=1, keepdims=False)
            cross = buf_sq + ci_sq[:, None] - 2.0 * dots
        di = jax.lax.dynamic_index_in_dim(dists, i, axis=1, keepdims=False)  # (B,)
        idv = jax.lax.dynamic_index_in_dim(ids, i, axis=1, keepdims=False)
        active = slot < count[:, None]
        min_sel = jnp.min(jnp.where(active, cross, INF), axis=1)
        ok = (idv >= 0) & (di < INF * 0.5) & (min_sel >= di) & (count < M)
        put = (slot == count[:, None]) & ok[:, None]  # (B, M) one-hot write
        buf_ids = jnp.where(put[:, :, None], ci[:, None, :], buf_ids)
        buf_vals = jnp.where(put[:, :, None], cv[:, None, :], buf_vals)
        if metric != "ip":
            buf_sq = jnp.where(put, ci_sq[:, None], buf_sq)
        sel_mask = jax.lax.dynamic_update_index_in_dim(sel_mask, ok, i, axis=1)
        return buf_ids, buf_vals, buf_sq, count + ok.astype(jnp.int32), sel_mask

    _, _, _, _, sel_mask = jax.lax.fori_loop(
        0,
        E,
        body,
        (buf_ids0, buf_vals0, buf_sq0, jnp.zeros((B,), jnp.int32), jnp.zeros((B, E), bool)),
    )
    order = jnp.argsort(jnp.where(sel_mask, jnp.arange(E)[None, :], E), axis=1)[:, :M]
    picked = jnp.take_along_axis(jnp.where(sel_mask, ids, -1), order, axis=1)
    picked_d = jnp.take_along_axis(jnp.where(sel_mask, dists, INF), order, axis=1)
    return picked, picked_d


@functools.partial(jax.jit, static_argnames=("M", "metric", "pool"))
def batch_select_from_search(
    feats: jax.Array,  # (N, D)
    ids: jax.Array,  # (B, E) search results sorted asc by distance
    dists: jax.Array,  # (B, E)
    *,
    M: int,
    metric: str,
    sketch: jax.Array = None,  # (N, sk) dense sketch for cross-distances
    pool: int = 0,  # >0: select from the pool closest candidates only
) -> jax.Array:
    """Fused cross-distance + Alg-4 select: one device call per batch.

    ``sketch`` (sparse builds): Alg-4 only COMPARES candidate-candidate
    distances against the (exact) candidate-query distances, so the cross
    matrix may come from a count-sketch projection — one (B, E, sk) gather +
    MXU einsum instead of the (B, E, E, P, P) broadcast-intersection mask,
    which is >50% of total sparse build wall-clock (measured: 1.6 s/call at
    B=2048, E=100, P=96; the sketch path is ~ms).  Query-candidate distances
    stay exact either way.

    ``pool`` truncates the (distance-sorted) candidate list before the
    cross-distance computation: Alg-4's scan is front-loaded, and the cross
    matrix is quadratic in pool width, so capping a 164-wide refine union at
    64 cuts the dominant sparse-build dispatch ~6x."""
    if pool and pool < ids.shape[1]:
        ids, dists = ids[:, :pool], dists[:, :pool]
    B, E = ids.shape
    if isinstance(feats, SparseFeats):
        if sketch is not None:
            Sg = sketch[jnp.clip(ids, 0, sketch.shape[0] - 1)]  # (B, E, sk)
            dots = jnp.einsum(
                "bed,bfd->bef", Sg, Sg, preferred_element_type=jnp.float32,
                precision="highest",
            )
            if metric == "ip":
                cross = 1.0 - dots
            else:
                nn = jnp.sum(Sg * Sg, axis=-1)
                cross = nn[:, :, None] + nn[:, None, :] - 2.0 * dots
            return batch_select_neighbors(ids, dists, cross, M=M)
        return _select_sparse_lazy(feats, ids, dists, M=M, metric=metric)
    F = feats[jnp.clip(ids, 0, feats.shape[0] - 1)]  # (B, E, D)
    dots = jnp.einsum("bed,bfd->bef", F, F, preferred_element_type=jnp.float32, precision="highest")
    if metric == "ip":
        cross = 1.0 - dots
    else:
        nn = jnp.sum(F * F, axis=-1)
        cross = nn[:, :, None] + nn[:, None, :] - 2.0 * dots
    return batch_select_neighbors(ids, dists, cross, M=M)


@jax.jit
def refine_union_candidates(
    neighbors: jax.Array,  # (N, cap)
    nbr_dists: jax.Array,  # (N, cap) distance co-array
    nodes: jax.Array,  # (B,) node ids being refined; pad with -2
    ids: jax.Array,  # (B, E) refine-search results
    dists: jax.Array,  # (B, E)
) -> Tuple[jax.Array, jax.Array]:
    """Union a refine search's results with the node's CURRENT neighbors
    (insertion-time links, including the long-range ones made while the
    graph was small, must survive re-selection), self-masked and sorted
    ascending.  Existing-neighbor distances come from the co-array — no
    feature gathers, one dispatch."""
    N = neighbors.shape[0]
    self_mask = ids == nodes[:, None]
    ids = jnp.where(self_mask, -1, ids)
    dists = jnp.where(self_mask, INF, dists)
    safe = jnp.clip(nodes, 0, N - 1)
    ex = neighbors[safe]  # (B, cap)
    ex_d = nbr_dists[safe]
    dup = jnp.any(ex[:, :, None] == ids[:, None, :], axis=2)
    ex_d = jnp.where(dup | (nodes[:, None] < 0) | (ex < 0), INF, ex_d)
    ex = jnp.where(dup, -1, ex)
    all_ids = jnp.concatenate([ids, ex], axis=1)
    all_d = jnp.concatenate([dists, ex_d], axis=1)
    order = jnp.argsort(all_d, axis=1)
    return (
        jnp.take_along_axis(all_ids, order, axis=1),
        jnp.take_along_axis(all_d, order, axis=1),
    )


@functools.partial(jax.jit, donate_argnums=(0, 1))
def scatter_set_rows_d(
    neighbors: jax.Array,  # (N, cap) int32 adjacency
    nbr_dists: jax.Array,  # (N, cap) float32 distance co-array
    rows: jax.Array,  # (B,) int64/int32 row ids; pad with >= N (dropped)
    ids: jax.Array,  # (B, M) new neighbor ids, -1 padded, M <= cap
    d: jax.Array,  # (B, M) their distances to the row's own vector
) -> Tuple[jax.Array, jax.Array]:
    """Row replacement that keeps the distance co-array in lockstep with the
    adjacency.  Storing d(row, neighbor) next to each edge is what makes the
    reverse-edge pass device-resident: keep-closest pruning then needs no
    feature gathers at all (compare reverse_merge_closest vs
    scatter_prune_rows), the TPU answer to the reference's incremental
    per-edge distance evaluations in mutually_connect (hnsw.hpp:597-672)."""
    N, cap = neighbors.shape
    B, M = ids.shape
    if M < cap:
        ids = jnp.concatenate([ids, jnp.full((B, cap - M), -1, ids.dtype)], axis=1)
        d = jnp.concatenate([d, jnp.full((B, cap - M), INF, d.dtype)], axis=1)
    return (
        neighbors.at[rows, :].set(ids, mode="drop"),
        nbr_dists.at[rows, :].set(d, mode="drop"),
    )


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def scatter_set_rows_packed_d(
    neighbors: jax.Array,  # (N, cap)
    nbr_dists: jax.Array,  # (N, cap)
    nbr_desc: jax.Array,  # (N, cap*S) uint8 packed neighbor codes (2-D layout)
    codes: jax.Array,  # (N, S)
    rows: jax.Array,  # (B,)
    ids: jax.Array,  # (B, M)
    d: jax.Array,  # (B, M)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """scatter_set_rows_d + packed-descriptor maintenance in one dispatch."""
    N, cap = neighbors.shape
    B, M = ids.shape
    S = codes.shape[1]
    if M < cap:
        ids = jnp.concatenate([ids, jnp.full((B, cap - M), -1, ids.dtype)], axis=1)
        d = jnp.concatenate([d, jnp.full((B, cap - M), INF, d.dtype)], axis=1)
    desc = codes[jnp.clip(ids, 0, codes.shape[0] - 1)].reshape(B, cap * S)
    return (
        neighbors.at[rows, :].set(ids, mode="drop"),
        nbr_dists.at[rows, :].set(d, mode="drop"),
        nbr_desc.at[rows, :].set(desc, mode="drop"),
    )


def _reverse_merge_core(neighbors, nbr_dists, src_ids, sel_ids, sel_dists):
    """Shared body of reverse_merge_closest{,_packed}: returns
    (rows, merged_ids, merged_d) for a .at[rows].set scatter.

    Fully device-side reverse-edge pass with keep-closest semantics.  Every
    forward edge src -> dst from this batch's selection offers the reverse
    edge dst -> src at the SAME distance (both metrics are symmetric), so the
    selection output feeds the merge directly — no host round trip, no
    feature gathers.  Arrivals per dst are capped at the cap closest: an
    arrival ranked below cap others can never survive a keep-closest prune
    to cap entries, so the cap is exact, and one-shot union pruning equals
    the reference's sequential per-edge updates (hnsw.hpp:597-672)."""
    N, cap = neighbors.shape
    B, M = sel_ids.shape
    E = B * M
    dst = sel_ids.reshape(E)
    src = jnp.broadcast_to(src_ids.astype(jnp.int32)[:, None], (B, M)).reshape(E)
    d = sel_dists.reshape(E)
    invalid = (dst < 0) | (src >= N) | (src < 0)
    dst_k = jnp.where(invalid, jnp.int32(N), dst)
    d_k = jnp.where(invalid, INF, d)
    # group by dst, closest first; invalid edges all land in the dst=N run
    dst_s, d_s, src_s = jax.lax.sort((dst_k, d_k, src), num_keys=2)
    idx = jnp.arange(E, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), dst_s[1:] != dst_s[:-1]]
    )
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, idx, 0))
    rank = idx - run_start
    row_slot = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    # one table row per distinct dst; rows beyond the distinct count keep
    # id N and are dropped by the final scatter
    rows = (
        jnp.full((E,), jnp.int32(N))
        .at[jnp.where(is_start, row_slot, E)]
        .set(dst_s, mode="drop")
    )
    keep = rank < cap
    arr_src = (
        jnp.full((E, cap), -1, jnp.int32)
        .at[jnp.where(keep, row_slot, E), jnp.where(keep, rank, 0)]
        .set(src_s, mode="drop")
    )
    arr_d = (
        jnp.full((E, cap), INF, jnp.float32)
        .at[jnp.where(keep, row_slot, E), jnp.where(keep, rank, 0)]
        .set(d_s, mode="drop")
    )
    safe_rows = jnp.clip(rows, 0, N - 1)
    all_ids = jnp.concatenate([neighbors[safe_rows], arr_src], axis=1)  # (E, 2cap)
    all_d = jnp.concatenate([nbr_dists[safe_rows], arr_d], axis=1)
    # dedup keeping the smaller distance: sort by (id, d), mask repeats
    big = jnp.int32(2**30)
    id_key = jnp.where(all_ids < 0, big, all_ids)
    id_s2, d_s2 = jax.lax.sort((id_key, all_d), num_keys=2, dimension=1)
    dup = jnp.concatenate(
        [jnp.zeros((E, 1), bool), (id_s2[:, 1:] == id_s2[:, :-1]) & (id_s2[:, 1:] < big)],
        axis=1,
    )
    d_m = jnp.where(dup | (id_s2 >= big), INF, d_s2)
    id_m = jnp.where(dup, big, id_s2)
    merged_d, merged_id = jax.lax.sort((d_m, id_m), num_keys=1, dimension=1)
    merged_id = jnp.where(merged_d < INF * 0.5, merged_id, -1)
    return rows, merged_id[:, :cap], merged_d[:, :cap]


@functools.partial(jax.jit, donate_argnums=(0, 1))
def reverse_merge_closest(
    neighbors: jax.Array,  # (N, cap)
    nbr_dists: jax.Array,  # (N, cap)
    src_ids: jax.Array,  # (B,) inserted node ids; pad with >= N
    sel_ids: jax.Array,  # (B, M) forward selections, -1 padded
    sel_dists: jax.Array,  # (B, M)
) -> Tuple[jax.Array, jax.Array]:
    rows, ids, d = _reverse_merge_core(neighbors, nbr_dists, src_ids, sel_ids, sel_dists)
    return (
        neighbors.at[rows, :].set(ids, mode="drop"),
        nbr_dists.at[rows, :].set(d, mode="drop"),
    )


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def reverse_merge_closest_packed(
    neighbors: jax.Array,  # (N, cap)
    nbr_dists: jax.Array,  # (N, cap)
    nbr_desc: jax.Array,  # (N, cap*S) uint8 (2-D layout)
    codes: jax.Array,  # (N, S)
    src_ids: jax.Array,  # (B,)
    sel_ids: jax.Array,  # (B, M)
    sel_dists: jax.Array,  # (B, M)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """reverse_merge_closest + packed-descriptor maintenance, one dispatch."""
    rows, ids, d = _reverse_merge_core(neighbors, nbr_dists, src_ids, sel_ids, sel_dists)
    desc = codes[jnp.clip(ids, 0, codes.shape[0] - 1)].reshape(ids.shape[0], -1)
    return (
        neighbors.at[rows, :].set(ids, mode="drop"),
        nbr_dists.at[rows, :].set(d, mode="drop"),
        nbr_desc.at[rows, :].set(desc, mode="drop"),
    )


@functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=("B",))
def reverse_merge_chunk(
    neighbors: jax.Array,
    nbr_dists: jax.Array,
    new_ids: jax.Array,  # (N_CEIL, M) whole refine forward-edge table
    new_d: jax.Array,  # (N_CEIL, M)
    s0: jax.Array,  # scalar chunk offset (traced -> one compile for all chunks)
    *,
    B: int,
) -> Tuple[jax.Array, jax.Array]:
    """Refine-rebuild reverse merge for rows [s0, s0+B): the chunk slice and
    its source ids are computed in-kernel, so the rebuild loop uploads one
    scalar per chunk instead of slicing on the host."""
    sel = jax.lax.dynamic_slice_in_dim(new_ids, s0, B)
    sel_d = jax.lax.dynamic_slice_in_dim(new_d, s0, B)
    src = s0 + jnp.arange(B, dtype=jnp.int32)
    rows, ids, d = _reverse_merge_core(neighbors, nbr_dists, src, sel, sel_d)
    return (
        neighbors.at[rows, :].set(ids, mode="drop"),
        nbr_dists.at[rows, :].set(d, mode="drop"),
    )


@functools.partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=("B",))
def reverse_merge_chunk_packed(
    neighbors: jax.Array,
    nbr_dists: jax.Array,
    nbr_desc: jax.Array,
    codes: jax.Array,
    new_ids: jax.Array,
    new_d: jax.Array,
    s0: jax.Array,
    *,
    B: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    sel = jax.lax.dynamic_slice_in_dim(new_ids, s0, B)
    sel_d = jax.lax.dynamic_slice_in_dim(new_d, s0, B)
    src = s0 + jnp.arange(B, dtype=jnp.int32)
    rows, ids, d = _reverse_merge_core(neighbors, nbr_dists, src, sel, sel_d)
    desc = codes[jnp.clip(ids, 0, codes.shape[0] - 1)].reshape(ids.shape[0], -1)
    return (
        neighbors.at[rows, :].set(ids, mode="drop"),
        nbr_dists.at[rows, :].set(d, mode="drop"),
        nbr_desc.at[rows, :].set(desc, mode="drop"),
    )


@functools.partial(jax.jit, static_argnames=("metric",), donate_argnums=(0,))
def scatter_prune_rows(
    neighbors: jax.Array,  # (N, cap) int32 adjacency, -1 padded
    feats: jax.Array,  # (N, D)
    rows: jax.Array,  # (A,) int32 affected rows; pad with N (dropped)
    new_cands: jax.Array,  # (A, K) int32 new candidate ids, -1 padded
    *,
    metric: str,
) -> jax.Array:
    """Merge new candidates into each affected row, keep the cap closest.

    The batched analog of the reference's reverse-edge update inside
    mutually_connect (hnsw.hpp:597-672): existing neighbors and new arrivals
    compete by distance to the row's own feature vector. Deduplicates ids,
    computes all distances with one batched gather+dot, and scatters the
    pruned rows back (donated input -> in-place update).
    """
    N, cap = neighbors.shape
    A, K = new_cands.shape
    safe_rows = jnp.clip(rows, 0, N - 1)
    existing = neighbors[safe_rows]  # (A, cap)
    cand = jnp.concatenate([existing, new_cands], axis=1)  # (A, cap+K)
    # dedup: sort ids, mask repeats, restore order
    big = jnp.int32(2**30)
    first = jnp.argsort(jnp.where(cand < 0, big, cand), axis=1)
    srt = jnp.take_along_axis(cand, first, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((A, 1), bool), (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] >= 0)], axis=1
    )
    inv = jnp.argsort(first, axis=1)
    dup = jnp.take_along_axis(dup_sorted, inv, axis=1)
    cand = jnp.where(dup, -1, cand)
    base = feats[safe_rows]  # (A, D)
    d = gather_dist(base, feats, cand, metric)
    d = jnp.where(cand >= 0, d, INF)
    neg, pos = jax.lax.top_k(-d, cap)
    pruned = jnp.where(-neg < INF * 0.5, jnp.take_along_axis(cand, pos, axis=1), -1)
    return neighbors.at[rows, :].set(pruned, mode="drop")


@functools.partial(jax.jit, static_argnames=("metric",), donate_argnums=(0,))
def scatter_prune_rows_alg4(
    neighbors: jax.Array,  # (N, cap)
    feats: jax.Array,  # (N, D)
    rows: jax.Array,  # (A,)
    new_cands: jax.Array,  # (A, K)
    *,
    metric: str,
) -> jax.Array:
    """Like scatter_prune_rows but prunes with the Alg-4 diversity heuristic
    (hnsw.hpp:555-592) instead of keep-closest — the reference applies the
    heuristic on reverse-edge overflow too (mutually_connect)."""
    N, cap = neighbors.shape
    A, K = new_cands.shape
    safe_rows = jnp.clip(rows, 0, N - 1)
    existing = neighbors[safe_rows]
    cand = jnp.concatenate([existing, new_cands], axis=1)  # (A, E)
    big = jnp.int32(2**30)
    first = jnp.argsort(jnp.where(cand < 0, big, cand), axis=1)
    srt = jnp.take_along_axis(cand, first, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((A, 1), bool), (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] >= 0)], axis=1
    )
    inv = jnp.argsort(first, axis=1)
    cand = jnp.where(jnp.take_along_axis(dup_sorted, inv, axis=1), -1, cand)
    base = feats[safe_rows]
    d = jnp.where(cand >= 0, gather_dist(base, feats, cand, metric), INF)
    order = jnp.argsort(d, axis=1)
    cand = jnp.take_along_axis(cand, order, axis=1)
    d = jnp.take_along_axis(d, order, axis=1)
    if isinstance(feats, SparseFeats):
        dots = _sparse_cross_dots(feats, cand)
        if metric == "ip":
            cross = 1.0 - dots
        else:
            nn = feats.sq[jnp.clip(cand, 0, N - 1)]
            cross = nn[:, :, None] + nn[:, None, :] - 2.0 * dots
    else:
        F = feats[jnp.clip(cand, 0, N - 1)]  # (A, E, D)
        dots = jnp.einsum(
            "aed,afd->aef", F, F, preferred_element_type=jnp.float32, precision="highest"
        )
        if metric == "ip":
            cross = 1.0 - dots
        else:
            nn = jnp.sum(F * F, axis=-1)
            cross = nn[:, :, None] + nn[:, None, :] - 2.0 * dots
    picked, _ = batch_select_neighbors(cand, d, cross, M=cap)
    return neighbors.at[rows, :].set(picked, mode="drop")


@functools.partial(jax.jit, static_argnames=("metric",))
def exact_rescore(
    Q,  # (B, D) | SparseBlock
    feats,  # (N, D) | SparseFeats
    ids: jax.Array,  # (B, E) candidate ids (-1 padded), any order
    *,
    metric: str,
) -> Tuple[jax.Array, jax.Array]:
    """Re-rank approximately-scored candidates with exact distances.

    One batched gather+dot over the final candidate list — the rerank step
    of PQ-guided search (hnsw.hpp:1239-1258 semantics), also used by the
    PQ-guided BUILD so forward-edge selection always sees exact distances.
    Returns (ids, dists) sorted ascending, -1/INF padded."""
    N = feats.shape[0]
    d = gather_dist(Q, feats, jnp.clip(ids, 0, N - 1), metric)
    d = jnp.where(ids >= 0, d, INF)
    big = jnp.int32(2**30)
    sd, si = jax.lax.sort((d, jnp.where(ids < 0, big, ids)), num_keys=1)
    return jnp.where(si >= big, -1, si), sd


def pack_rows_codes(codes: jax.Array, rows_vals: jax.Array) -> jax.Array:
    """codes (N, S) gathered at rows_vals (A, K) -> (A, K*S) 2-D packed
    layout (see pack_neighbor_codes); -1 slots get garbage rows which
    downstream masks by id sign (see _beam_search)."""
    return pack_neighbor_codes(rows_vals, codes)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def scatter_set_rows_packed(
    neighbors: jax.Array,  # (N, cap) int32 adjacency
    nbr_desc: jax.Array,  # (N, cap*S) uint8 packed neighbor codes (2-D)
    codes: jax.Array,  # (N, S) uint8 node codes
    rows: jax.Array,  # (A,) row ids; pad with N (dropped)
    vals: jax.Array,  # (A, cap) new rows, -1 padded
) -> Tuple[jax.Array, jax.Array]:
    """Row replacement that keeps the packed descriptor array in lockstep
    with the adjacency: one dispatch writes both."""
    desc = codes[jnp.clip(vals, 0, codes.shape[0] - 1)].reshape(vals.shape[0], -1)
    return (
        neighbors.at[rows, :].set(vals, mode="drop"),
        nbr_desc.at[rows, :].set(desc, mode="drop"),
    )


@functools.partial(
    jax.jit, static_argnames=("metric", "alg4"), donate_argnums=(0, 1)
)
def scatter_prune_rows_packed(
    neighbors: jax.Array,  # (N, cap)
    nbr_desc: jax.Array,  # (N, cap*S) uint8 (2-D layout)
    codes: jax.Array,  # (N, S) uint8
    feats: jax.Array,  # (N, D)
    rows: jax.Array,  # (A,)
    new_cands: jax.Array,  # (A, K)
    *,
    metric: str,
    alg4: bool,
) -> Tuple[jax.Array, jax.Array]:
    """scatter_prune_rows{,_alg4} + packed-descriptor maintenance fused into
    one dispatch: merge new reverse-edge candidates into each affected row,
    prune to cap (keep-closest or Alg-4), and rewrite both the adjacency row
    and its packed neighbor-code row."""
    N, cap = neighbors.shape
    A, K = new_cands.shape
    safe_rows = jnp.clip(rows, 0, N - 1)
    existing = neighbors[safe_rows]
    cand = jnp.concatenate([existing, new_cands], axis=1)  # (A, E)
    big = jnp.int32(2**30)
    first = jnp.argsort(jnp.where(cand < 0, big, cand), axis=1)
    srt = jnp.take_along_axis(cand, first, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((A, 1), bool), (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] >= 0)], axis=1
    )
    inv = jnp.argsort(first, axis=1)
    cand = jnp.where(jnp.take_along_axis(dup_sorted, inv, axis=1), -1, cand)
    base = feats[safe_rows]
    d = jnp.where(cand >= 0, gather_dist(base, feats, cand, metric), INF)
    if alg4:
        order = jnp.argsort(d, axis=1)
        cand = jnp.take_along_axis(cand, order, axis=1)
        d = jnp.take_along_axis(d, order, axis=1)
        F = feats[jnp.clip(cand, 0, N - 1)]  # (A, E, D)
        dots = jnp.einsum(
            "aed,afd->aef", F, F, preferred_element_type=jnp.float32, precision="highest"
        )
        if metric == "ip":
            cross = 1.0 - dots
        else:
            nn = jnp.sum(F * F, axis=-1)
            cross = nn[:, :, None] + nn[:, None, :] - 2.0 * dots
        pruned, _ = batch_select_neighbors(cand, d, cross, M=cap)
    else:
        neg, pos = jax.lax.top_k(-d, cap)
        pruned = jnp.where(-neg < INF * 0.5, jnp.take_along_axis(cand, pos, axis=1), -1)
    desc = codes[jnp.clip(pruned, 0, codes.shape[0] - 1)].reshape(pruned.shape[0], -1)
    return (
        neighbors.at[rows, :].set(pruned, mode="drop"),
        nbr_desc.at[rows, :].set(desc, mode="drop"),
    )


def select_neighbors_heuristic(
    cand_ids: np.ndarray,  # (K,) candidate ids sorted by distance to q (asc)
    cand_dists: np.ndarray,  # (K,) distances to q
    cand_cross: np.ndarray,  # (K, K) pairwise distances among candidates
    M: int,
) -> np.ndarray:
    """HNSW Algorithm 4 (hnsw.hpp:555-592): greedily keep a candidate only if
    it is closer to q than to every already-selected neighbor."""
    selected: list = []
    for i in range(len(cand_ids)):
        if cand_ids[i] < 0 or not np.isfinite(cand_dists[i]):
            continue
        ok = True
        for j in selected:
            if cand_cross[i, j] < cand_dists[i]:
                ok = False
                break
        if ok:
            selected.append(i)
            if len(selected) == M:
                break
    return cand_ids[np.array(selected, dtype=np.int64)] if selected else np.zeros(0, np.int64)
