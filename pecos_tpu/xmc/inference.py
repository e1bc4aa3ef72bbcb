"""TPU beam-search inference engine for hierarchical linear models.

This replaces the reference's C++ chunked-matrix beam search
(pecos/core/xmc/inference.hpp:927-1219, :2447-2488) with a static-shape JAX
formulation:

- The cluster chain's child lists become a padded children table
  ``(n_parents, max_children)`` (tree expansion = one gather).
- Layer weights live in one of two device layouts:

  * ``dense``  — W as a dense (D+1, L) matrix; scoring a layer is one MXU
    matmul + gather.  Right choice for the small upper layers of the tree.
  * ``plabel`` — padded label rows: each label's pruned sparse weight vector
    stored as (feat_ids, feat_vals) padded to a static capacity.  Scoring
    gathers only the beam's candidate labels, the TPU analog of the
    reference's per-cluster chunked CSC (inference.hpp:244-520).

- One beam step = expand children, score candidates, transform + combine with
  parent path value (PostProcessor semantics, layer 0 skips the combine just
  like ``no_prev_pred`` in inference.hpp:2102-2120), masked top-k.

All shapes are static under jit; queries are processed in fixed-size batches.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as smat

from pecos_tpu.utils import smat_util
from pecos_tpu.utils.cluster_util import ClusterChain
from .postprocessor import PostProcessor

NEG_INF = -1e30
# layers whose dense W would exceed this many elements use the plabel layout
DENSE_LAYOUT_MAX_ELEMENTS = 1 << 24


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceLayer:
    """One model layer resident on device."""

    kind: str  # "dense" | "plabel" (static)
    nr_labels: int  # static
    children: jax.Array  # (n_parents, max_children) int32, -1 padded
    W: Optional[jax.Array] = None  # dense: (D+1, L)
    feat_ids: Optional[jax.Array] = None  # plabel: (L, P) int32 (0 where padded)
    feat_vals: Optional[jax.Array] = None  # plabel: (L, P) f32 (0 where padded)
    packed: Optional[jax.Array] = None  # plabel: (L, 2P) int32 [ids | bitcast vals]
    # plabel: (n_parents, max_children, 2P) — every parent's children's packed
    # rows contiguous, in children-table order.  Beam scoring gathers ONE row
    # per beam parent instead of one per candidate label; XLA row gathers are
    # per-row-latency-bound (~14 ns/row regardless of bytes), so beam*maxc
    # candidate gathers collapse to beam gathers (16x fewer at nr_splits=16).
    parent_packed: Optional[jax.Array] = None

    def tree_flatten(self):
        leaves = (
            self.children,
            self.W,
            self.feat_ids,
            self.feat_vals,
            self.packed,
            self.parent_packed,
        )
        return leaves, (self.kind, self.nr_labels)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        children, W, feat_ids, feat_vals, packed, parent_packed = leaves
        return cls(aux[0], aux[1], children, W, feat_ids, feat_vals, packed, parent_packed)

    @property
    def max_children(self) -> int:
        return self.children.shape[1]


def build_device_layer(
    W: smat.spmatrix,
    C: smat.spmatrix,
    *,
    layout: Optional[str] = None,
    weight_dtype=jnp.float32,
) -> DeviceLayer:
    """Build the device layout for one layer from host CSC W (D+1, L), C (L, K)."""
    W = W.tocsc()
    C = C.tocsc()
    n_feat_b, L = W.shape
    # children table from C: (K, maxc)
    chain = ClusterChain.__new__(ClusterChain)
    chain.chain = [C]
    children, _ = chain.padded_children(0)
    if layout is None:
        layout = "dense" if n_feat_b * L <= DENSE_LAYOUT_MAX_ELEMENTS else "plabel"
    if layout == "dense":
        Wd = jnp.asarray(np.asarray(W.todense(), dtype=np.float32), dtype=weight_dtype)
        return DeviceLayer("dense", L, jnp.asarray(children), W=Wd)
    elif layout == "plabel":
        Wc = W.tocsc()
        nnz = np.diff(Wc.indptr)
        cap = max(8, int(-(-int(nnz.max() if L else 0) // 8) * 8))
        ids = np.zeros((L, cap), dtype=np.int32)
        vals = np.zeros((L, cap), dtype=np.float32)
        rows = np.repeat(np.arange(L), nnz)
        offs = np.arange(Wc.nnz) - np.repeat(Wc.indptr[:-1], nnz)
        ids[rows, offs] = Wc.indices
        vals[rows, offs] = Wc.data
        packed = np.concatenate([ids, vals.view(np.int32)], axis=1)
        return DeviceLayer(
            "plabel",
            L,
            jnp.asarray(children),
            feat_ids=jnp.asarray(ids),
            feat_vals=jnp.asarray(vals, dtype=weight_dtype),
            packed=jnp.asarray(packed),
            parent_packed=jnp.asarray(build_parent_packed(packed, children)),
        )
    raise ValueError(f"unknown layout {layout!r}")


def prepare_queries(X, bias: float, batch: Optional[int] = None) -> np.ndarray:
    """Dense (N, D+1) query block with bias column appended (matches the
    reference appending param.bias to each instance, linear_solver.hpp:47)."""
    if smat.issparse(X):
        Xd = np.asarray(X.todense(), dtype=np.float32)
    else:
        Xd = np.asarray(X, dtype=np.float32)
    if bias > 0:
        Xd = np.hstack([Xd, np.full((Xd.shape[0], 1), bias, dtype=np.float32)])
    return Xd


def prepare_queries_padded(
    X: smat.spmatrix, round_to: int = 64, cap: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Sparse queries as padded (ids, vals) — the wire format for host->device.

    A TF-IDF query row has a few hundred nonzeros; shipping the dense row
    (D floats, megabytes at Wiki-500K scale) would be transfer-bound.  Pad ids
    to a power-of-two-ish capacity; id D+1 marks padding (scattered into a
    dummy column on device).  Pass ``cap`` to force the capacity (per-batch
    callers must share one capacity so every batch hits the same compile).
    """
    A = X.tocsr()
    nnz = np.diff(A.indptr)
    if cap is None:
        max_nnz = int(nnz.max()) if A.shape[0] else 1
        cap = max(round_to, 1 << (max_nnz - 1).bit_length())
    D = A.shape[1]
    if A.shape[0] and A.nnz == A.shape[0] * cap and int(nnz.max()) == cap:
        # uniform-nnz fast path (synthetic benches, fixed-width tokenizers):
        # the padded layout is just a reshape of the CSR arrays
        return (
            np.ascontiguousarray(A.indices.reshape(A.shape[0], cap), np.int32),
            np.ascontiguousarray(A.data.reshape(A.shape[0], cap), np.float32),
        )
    ids = np.full((A.shape[0], cap), D + 1, dtype=np.int32)
    vals = np.zeros((A.shape[0], cap), dtype=np.float32)
    rows = np.repeat(np.arange(A.shape[0]), nnz)
    offs = np.arange(A.nnz) - np.repeat(A.indptr[:-1], nnz)
    ids[rows, offs] = A.indices
    vals[rows, offs] = A.data
    return ids, vals


def pack_query_ids(ids: np.ndarray, D: int) -> Tuple[np.ndarray, np.ndarray]:
    """Bit-pack padded (B, cap) int32 query ids for the host->device wire.

    The tunnel to the device moves ~70 MB/s, so wire bytes ARE end-to-end
    latency (scripts/probe_wire.py); ids only need ceil(log2(D+2)) bits.
    Encoding: low 16 bits as uint16, the remaining hi_bits per id packed
    32//hi_bits-per-word into uint32.  Exact for any D < 2**32; at the
    Wiki-500K geometry (18-bit ids) this is 2.25 B/id instead of 4.
    Returns (lo (B, cap) uint16, hi (B, nwords) uint32).
    """
    B, cap = ids.shape
    lo = (ids & 0xFFFF).astype(np.uint16)
    hi_bits = max(0, int(D + 1).bit_length() - 16)
    if hi_bits == 0:
        return lo, np.zeros((B, 1), np.uint32)
    per = 32 // hi_bits
    nwords = -(-cap // per)
    hi = (ids.astype(np.uint32) >> 16).astype(np.uint32)
    if nwords * per != cap:
        hi = np.concatenate([hi, np.zeros((B, nwords * per - cap), np.uint32)], axis=1)
    hi = hi.reshape(B, nwords, per)
    shifts = (np.arange(per, dtype=np.uint32) * hi_bits).astype(np.uint32)
    packed = np.bitwise_or.reduce(hi << shifts[None, None, :], axis=2)
    return lo, packed


def unpack_query_ids(lo: jax.Array, hi: jax.Array, D: int, cap: int) -> jax.Array:
    """Device-side inverse of pack_query_ids -> (B, cap) int32."""
    idl = lo.astype(jnp.int32)
    hi_bits = max(0, int(D + 1).bit_length() - 16)
    if hi_bits == 0:
        return idl
    per = 32 // hi_bits
    hiw = jnp.repeat(hi, per, axis=1)[:, :cap]  # (B, cap) uint32
    shift = (jnp.arange(cap, dtype=jnp.uint32) % per) * hi_bits
    idh = (hiw >> shift[None, :]) & jnp.uint32((1 << hi_bits) - 1)
    return idl | (idh.astype(jnp.int32) << 16)


def _wire_hi_words(D: int, cap: int) -> int:
    """uint32 words per row holding the >16-bit id parts (see pack_query_ids)."""
    hi_bits = max(0, int(D + 1).bit_length() - 16)
    if hi_bits == 0:
        return 1
    return -(-cap // (32 // hi_bits))


def encode_wire_batch(
    ids: np.ndarray, vals: np.ndarray, D: int, val_dtype: str = "float32"
) -> np.ndarray:
    """Fuse one batch's queries into ONE contiguous uint16 wire buffer.

    Layout per row: [lo ids (cap u16) | hi words (2*nw u16, lo/hi planes) |
    values (cap u16 if float16/bfloat16, 2*cap u16 planes if float32)].  One buffer
    per batch means one host->device transfer per batch, which pipelines
    cleanly behind device compute on the ~70 MB/s tunnel
    (scripts/probe_wire.py: transfer count doesn't hurt, serial host prefix
    before the first transfer does).
    """
    B, cap = ids.shape
    lo, hi = pack_query_ids(ids, D)
    nw = hi.shape[1]
    if val_dtype == "uint8":
        vw = cap // 2 + 1
    elif val_dtype in ("bfloat16", "float16"):
        vw = cap
    else:
        vw = 2 * cap
    buf = np.empty((B, cap + 2 * nw + vw), np.uint16)
    buf[:, :cap] = lo
    buf[:, cap : cap + nw] = (hi & np.uint32(0xFFFF)).astype(np.uint16)
    buf[:, cap + nw : cap + 2 * nw] = (hi >> np.uint32(16)).astype(np.uint16)
    if val_dtype == "uint8":
        # per-row absmax step (f16) + signed 8-bit multiples, 2 per word;
        # quantize against the f16-rounded step the decoder will multiply by
        assert cap % 2 == 0
        scale = np.maximum(np.abs(vals).max(axis=1), 1e-30)
        step = (scale / 127.0).astype(np.float16)
        q = np.clip(
            np.rint(vals / step.astype(np.float32)[:, None]), -127, 127
        ).astype(np.int8)
        qu = q.view(np.uint8)
        voff = cap + 2 * nw
        buf[:, voff : voff + cap // 2] = qu[:, 0::2].astype(np.uint16) | (
            qu[:, 1::2].astype(np.uint16) << 8
        )
        buf[:, voff + cap // 2] = step.view(np.uint16)
    elif val_dtype == "float16":
        buf[:, cap + 2 * nw :] = vals.astype(np.float16).view(np.uint16)
    elif val_dtype == "bfloat16":
        import ml_dtypes

        buf[:, cap + 2 * nw :] = vals.astype(ml_dtypes.bfloat16).view(np.uint16)
    else:
        v32 = np.ascontiguousarray(vals, np.float32).view(np.uint32)
        buf[:, cap + 2 * nw : cap + 2 * nw + cap] = (v32 & np.uint32(0xFFFF)).astype(
            np.uint16
        )
        buf[:, cap + 2 * nw + cap :] = (v32 >> np.uint32(16)).astype(np.uint16)
    return buf


def decode_wire_batch(
    buf: jax.Array, D: int, cap: int, val_dtype: str = "float32"
) -> Tuple[jax.Array, jax.Array]:
    """Device-side inverse of encode_wire_batch -> (ids int32, vals float32)."""
    nw = _wire_hi_words(D, cap)
    lo = buf[:, :cap]
    hi = buf[:, cap : cap + nw].astype(jnp.uint32) | (
        buf[:, cap + nw : cap + 2 * nw].astype(jnp.uint32) << 16
    )
    ids = unpack_query_ids(lo, hi, D, cap)
    voff = cap + 2 * nw
    if val_dtype == "uint8":
        w = buf[:, voff : voff + cap // 2]
        b0 = jax.lax.bitcast_convert_type((w & jnp.uint16(0xFF)).astype(jnp.uint8), jnp.int8)
        b1 = jax.lax.bitcast_convert_type((w >> jnp.uint16(8)).astype(jnp.uint8), jnp.int8)
        q = jnp.stack([b0, b1], axis=-1).reshape(w.shape[0], cap)
        scale = jax.lax.bitcast_convert_type(
            buf[:, voff + cap // 2], jnp.float16
        ).astype(jnp.float32)
        vals = q.astype(jnp.float32) * scale[:, None]
    elif val_dtype == "float16":
        vals = jax.lax.bitcast_convert_type(buf[:, voff:], jnp.float16).astype(
            jnp.float32
        )
    elif val_dtype == "bfloat16":
        vals = jax.lax.bitcast_convert_type(buf[:, voff:], jnp.bfloat16).astype(
            jnp.float32
        )
    else:
        v32 = buf[:, voff : voff + cap].astype(jnp.uint32) | (
            buf[:, voff + cap :].astype(jnp.uint32) << 16
        )
        vals = jax.lax.bitcast_convert_type(v32, jnp.float32)
    return ids, vals


def scatter_queries(ids: jax.Array, vals: jax.Array, D: int, bias: float) -> jax.Array:
    """Device-side densification: (B, cap) ids/vals -> (B, D+1) dense with bias.

    One scatter-add into a (B, D+2) buffer (column D holds the bias feature,
    column D+1 swallows padding), then slice off the dummy column.
    """
    B = ids.shape[0]
    X = jnp.zeros((B, D + 2), jnp.float32)
    X = X.at[jnp.arange(B)[:, None], ids].add(vals)
    if bias > 0:
        X = X.at[:, D].set(jnp.float32(bias))
    return X[:, : D + 1]


def score_candidates_dense_sparse(
    qids: jax.Array,  # (N, Qn) int32, pad id >= D+1 with val 0
    qvals: jax.Array,  # (N, Qn) float32
    layer: DeviceLayer,
    cand: jax.Array,  # (N, K)
    bias_id: Optional[int] = None,
    bias_val: float = 0.0,
) -> jax.Array:
    """Dense-layout layer scored directly from sparse queries.

    scores[b, l] = sum_c qvals[b, c] * W[qids[b, c], l] — a row gather of W
    plus one contraction.  Rationale: the alternative (densify the query
    block, then (B, D+1) @ W) streams the full gigabyte-scale dense X through
    HBM for every batch; measured on this chip that one matmul costs more
    than the entire rest of the 5-level chain (~150 ms vs ~15 ms at
    Wiki-500K geometry).  Padded qids clip onto the bias row; their vals are
    0 so they contribute nothing."""
    W = layer.W  # (D+1, L)
    Wg = W[jnp.clip(qids, 0, W.shape[0] - 1)]  # (N, Qn, L)
    scores_all = jnp.einsum(
        "bql,bq->bl", Wg, qvals, preferred_element_type=jnp.float32
    )
    if bias_id is not None:
        # bias feature handled out-of-band: one W-row broadcast instead of
        # widening every query with a padded bias block
        scores_all = scores_all + bias_val * W[bias_id]
    return jnp.take_along_axis(scores_all, cand, axis=1)


def score_candidates(X: jax.Array, layer: DeviceLayer, cand: jax.Array) -> jax.Array:
    """Raw scores x . w_l for candidate labels. X (N, D+1), cand (N, K) -> (N, K)."""
    if layer.kind == "dense":
        scores_all = jnp.dot(X, layer.W, preferred_element_type=jnp.float32)
        return jnp.take_along_axis(scores_all, cand, axis=1)
    else:
        if layer.packed is not None:
            P = layer.packed.shape[1] // 2
            w = layer.packed[cand]
            ids = w[..., :P]
            vals = jax.lax.bitcast_convert_type(w[..., P:], jnp.float32)
        else:
            ids = layer.feat_ids[cand]  # (N, K, P)
            vals = layer.feat_vals[cand]  # (N, K, P)
        xg = jnp.take_along_axis(X[:, None, :], ids, axis=2)  # (N, K, P)
        return jnp.sum(xg * vals.astype(jnp.float32), axis=-1)


def score_candidates_sparse(
    qids: jax.Array,  # (N, Qn) int32, pad id = D+1 with val 0
    qvals: jax.Array,  # (N, Qn) float32
    layer: DeviceLayer,
    cand: jax.Array,  # (N, K) int32
    chunk: int = 8,
    bias_id: Optional[int] = None,
    bias_val: float = 0.0,
) -> jax.Array:
    """Sparse-query x sparse-weight candidate scoring with NO dense gathers.

    TPU rationale: XLA's gather costs ~10 cycles per element, so scoring via
    x[feat_ids] is latency-bound (~120 ms for 10M lookups/batch on v5e).  The
    same scores come out of an id-intersection — compare the query's nonzero
    ids against each candidate label's ids and dot the matched values — which
    is pure VPU compare/select/reduce work and fuses into one XLA kernel
    (~6 ms for the same block).  This is the TPU analog of the reference's
    hash-chunk lookup (inference.hpp:705-840): reference hashes one query
    feature at a time; the TPU broadcasts all of them at once.
    """
    N, K = cand.shape
    P = (
        layer.packed.shape[1] // 2
        if layer.packed is not None
        else layer.feat_ids.shape[1]
    )
    pad_k = (-K) % chunk
    if pad_k:
        cand = jnp.concatenate([cand, jnp.zeros((N, pad_k), cand.dtype)], axis=1)
    Kp = cand.shape[1]
    if layer.packed is not None:
        # ids+vals interleaved in one array: one row gather instead of two
        w = layer.packed[cand]  # (N, Kp, 2P) int32
        wi = w[..., :P]
        wv = jax.lax.bitcast_convert_type(w[..., P:], jnp.float32)
    else:
        wi = layer.feat_ids[cand]  # (N, Kp, P) row gathers (cheap)
        wv = layer.feat_vals[cand].astype(jnp.float32)
    out = _dispatch_intersect(qids, qvals, wi, wv, chunk, bias_id, bias_val)
    return out[:, :K]


def _dispatch_intersect(qids, qvals, wi, wv, chunk, bias_id, bias_val):
    """Route the intersection to the fused Pallas kernel on TPU (measured
    ~1.2x the XLA scan at the Wiki-500K geometry, same values to 1 ulp of
    the final P-reduction; pecos_tpu/ops/intersect.py) and to the XLA scan
    elsewhere.  Override with PECOS_TPU_PALLAS_INTERSECT=0/1."""
    mode = os.environ.get("PECOS_TPU_PALLAS_INTERSECT", "auto")
    if mode != "0":
        from pecos_tpu.ops import intersect as ops_intersect

        N, Kp, P = wi.shape
        ok = ops_intersect.supports_shapes(N, Kp, P, qids.shape[1])
        backend_ok = mode == "1"
        if mode == "auto":
            try:
                backend_ok = jax.default_backend() == "tpu"
            except Exception:
                backend_ok = False
        if ok and backend_ok:
            return ops_intersect.intersect_scores_pallas(
                qids, qvals, wi, wv, bias_id=bias_id, bias_val=bias_val
            )
    return _intersect_scores(qids, qvals, wi, wv, chunk, bias_id, bias_val)


def _intersect_scores(qids, qvals, wi, wv, chunk, bias_id, bias_val):
    """Broadcast-intersection scoring core: scan over QUERY chunks.

    wi/wv are (N, Kp, P); returns (N, Kp).  The scan iterates over chunks of
    the query's nonzeros with a persistent (N, Kp, P) f32 accumulator of
    matched values — measured 1.39x faster than the earlier candidate-chunked
    scan at the Wiki-500K geometry (6.07 vs 8.41 ms for N=1024 K=160 P=64
    Qn=256 on v5e) because the per-iteration fusion keeps the whole
    (N, Kp, P, qc) compare block in registers and the reduction is an
    in-place accumulate instead of a fresh Qn-wide lane reduction per
    candidate block.  Exact: each weight slot matches at most one query id
    (CSR ids are unique per row), so chunked accumulation adds disjoint
    singletons and is bit-identical to the single-pass sum.
    ``chunk`` is kept for API compatibility (callers pad Kp to it)."""
    N, Kp, P = wi.shape
    Qn = qids.shape[1]
    qc = 64 if Qn % 64 == 0 else Qn
    qr = qids.reshape(N, Qn // qc, qc).swapaxes(0, 1)
    vr = qvals.reshape(N, Qn // qc, qc).swapaxes(0, 1)

    def step(g, blk):
        qi, qv = blk  # (N, qc)
        m = qi[:, None, None, :] == wi[:, :, :, None]  # (N, Kp, P, qc)
        return g + jnp.sum(jnp.where(m, qv[:, None, None, :], 0.0), axis=-1), None

    g, _ = jax.lax.scan(step, jnp.zeros((N, Kp, P), jnp.float32), (qr, vr))
    out = jnp.sum(g * wv, axis=-1)  # (N, Kp)
    if bias_id is not None:
        # the bias feature is a single known id: one compare over P
        # instead of widening Qn by a 128-wide padded bias block (that
        # block used to cost ~1/3 of the whole intersection)
        out = out + bias_val * jnp.sum(jnp.where(wi == bias_id, wv, 0.0), axis=-1)
    return out


def score_candidates_sparse_parents(
    qids: jax.Array,  # (N, Qn) int32
    qvals: jax.Array,  # (N, Qn) float32
    layer: DeviceLayer,
    parents: jax.Array,  # (N, Bm) int32, -1 padded
    chunk: int = 8,
    bias_id: Optional[int] = None,
    bias_val: float = 0.0,
) -> jax.Array:
    """Beam scoring from the parent-packed layout: ONE gathered row per beam
    parent covers all of its children's weights (children-table order), so
    the per-row-latency gather bound costs beam rows instead of beam*maxc.
    Returns (N, Bm*maxc) raw scores aligned with children[parents].reshape."""
    N, Bm = parents.shape
    pp = layer.parent_packed  # (n_parents, maxc, 2P)
    n_par, maxc, twoP = pp.shape
    P = twoP // 2
    safe_p = jnp.clip(parents, 0, n_par - 1)
    w = pp[safe_p].reshape(N, Bm * maxc, twoP)
    K = Bm * maxc
    pad_k = (-K) % chunk
    if pad_k:
        w = jnp.concatenate([w, jnp.zeros((N, pad_k, twoP), w.dtype)], axis=1)
    wi = w[..., :P]
    wv = jax.lax.bitcast_convert_type(w[..., P:], jnp.float32)
    out = _dispatch_intersect(qids, qvals, wi, wv, chunk, bias_id, bias_val)
    return out[:, :K]


def build_parent_packed(packed: np.ndarray, children: np.ndarray) -> np.ndarray:
    """Host-side (n_parents, maxc, 2P) layout: packed rows of each parent's
    children, zeros where the children table is -1 padded."""
    safe = np.clip(children, 0, packed.shape[0] - 1)
    pp = np.asarray(packed)[safe]  # (n_parents, maxc, 2P)
    pp[np.asarray(children) < 0] = 0
    return pp


def beam_step(
    X: jax.Array,
    layer: DeviceLayer,
    parents: jax.Array,  # (N, B) int32 node ids at previous level (-1 invalid)
    pvals: jax.Array,  # (N, B) float32 combined path values
    k: int,
    pp: PostProcessor,
    no_prev: bool,
    qids: Optional[jax.Array] = None,
    qvals: Optional[jax.Array] = None,
    bias_id: Optional[int] = None,
    bias_val: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Expand parents through one layer; returns (labels (N,k), values (N,k))."""
    N, B = parents.shape
    maxc = layer.max_children
    safe_parents = jnp.clip(parents, 0, layer.children.shape[0] - 1)
    cand = layer.children[safe_parents].reshape(N, B * maxc)  # (N, B*maxc)
    valid = (cand >= 0) & (parents >= 0).repeat(maxc, axis=1)
    cand_safe = jnp.clip(cand, 0, layer.nr_labels - 1)
    if layer.kind == "plabel" and qids is not None:
        if layer.parent_packed is not None:
            raw = score_candidates_sparse_parents(
                qids, qvals, layer, safe_parents, bias_id=bias_id, bias_val=bias_val
            )
        else:
            raw = score_candidates_sparse(
                qids, qvals, layer, cand_safe, bias_id=bias_id, bias_val=bias_val
            )
    elif layer.kind == "dense" and X is None:
        raw = score_candidates_dense_sparse(
            qids, qvals, layer, cand_safe, bias_id=bias_id, bias_val=bias_val
        )
    else:
        raw = score_candidates(X, layer, cand_safe)
    val = pp.transform_jnp(raw)
    if not no_prev:
        val = pp.combiner_jnp(val, pvals.repeat(maxc, axis=1))
    val = jnp.where(valid, val, NEG_INF)
    k = min(k, B * maxc)
    topv, topi = jax.lax.top_k(val, k)
    labels = jnp.take_along_axis(cand, topi, axis=1)
    labels = jnp.where(topv > NEG_INF * 0.5, labels, -1)
    return labels, topv


def chain_predict(
    X: Optional[jax.Array],
    layers: Sequence[DeviceLayer],
    beam_size: int,
    only_topk: int,
    pp_names: Tuple[str, ...],
    qids: Optional[jax.Array] = None,
    qvals: Optional[jax.Array] = None,
    bias_id: Optional[int] = None,
    bias_val: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Full-chain beam search.  Returns (labels (N, k), values (N, k)).

    X is the dense (N, D+1) query block used by dense layers; (qids, qvals)
    is the padded sparse form used by plabel layers (gather-free scoring).
    Either may be None when no layer of that kind exists.  ``bias_id``
    (the bias feature's column) lets sparse scoring add the bias term
    without a padded bias block widening every query row.
    """
    N = X.shape[0] if X is not None else qids.shape[0]
    depth = len(layers)
    # initial beam: every root-level cluster is active (one for a full chain,
    # K for a ranker-mode chain whose top C has K columns)
    n_roots = layers[0].children.shape[0]
    parents = jnp.tile(jnp.arange(n_roots, dtype=jnp.int32), (N, 1))
    pvals = jnp.full((N, n_roots), PostProcessor.get(pp_names[0]).init_value, jnp.float32)
    for d, layer in enumerate(layers):
        pp = PostProcessor.get(pp_names[d])
        k = only_topk if d == depth - 1 else beam_size
        parents, pvals = beam_step(
            X, layer, parents, pvals, k, pp, no_prev=(d == 0),
            qids=qids, qvals=qvals, bias_id=bias_id, bias_val=bias_val,
        )
    return parents, pvals


def save_compiled_layers(layers: Sequence[DeviceLayer], bias: float, nr_features: int, folder: str):
    """Persist device layouts for fast predict-only loading.

    The TPU analog of the reference's compile_mmap_model (mmap_util.hpp +
    xmc/base.py:1397-1409): the expensive CSC -> padded-layout conversion
    happens once at compile time; loading is np.load(mmap_mode='r') of
    ready-to-upload arrays.
    """
    import json as _json
    import os as _os

    _os.makedirs(folder, exist_ok=True)
    meta = {"bias": bias, "nr_features": nr_features, "layers": []}
    for d, layer in enumerate(layers):
        arrays = {"children": np.asarray(layer.children)}
        if layer.kind == "dense":
            arrays["W"] = np.asarray(layer.W)
        else:
            arrays["packed"] = (
                np.asarray(layer.packed)
                if layer.packed is not None
                else np.concatenate(
                    [np.asarray(layer.feat_ids), np.asarray(layer.feat_vals).view(np.int32)],
                    axis=1,
                )
            )
        np.savez(_os.path.join(folder, f"layer_{d}.npz"), **arrays)
        meta["layers"].append({"kind": layer.kind, "nr_labels": layer.nr_labels})
    with open(_os.path.join(folder, "compiled.json"), "w") as f:
        _json.dump(meta, f)


def _layer_from_npz(z, kind: str, nr_labels: int) -> DeviceLayer:
    children_np = np.asarray(z["children"])
    children = jnp.asarray(children_np)
    if kind == "dense":
        return DeviceLayer("dense", nr_labels, children, W=jnp.asarray(np.asarray(z["W"])))
    packed_np = np.asarray(z["packed"])
    return DeviceLayer(
        "plabel",
        nr_labels,
        children,
        packed=jnp.asarray(packed_np),
        parent_packed=jnp.asarray(build_parent_packed(packed_np, children_np)),
    )


class LazyLayerHandle:
    """A compiled layer left on disk (numpy mmap); uploaded on demand.

    The TPU analog of the reference's r_lazy mmap open mode
    (mmap_util.hpp:345): loading touches no layer bytes until a predict
    actually walks that layer."""

    def __init__(self, folder: str, d: int, kind: str, nr_labels: int):
        self._path = os.path.join(folder, f"layer_{d}.npz")
        self.kind = kind
        self.nr_labels = nr_labels

    @property
    def nbytes(self) -> int:
        return os.path.getsize(self._path)

    def to_device(self) -> DeviceLayer:
        z = np.load(self._path, mmap_mode="r")
        return _layer_from_npz(z, self.kind, self.nr_labels)


def load_compiled_layers(
    folder: str, lazy: bool = False, resident_budget_bytes: int = 2 << 30
):
    """Load a compiled model. ``lazy=True`` returns a streaming model that
    keeps layers on disk and uploads each to the device only while its level
    of the beam search runs (front layers small enough to fit
    ``resident_budget_bytes`` stay device-resident across calls) — the 100M
    label regime where the whole chain cannot live in HBM at once."""
    import json as _json

    with open(os.path.join(folder, "compiled.json")) as f:
        meta = _json.load(f)
    if lazy:
        handles = [
            LazyLayerHandle(folder, d, lm["kind"], lm["nr_labels"])
            for d, lm in enumerate(meta["layers"])
        ]
        return MmapCompiledHierModel(
            handles,
            bias=meta["bias"],
            nr_features=meta["nr_features"],
            resident_budget_bytes=resident_budget_bytes,
        )
    layers = []
    for d, lm in enumerate(meta["layers"]):
        z = np.load(os.path.join(folder, f"layer_{d}.npz"), mmap_mode="r")
        layers.append(_layer_from_npz(z, lm["kind"], lm["nr_labels"]))
    return CompiledHierModel(layers, bias=meta["bias"], nr_features=meta["nr_features"])


class CompiledHierModel:
    """Device-resident hierarchical model + cached jitted predictors.

    The jitted beam-search closure is specialized on (depth, layouts,
    post-processors, beam, topk, batch); query batches are padded to a fixed
    size so one compilation serves any query count.
    """

    def __init__(self, layers: List[DeviceLayer], bias: float, nr_features: int):
        self.layers = layers
        self.bias = bias
        self.nr_features = nr_features
        self._cache = {}

    @classmethod
    def from_host_chain(
        cls,
        Ws: Sequence[smat.spmatrix],
        Cs: Sequence[smat.spmatrix],
        bias: float,
        *,
        layouts: Optional[Sequence[Optional[str]]] = None,
        weight_dtype=jnp.float32,
    ) -> "CompiledHierModel":
        layers = []
        for d, (W, C) in enumerate(zip(Ws, Cs)):
            layout = layouts[d] if layouts is not None else None
            layers.append(build_device_layer(W, C, layout=layout, weight_dtype=weight_dtype))
        nr_features = Ws[0].shape[0] - (1 if bias > 0 else 0)
        return cls(layers, bias, nr_features)

    @property
    def nr_labels(self) -> int:
        return self.layers[-1].nr_labels

    @property
    def depth(self) -> int:
        return len(self.layers)

    def _predictor(self, beam_size: int, only_topk: int, pp_names: Tuple[str, ...], batch: int):
        key = ("dense", beam_size, only_topk, pp_names, batch)
        if key not in self._cache:

            @jax.jit
            def fn(X, layers):
                return chain_predict(X, layers, beam_size, only_topk, pp_names)

            self._cache[key] = fn
        return self._cache[key]

    def _sparse_predictor(
        self, beam_size: int, only_topk: int, pp_names: Tuple[str, ...], batch: int, cap: int
    ):
        key = ("sparse", beam_size, only_topk, pp_names, batch, cap)
        if key not in self._cache:
            D = self.nr_features
            bias = self.bias
            # dense layers score via the sparse W-row gather only when the
            # densified query block would be genuinely large (the win is
            # skipping a GB-scale (B, D+1) scatter + matmul per batch); for
            # small D the scatter is cheap and the matmul path keeps scoring
            # bit-identical to the streaming/mmap predictor.  A dense layer
            # too wide for the gather intermediate also forces the scatter.
            has_dense = any(l.kind == "dense" for l in self.layers) and (
                batch * (D + 2) <= (1 << 26)
                or any(
                    l.kind == "dense" and batch * cap * l.nr_labels > (1 << 28)
                    for l in self.layers
                )
            )
            has_plabel = any(l.kind == "plabel" for l in self.layers)
            use_sparse_q = has_plabel or not has_dense
            # the bias feature is a single known column: sparse scorers add
            # it with one compare per weight row (bias_id) instead of a
            # 128-wide padded bias block widening every query (that block
            # used to be ~1/3 of the whole intersection's VPU work)
            bias_id = D if bias > 0 else None

            @jax.jit
            def fn(ids, vals, layers):
                # densify only when a too-wide dense layer needs it
                X = scatter_queries(ids, vals, D, bias) if has_dense else None
                qi, qv = (ids, vals) if use_sparse_q else (None, None)
                return chain_predict(
                    X, layers, beam_size, only_topk, pp_names,
                    qids=qi, qvals=qv, bias_id=bias_id, bias_val=bias,
                )

            self._cache[key] = fn
        return self._cache[key]

    def _wire_predictor(
        self,
        beam_size: int,
        only_topk: int,
        pp_names: Tuple[str, ...],
        batch: int,
        cap: int,
        val_dtype: str = "float32",
    ):
        """Predictor taking the fused uint16 wire buffer (encode_wire_batch).

        Same beam walk as _sparse_predictor; the only difference is the
        device-side unpack (a handful of VPU shifts per query nonzero,
        ~0.1% of the intersection's work) and an optional bf16 value cast.
        """
        key = ("wire", beam_size, only_topk, pp_names, batch, cap, val_dtype)
        if key not in self._cache:
            D = self.nr_features
            inner = self._sparse_predictor(beam_size, only_topk, pp_names, batch, cap)

            @jax.jit
            def fn(buf, layers):
                ids, vals = decode_wire_batch(buf, D, cap, val_dtype)
                return inner(ids, vals, layers)

            self._cache[key] = fn
        return self._cache[key]

    def predict(
        self,
        X,
        *,
        beam_size: int = 10,
        only_topk: int = 20,
        post_processor="l3-hinge",
        batch_size: int = 1024,
        wire_value_dtype: str = "float32",
    ) -> smat.csr_matrix:
        """Host-facing predict: any X (sparse/dense) -> sorted top-k CSR.

        ``post_processor`` may be a single name (applied to every layer, like
        the C++ override) or a tuple of per-layer names.

        ``wire_value_dtype``: dtype of query values on the host->device wire
        ("float32" exact; "float16" or "bfloat16" halve their wire bytes —
        scores are then computed from values rounded to 11/8 mantissa bits
        respectively; measured top-k agreement at the Wiki-500K geometry is
        in benchmarks/README.md).  float16 is the better half-width choice
        for TF-IDF-range values (|v| << 65504, so the narrow f16 exponent
        never saturates and the 3 extra mantissa bits are free precision).
        Query ids always travel bit-packed (exact; see pack_query_ids).
        """
        if X.shape[1] != self.nr_features:
            raise ValueError(
                f"Feature dimension of query matrix ({X.shape[1]}) does not match "
                f"weight matrix ({self.nr_features})"
            )
        if isinstance(post_processor, str):
            pp_names = tuple([post_processor] * self.depth)
        else:
            pp_names = tuple(post_processor)
        for name in pp_names:
            PostProcessor.get(name)  # validate early with a clear error
        N = X.shape[0]
        batch = min(batch_size, max(1, 1 << max(N - 1, 0).bit_length()))
        sparse_input = smat.issparse(X)
        nb = -(-N // batch) if N else 0
        tail = nb * batch - N
        # transfer strategy: per-batch host->device upload immediately before
        # each dispatch (the enqueued upload of batch i+1 overlaps the device
        # compute of batch i), and ONE stacked fetch at the end.  Measured on
        # the tunneled v5e at the Wiki-500K geometry (8x1024 queries):
        # per-batch fetches 7.7K QPS, one bulk upload + one fetch 12.2K,
        # per-batch uploads + one fetch 18.4K — fetches serialize the stream,
        # uploads pipeline.
        if sparse_input:
            # PER-BATCH prep + upload: prepping the whole set first is a
            # serial host prefix (~60-100 ms at 8K queries) during which the
            # ~70 MB/s tunnel sits idle; prepping one batch (~5 ms), enqueuing
            # its (async) upload + dispatch, then prepping the next overlaps
            # host pack, wire, and device compute three ways
            # (scripts/probe_e2e.py).  Each batch travels as ONE fused
            # bit-packed uint16 buffer (encode_wire_batch): at Wiki-500K
            # geometry the naive f32 padded format's uploads cost more than
            # the whole beam walk (scripts/probe_wire.py).
            A = X.tocsr()
            D = self.nr_features
            row_nnz = np.diff(A.indptr)
            max_nnz = int(row_nnz.max()) if N else 1
            cap = max(64, 1 << max(0, max_nnz - 1).bit_length())
            fn = self._wire_predictor(
                beam_size, only_topk, pp_names, batch, cap, wire_value_dtype
            )

            # Producer thread packs+encodes batch i+1 while the main thread
            # enqueues batch i's (async) upload: the ~50 MB/s tunnel never
            # idles waiting on host prep (~6 ms/batch, measured
            # scripts/probe_overlap.py — serial prep cost the r4 bench ~20%
            # of its end-to-end time).  Queue depth 2 bounds host memory to
            # two wire buffers beyond the one in flight.
            def _prep(i):
                ids_b, vals_b = prepare_queries_padded(
                    A[i * batch : (i + 1) * batch], cap=cap
                )
                if ids_b.shape[0] < batch:
                    pad = batch - ids_b.shape[0]
                    ids_b = np.vstack([ids_b, np.full((pad, cap), D + 1, np.int32)])
                    vals_b = np.vstack([vals_b, np.zeros((pad, cap), np.float32)])
                return encode_wire_batch(ids_b, vals_b, D, wire_value_dtype)

            pending = []
            if nb > 1:
                import queue as _queue
                import threading as _threading

                bufq: "_queue.Queue" = _queue.Queue(maxsize=2)

                def _producer():
                    for i in range(nb):
                        bufq.put(_prep(i))

                th = _threading.Thread(target=_producer, daemon=True)
                th.start()
                for _ in range(nb):
                    pending.append(fn(jnp.asarray(bufq.get()), self.layers))
                th.join()
            elif nb:
                pending.append(fn(jnp.asarray(_prep(0)), self.layers))
        else:
            Xd = prepare_queries(X, self.bias)
            fn = self._predictor(beam_size, only_topk, pp_names, batch)
            if tail:
                Xd = np.vstack([Xd, np.zeros((tail, Xd.shape[1]), np.float32)])
            X_r = Xd.reshape(nb, batch, Xd.shape[1])
            pending = [fn(jnp.asarray(X_r[i]), self.layers) for i in range(nb)]
        if pending:
            # ONE stacked fetch: measured on the tunneled v5e, per-batch
            # fetches (even async ones) serialize the dispatch stream while
            # a single device-side concat + fetch costs one RTT total
            stacked = jnp.concatenate([l for l, _ in pending]), jnp.concatenate(
                [v for _, v in pending]
            )
            labels, vals = (np.asarray(a) for a in jax.device_get(stacked))
            if tail:
                labels, vals = labels[:-tail], vals[:-tail]
        else:
            labels = np.zeros((0, only_topk), np.int64)
            vals = np.zeros((0, only_topk), np.float32)
        return smat_util.csr_from_topk_arrays(labels, vals, self.nr_labels)

    def realtime_session(self, **kwargs) -> "RealtimeSession":
        """Open a persistent low-latency predict session (see RealtimeSession)."""
        return RealtimeSession(self, **kwargs)


class RealtimeSession:
    """Persistent low-latency predict session over a compiled model.

    The realtime analog of the reference's ``predict_on_selected_outputs``
    serving loop (inference.hpp:2030-2080 realtime predict_internal): the
    batch-``batch`` beam-walk executable is compiled ONCE at session open and
    every ``predict`` call is exactly one host->device dispatch plus one
    fetch — no per-call tracing, no per-call shape work, one wire buffer.

    On a host-attached TPU the per-call transport overhead is PCIe
    microseconds, so call latency ~= the engine's on-device latency.  On a
    network-tunneled device (this testbed) each call additionally pays one
    transport round trip; ``on_device_latency_ms`` measures the engine alone
    by chaining ``iters`` data-dependent walks device-side and fetching once,
    so the engine number stays honest no matter the transport.
    """

    def __init__(
        self,
        model: "CompiledHierModel",
        *,
        beam_size: int = 10,
        only_topk: int = 20,
        post_processor="l3-hinge",
        batch: int = 1,
        cap: int = 64,
        wire_value_dtype: str = "float32",
    ):
        self.model = model
        self.batch = int(batch)
        self.cap = int(cap)
        self.beam_size = beam_size
        self.only_topk = only_topk
        self.wire_value_dtype = wire_value_dtype
        if isinstance(post_processor, str):
            self.pp_names = tuple([post_processor] * model.depth)
        else:
            self.pp_names = tuple(post_processor)
        for name in self.pp_names:
            PostProcessor.get(name)
        self._fn = model._wire_predictor(
            beam_size, only_topk, self.pp_names, self.batch, self.cap, wire_value_dtype
        )
        # warm: compile + load the executable now so the first real query
        # doesn't pay the (remote) compile
        D = model.nr_features
        ids = np.full((self.batch, self.cap), D + 1, np.int32)
        vals = np.zeros((self.batch, self.cap), np.float32)
        self._warm_wire = encode_wire_batch(ids, vals, D, wire_value_dtype)
        jax.device_get(self._fn(jnp.asarray(self._warm_wire), model.layers))

    def predict(self, X) -> smat.csr_matrix:
        """One dispatch + one fetch for up to ``batch`` query rows (CSR/dense)."""
        if not smat.issparse(X):
            X = smat.csr_matrix(np.asarray(X, np.float32))
        n = X.shape[0]
        if n > self.batch:
            raise ValueError(f"session batch is {self.batch}, got {n} rows")
        if X.shape[1] != self.model.nr_features:
            raise ValueError(
                f"Feature dimension of query matrix ({X.shape[1]}) does not match "
                f"weight matrix ({self.model.nr_features})"
            )
        D = self.model.nr_features
        A = X.tocsr()
        if A.shape[0] and int(np.diff(A.indptr).max()) > self.cap:
            raise ValueError(
                f"query has more nonzeros than the session cap ({self.cap}); "
                "open the session with a larger cap"
            )
        ids, vals = prepare_queries_padded(A, cap=self.cap)
        if n < self.batch:
            pad = self.batch - n
            ids = np.vstack([ids, np.full((pad, self.cap), D + 1, np.int32)])
            vals = np.vstack([vals, np.zeros((pad, self.cap), np.float32)])
        buf = encode_wire_batch(ids, vals, D, self.wire_value_dtype)
        labels, scores = jax.device_get(self._fn(jnp.asarray(buf), self.model.layers))
        return smat_util.csr_from_topk_arrays(
            np.asarray(labels)[:n].astype(np.int64),
            np.asarray(scores)[:n],
            self.model.nr_labels,
        )

    def on_device_latency_ms(self, X=None, iters: int = 32) -> float:
        """Engine-only per-call latency: chain ``iters`` DATA-DEPENDENT beam
        walks on device (each walk's query ids are perturbed by the previous
        walk's top label, forcing strictly sequential execution) and fetch
        once — the transport round trip is paid once, not per walk."""
        model = self.model
        D = model.nr_features
        if X is not None:
            A = X.tocsr() if smat.issparse(X) else smat.csr_matrix(np.asarray(X, np.float32))
            ids, vals = prepare_queries_padded(A[: self.batch], cap=self.cap)
            if ids.shape[0] < self.batch:
                pad = self.batch - ids.shape[0]
                ids = np.vstack([ids, np.full((pad, self.cap), D + 1, np.int32)])
                vals = np.vstack([vals, np.zeros((pad, self.cap), np.float32)])
        else:
            rng = np.random.default_rng(0)
            ids = np.sort(
                rng.integers(0, D, size=(self.batch, self.cap), dtype=np.int32), axis=1
            )
            vals = rng.standard_normal((self.batch, self.cap)).astype(np.float32) * 0.1
        inner = model._sparse_predictor(
            self.beam_size, self.only_topk, self.pp_names, self.batch, self.cap
        )

        @jax.jit
        def _chained(i, v, layers):
            lbl, _ = inner(i, v, layers)
            shift = (lbl[0, 0] % jnp.int32(7)).astype(jnp.int32)
            return jnp.where(i >= D + 1, i, (i + shift) % jnp.int32(D)), v, lbl

        i_d, v_d = jnp.asarray(ids), jnp.asarray(vals)
        ii, vv, out = _chained(i_d, v_d, model.layers)
        jax.device_get(out)  # warm
        ii, vv = i_d, v_d
        t0 = time.time()
        for _ in range(iters):
            ii, vv, out = _chained(ii, vv, model.layers)
        jax.device_get(out)
        return (time.time() - t0) * 1000.0 / iters


@functools.partial(jax.jit, static_argnames=())
def _score_selected_jit(X, layer, cand):
    return score_candidates(X, layer, cand)


def score_selected_labels(
    layer: DeviceLayer, X, bias: float, labels_padded: np.ndarray, batch_size: int = 1024
) -> np.ndarray:
    """Raw scores x . w_l for explicit padded (N, cap) label ids (-1 = pad)."""
    Xd = prepare_queries(X, bias)
    N = Xd.shape[0]
    out = []
    batch = min(batch_size, max(1, 1 << max(N - 1, 0).bit_length())) if N else 1
    for s in range(0, N, batch):
        xb = Xd[s : s + batch]
        lb = labels_padded[s : s + batch]
        pad = batch - xb.shape[0]
        if pad:
            xb = np.vstack([xb, np.zeros((pad, xb.shape[1]), np.float32)])
            lb = np.vstack([lb, np.full((pad, lb.shape[1]), -1, np.int32)])
        cand = jnp.clip(jnp.asarray(lb), 0, layer.nr_labels - 1)
        raw = np.asarray(jax.device_get(_score_selected_jit(jnp.asarray(xb), layer, cand)))
        out.append(raw[: raw.shape[0] - pad] if pad else raw)
    return np.vstack(out) if out else np.zeros((0, labels_padded.shape[1]), np.float32)


# ---------------------------------------------------------------------------
# single-layer predict (MLModel.predict / csr_codes path)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "pp_name", "no_prev"))
def _single_layer_jit(X, layer, parents, pvals, *, k, pp_name, no_prev):
    pp = PostProcessor.get(pp_name)
    return beam_step(X, layer, parents, pvals, k, pp, no_prev)


def single_layer_predict(
    layer: DeviceLayer,
    X,
    bias: float,
    csr_codes: Optional[smat.csr_matrix],
    only_topk: int,
    post_processor: str,
    batch_size: int = 1024,
) -> smat.csr_matrix:
    """One-layer predict with optional previous-layer beam (csr_codes).

    Mirrors clib.xlinear_single_layer_predict: candidates are children of the
    active clusters in csr_codes (all clusters if None); values combine with
    the csr_codes values unless csr_codes is None.
    """
    Xd = prepare_queries(X, bias)
    N = Xd.shape[0]
    n_parents = layer.children.shape[0]
    if csr_codes is None:
        parents_np = np.tile(np.arange(n_parents, dtype=np.int32), (N, 1))
        pvals_np = np.full((N, n_parents), PostProcessor.get(post_processor).init_value, np.float32)
        no_prev = True
    else:
        codes = csr_codes.tocsr()
        counts = np.diff(codes.indptr)
        max_b = max(int(counts.max()), 1) if N else 1
        # bucket the beam width to limit recompiles
        max_b = 1 << (max_b - 1).bit_length()
        parents_np = np.full((N, max_b), -1, dtype=np.int32)
        pvals_np = np.zeros((N, max_b), dtype=np.float32)
        rows = np.repeat(np.arange(N), counts)
        offs = np.arange(codes.nnz) - np.repeat(codes.indptr[:-1], counts)
        parents_np[rows, offs] = codes.indices
        pvals_np[rows, offs] = codes.data
        no_prev = False
    k = min(only_topk, parents_np.shape[1] * layer.max_children)
    batch = min(batch_size, max(1, 1 << (N - 1).bit_length())) if N else 1
    # dispatch all batches (uploads overlap device compute), fetch at the end
    pending = []
    for s in range(0, N, batch):
        xb = Xd[s : s + batch]
        pb = parents_np[s : s + batch]
        vb = pvals_np[s : s + batch]
        pad = batch - xb.shape[0]
        if pad:
            xb = np.vstack([xb, np.zeros((pad, xb.shape[1]), np.float32)])
            pb = np.vstack([pb, np.full((pad, pb.shape[1]), -1, np.int32)])
            vb = np.vstack([vb, np.zeros((pad, vb.shape[1]), np.float32)])
        out = _single_layer_jit(
            jnp.asarray(xb),
            layer,
            jnp.asarray(pb),
            jnp.asarray(vb),
            k=k,
            pp_name=post_processor,
            no_prev=no_prev,
        )
        pending.append((out, pad))
    out_idx, out_val = [], []
    for (labels, vals), pad in pending:
        labels = np.asarray(jax.device_get(labels))
        vals = np.asarray(jax.device_get(vals))
        if pad:
            labels, vals = labels[:-pad], vals[:-pad]
        out_idx.append(labels)
        out_val.append(vals)
    labels = np.concatenate(out_idx) if out_idx else np.zeros((0, k), np.int64)
    vals = np.concatenate(out_val) if out_val else np.zeros((0, k), np.float32)
    return smat_util.csr_from_topk_arrays(labels, vals, layer.nr_labels)


# ---------------------------------------------------------------------------
# streaming (lazy) compiled model — 100M-label regime
# ---------------------------------------------------------------------------


class MmapCompiledHierModel:
    """Predict-only model whose layers live on disk and stream to the device.

    The beam search runs level-major: each level's weight layout is uploaded
    once per predict call, all query batches step through it, then its HBM is
    released before the next level loads — so peak device memory is
    max(layer) + beams, not sum(layers). Layers that fit the resident budget
    (front/top levels are tiny) stay uploaded across calls. Reference analog:
    r/r_lazy mmap open modes (mmap_util.hpp:345, xmc/base.py:1397-1409).
    """

    def __init__(
        self,
        handles: Sequence[LazyLayerHandle],
        bias: float,
        nr_features: int,
        resident_budget_bytes: int = 2 << 30,
    ):
        self.handles = list(handles)
        self.bias = bias
        self.nr_features = nr_features
        self._resident = {}
        used = 0
        for d, h in enumerate(self.handles):
            if used + h.nbytes <= resident_budget_bytes:
                self._resident[d] = h.to_device()
                used += h.nbytes
            else:
                break

    @property
    def nr_labels(self) -> int:
        return self.handles[-1].nr_labels

    @property
    def depth(self) -> int:
        return len(self.handles)

    def predict(
        self,
        X,
        *,
        beam_size: int = 10,
        only_topk: int = 20,
        post_processor="l3-hinge",
        batch_size: int = 1024,
    ) -> smat.csr_matrix:
        if X.shape[1] != self.nr_features:
            raise ValueError(
                f"Feature dimension of query matrix ({X.shape[1]}) does not match "
                f"weight matrix ({self.nr_features})"
            )
        if isinstance(post_processor, str):
            pp_names = tuple([post_processor] * self.depth)
        else:
            pp_names = tuple(post_processor)
        for name in pp_names:
            PostProcessor.get(name)
        Xd = prepare_queries(X, self.bias)
        N = Xd.shape[0]
        batch = min(batch_size, max(1, 1 << max(N - 1, 0).bit_length()))
        # upload padded query batches once; beams carry across levels
        X_bufs, beams = [], []
        for s in range(0, N, batch):
            xb = Xd[s : s + batch]
            pad = batch - xb.shape[0]
            if pad:
                xb = np.vstack([xb, np.zeros((pad, xb.shape[1]), np.float32)])
            X_bufs.append((jnp.asarray(xb), pad))
            beams.append((None, None))
        for d in range(self.depth):
            layer = self._resident.get(d)
            if layer is None:
                layer = self.handles[d].to_device()
            k = only_topk if d == self.depth - 1 else beam_size
            if d == 0:
                n_roots = layer.children.shape[0]
                init_val = PostProcessor.get(pp_names[0]).init_value
            for i, (xb, pad) in enumerate(X_bufs):
                parents, pvals = beams[i]
                if parents is None:
                    parents = jnp.tile(
                        jnp.arange(n_roots, dtype=jnp.int32), (xb.shape[0], 1)
                    )
                    pvals = jnp.full((xb.shape[0], n_roots), init_val, jnp.float32)
                beams[i] = _single_layer_jit(
                    xb, layer, parents, pvals, k=k, pp_name=pp_names[d], no_prev=(d == 0)
                )
            if d not in self._resident:
                del layer  # release the streamed layer's HBM before the next level
        out_idx, out_val = [], []
        for (xb, pad), (labels, vals) in zip(X_bufs, beams):
            labels = np.asarray(jax.device_get(labels))
            vals = np.asarray(jax.device_get(vals))
            if pad:
                labels, vals = labels[:-pad], vals[:-pad]
            out_idx.append(labels)
            out_val.append(vals)
        labels = np.concatenate(out_idx) if out_idx else np.zeros((0, only_topk), np.int64)
        vals = np.concatenate(out_val) if out_val else np.zeros((0, only_topk), np.float32)
        return smat_util.csr_from_topk_arrays(labels, vals, self.nr_labels)
