"""4-bit product quantization for HNSW level-0 scoring.

Reference: HNSWProductQuantizer4Bits (pecos/core/ann/hnsw.hpp:976-1335 +
quantizer_impl/*.hpp): 16 centroids per subspace (4 bits/code), per-query
uint8 distance LUT (quantized with scale+bias, common.hpp:95-140), neighbor
scoring via AVX512 shuffle LUT gather, exact rerank of the top candidates.

TPU re-design: the AVX shuffle becomes a vectorized table gather — codes are
kept unpacked as (N, S) uint8 on device (HBM is plentiful; int8 lanes are
native) and a candidate's approximate distance is
``sum_s LUT[s, code[n, s]]`` computed with one take_along_axis + sum over a
whole (batch x candidates) block.  Codebooks train with a few Lloyd rounds of
batched k-means on the MXU.
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ProductQuantizer4Bits:
    """Codebooks (S, 16, d_sub) + per-point codes (N, S) uint8."""

    codebooks: np.ndarray  # (S, 16, d_sub) float32
    codes: np.ndarray  # (N, S) uint8
    dim: int  # original (unpadded) feature dim

    @property
    def num_subspaces(self) -> int:
        return self.codebooks.shape[0]

    @property
    def d_sub(self) -> int:
        return self.codebooks.shape[2]


def _pad_dim(X: np.ndarray, num_subspaces: int) -> np.ndarray:
    D = X.shape[1]
    d_sub = -(-D // num_subspaces)
    pad = num_subspaces * d_sub - D
    if pad:
        X = np.hstack([X, np.zeros((X.shape[0], pad), X.dtype)])
    return X


@functools.partial(jax.jit, static_argnames=("iters",))
def _kmeans16(Xs: jax.Array, key: jax.Array, iters: int) -> jax.Array:
    """(N, d) -> (16, d) centroids via Lloyd iterations (batched on MXU)."""
    N = Xs.shape[0]
    init_idx = jax.random.choice(key, N, shape=(16,), replace=False)
    cent = Xs[init_idx]

    def body(_, cent):
        d = (
            jnp.sum(Xs * Xs, axis=1, keepdims=True)
            - 2.0 * jnp.dot(Xs, cent.T, preferred_element_type=jnp.float32, precision="highest")
            + jnp.sum(cent * cent, axis=1)[None, :]
        )
        assign = jnp.argmin(d, axis=1)
        sums = jax.ops.segment_sum(Xs, assign, num_segments=16)
        cnts = jax.ops.segment_sum(jnp.ones((N,), jnp.float32), assign, num_segments=16)
        new = sums / jnp.maximum(cnts, 1.0)[:, None]
        return jnp.where(cnts[:, None] > 0, new, cent)

    return jax.lax.fori_loop(0, iters, body, cent)


@functools.partial(jax.jit, static_argnames=("S", "d_sub", "chunk"))
def _encode_chunk_device(feats, cent, s0, *, S, d_sub, chunk):
    """Encode rows [s0, s0+chunk) of a device feature array: nearest of 16
    centroids per subspace, on the MXU.  dynamic_slice clamps at the edge
    (the caller re-aims the final partial chunk)."""
    blk = jax.lax.dynamic_slice_in_dim(feats, s0, chunk).astype(jnp.float32)
    B, D = blk.shape
    pad = S * d_sub - D
    if pad:
        blk = jnp.concatenate([blk, jnp.zeros((B, pad), jnp.float32)], axis=1)
    Xs = blk.reshape(B, S, d_sub)
    d = (
        jnp.sum(Xs * Xs, axis=-1, keepdims=True)
        - 2.0
        * jnp.einsum(
            "bsd,skd->bsk", Xs, cent, preferred_element_type=jnp.float32, precision="highest"
        )
        + jnp.sum(cent * cent, axis=-1)[None, :, :]
    )
    return jnp.argmin(d, axis=-1).astype(jnp.uint8)


def train_pq4(
    X: np.ndarray,
    num_subspaces: int = 64,
    iters: int = 10,
    seed: int = 0,
    max_train_points: int = 131072,
    feats_dev=None,
) -> ProductQuantizer4Bits:
    """Train per-subspace 16-centroid codebooks and encode all points.

    Codebooks train on at most ``max_train_points`` sampled rows: 16
    centroids need nowhere near the full corpus, and the vmapped-over-
    subspaces k-means would otherwise hold (S, N, d_sub) intermediates —
    32 GB at SIFT-1M scale (observed OOM on a 16 GB chip).

    When the caller already holds the features on device (``feats_dev``,
    e.g. the HNSW build), encoding runs there in fixed-shape chunks — the
    per-subspace host loop costs ~30 s at 1M points, the MXU path ~1 s."""
    D = X.shape[1]
    N = X.shape[0]
    Xp = _pad_dim(np.asarray(X, np.float32), num_subspaces)
    d_sub = Xp.shape[1] // num_subspaces
    Xs = Xp.reshape(N, num_subspaces, d_sub)
    if N > max_train_points:
        sel = np.random.default_rng(seed).choice(N, max_train_points, replace=False)
        X_train = Xs[sel]
    else:
        X_train = Xs
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, num_subspaces)
    cent = jax.vmap(lambda xs, k: _kmeans16(xs, k, iters), in_axes=(1, 0))(
        jnp.asarray(X_train), keys
    )  # (S, 16, d_sub)
    codes = np.empty((N, num_subspaces), np.uint8)
    if feats_dev is not None and getattr(feats_dev, "ndim", 0) == 2:
        chunk = min(N, 1 << 17)
        starts = list(range(0, max(N - chunk, 0) + 1, chunk))
        if starts[-1] + chunk < N:
            starts.append(N - chunk)  # re-aimed final partial chunk
        for s0 in starts:
            out = _encode_chunk_device(
                feats_dev, cent, jnp.int32(s0), S=num_subspaces, d_sub=d_sub, chunk=chunk
            )
            codes[s0 : s0 + chunk] = np.asarray(out)
        cent = np.asarray(cent)
        return ProductQuantizer4Bits(codebooks=cent, codes=codes, dim=D)
    cent = np.asarray(cent)
    for s in range(num_subspaces):
        d = (
            (Xs[:, s, :] ** 2).sum(1, keepdims=True)
            - 2.0 * Xs[:, s, :] @ cent[s].T
            + (cent[s] ** 2).sum(1)[None, :]
        )
        codes[:, s] = np.argmin(d, axis=1).astype(np.uint8)
    return ProductQuantizer4Bits(codebooks=cent, codes=codes, dim=D)


def build_lut(pq: ProductQuantizer4Bits, Q: np.ndarray, metric: str) -> np.ndarray:
    """Per-query LUT (B, S, 16): distance contribution of each centroid.

    l2: ||q_s - c||^2 per subspace.  ip: -<q_s, c> (summing gives -<q, x~>;
    adding 1 at use-site matches the 1 - <q, x> convention).
    """
    B = Q.shape[0]
    Qp = _pad_dim(np.asarray(Q, np.float32), pq.num_subspaces)
    Qs = Qp.reshape(B, pq.num_subspaces, pq.d_sub)
    dots = np.einsum("bsd,skd->bsk", Qs, pq.codebooks)
    if metric == "ip":
        return (-dots).astype(np.float32)
    qq = (Qs**2).sum(-1, keepdims=True)
    cc = (pq.codebooks**2).sum(-1)[None, :, :]
    return (qq + cc - 2.0 * dots).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("metric",))
def build_lut_device(
    codebooks: jax.Array,  # (S, 16, d_sub) float32
    Q: jax.Array,  # (B, D) float32/bfloat16, D <= S * d_sub
    *,
    metric: str,
) -> jax.Array:
    """Device-side build_lut: (B, S, 16) per-query LUT without a host round
    trip.  Used by the PQ-guided graph build, where queries are gathered rows
    of the device feature array (model.py) and a host LUT would force a fetch
    per insertion batch."""
    S, K, d_sub = codebooks.shape
    B, D = Q.shape
    pad = S * d_sub - D
    Qf = Q.astype(jnp.float32)
    if pad:
        Qf = jnp.concatenate([Qf, jnp.zeros((B, pad), jnp.float32)], axis=1)
    Qs = Qf.reshape(B, S, d_sub)
    dots = jnp.einsum(
        "bsd,skd->bsk", Qs, codebooks, preferred_element_type=jnp.float32, precision="highest"
    )
    if metric == "ip":
        return -dots
    qq = jnp.sum(Qs * Qs, axis=-1, keepdims=True)
    cc = jnp.sum(codebooks * codebooks, axis=-1)[None, :, :]
    return qq + cc - 2.0 * dots


def pq_apply_lut(
    lut: jax.Array,  # (B, S, 16) float32
    c: jax.Array,  # (B, K, S) uint8/int32 codes already gathered
    ip_offset: float = 0.0,
) -> jax.Array:
    """sum_s LUT[b, s, c[b, k, s]] as a 4-level binary select tree.

    NOT a gather: take_along_axis here would issue B*K*S scalar gathers,
    which XLA executes at ~14 ns each inside device loops (measured
    ~1 s/step at SIFT-1M shapes).  A 16-way compare+select+accumulate scan
    costs ~48 VPU ops per (k, s) element; selecting on the code's 4 bits
    instead halves the live table at each level (8+4+2+1 selects + 4 bit
    tests ~= 20 ops), ~2.4x less VPU work for identical selected values.
    TPU analog of the reference's AVX512 shuffle-LUT
    (quantizer_impl/x86.hpp)."""
    c = c.astype(jnp.int32)
    t = lut[:, None, :, :]  # (B, 1, S, 16) broadcast over candidates
    t = jnp.where((c & 8)[..., None] != 0, t[..., 8:], t[..., :8])  # (B,K,S,8)
    t = jnp.where((c & 4)[..., None] != 0, t[..., 4:], t[..., :4])
    t = jnp.where((c & 2)[..., None] != 0, t[..., 2:], t[..., :2])
    v = jnp.where((c & 1) != 0, t[..., 1], t[..., 0])  # (B, K, S)
    return jnp.sum(v, axis=-1) + ip_offset


def pq_gather_dist(
    lut: jax.Array,  # (B, S, 16) float32
    codes: jax.Array,  # (N, S) uint8 on device
    ids: jax.Array,  # (B, K) int32 candidate ids
    ip_offset: float = 0.0,
) -> jax.Array:
    """Approximate distances for candidates: sum_s LUT[b, s, code[id, s]]."""
    c = codes[jnp.clip(ids, 0, codes.shape[0] - 1)]  # (B, K, S)
    return pq_apply_lut(lut, c, ip_offset)
