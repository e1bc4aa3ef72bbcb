"""HNSW model: batch-parallel build + TPU-batched search.

API parity with the reference (pecos/ann/hnsw/model.py:33-269): TrainParams
(M=32, efC=100, metric ip/l2), PredParams (efS=100, topk=10), predict returns
(indices, distances) arrays or a csr matrix; save/load as param.json + arrays.

Build strategy (see graph.py docstring): deterministic growing batches replace
lock-based parallel insertion; every batch's candidate searches run as one
device call.  Features may be dense (N, D) arrays or CSR — sparse storage
keeps TF-IDF-width data (D in the millions) feasible, with distances computed
by the broadcast id-intersection kernels in graph.py (the TPU analog of the
reference's sparse block intersection, feat_vectors.hpp:195-340).
"""

from __future__ import annotations

import dataclasses as dc
import functools
import json
import logging
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as smat

import pecos_tpu
from pecos_tpu.utils import smat_util
from .graph import (
    DeviceGraph,
    SparseBlock,
    SparseFeats,
    batch_greedy_descent_multi,
    batch_search_level,
    build_sparse_feats,
    gather_dist,
    scatter_prune_rows,
    scatter_prune_rows_alg4,
)

LOGGER = logging.getLogger(__name__)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_set_rows(arr, rows, vals):
    """Replace whole rows in place; out-of-bounds row ids are dropped (pad lanes)."""
    return arr.at[rows, :].set(vals, mode="drop")


@jax.jit
def _gather_rows(feats, idx):
    """Jitted row gather (works for dense arrays and SparseFeats pytrees).

    The eager ``feats[idx]`` in the build's per-batch search path dispatches
    through apply_primitive every call (~10-25 ms host each over the tunnel);
    a jitted gather is one cached dispatch."""
    return feats[idx]


def _hash_sketch(X, sk: int) -> np.ndarray:
    """Count-sketch (feature-hashing) projection of CSR rows to sk dims.

    E[<phi(x), phi(y)>] = <x, y> with variance ~ (|x|^2|y|^2 + <x,y>^2)/sk,
    so a 128-dim sketch of unit-normalized TF-IDF rows ranks neighbors well
    enough to GUIDE a graph walk (final candidates are exact-rescored).
    Hash/sign come from a multiplicative mix of the column id — no (D, sk)
    projection matrix, so D in the millions costs nothing."""
    N = X.shape[0]
    h = X.indices.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    bucket = ((h >> np.uint64(40)) % np.uint64(sk)).astype(np.int64)
    sign = np.where((h >> np.uint64(13)) & np.uint64(1), np.float32(1.0), np.float32(-1.0))
    rows = np.repeat(np.arange(N, dtype=np.int64), np.diff(X.indptr))
    flat = np.bincount(
        rows * sk + bucket, weights=X.data * sign, minlength=N * sk
    )
    return flat.reshape(N, sk).astype(np.float32)


def _group_edges(dst: np.ndarray, src: np.ndarray, k_pad: int):
    """Group (src -> dst) edges by destination node.

    Returns a list of (rows, cands) numpy pairs where rows is (A,) unique
    destinations and cands is (A, k_pad) -1-padded source lists. Nodes
    receiving more than k_pad new edges get follow-up groups (sequential
    keep-closest pruning of chunks equals one-shot pruning of the union).
    """
    order = np.argsort(dst, kind="stable")
    dst_s, src_s = dst[order], src[order]
    uniq, start, counts = np.unique(dst_s, return_index=True, return_counts=True)
    rank = np.arange(len(dst_s)) - np.repeat(start, counts)
    out = []
    chunk = 0
    while True:
        in_chunk = (rank >= chunk * k_pad) & (rank < (chunk + 1) * k_pad)
        if not in_chunk.any():
            break
        sel_mask = counts > chunk * k_pad
        rows = uniq[sel_mask]
        cands = np.full((len(rows), k_pad), -1, np.int32)
        local_row = np.cumsum(sel_mask) - 1  # uniq idx -> position in rows
        ui = np.repeat(np.arange(len(uniq)), counts)[in_chunk]
        cands[local_row[ui], rank[in_chunk] - chunk * k_pad] = src_s[in_chunk]
        out.append((rows.astype(np.int32), cands))
        chunk += 1
    return out


class HNSW(pecos_tpu.BaseClass):
    # bytes of HBM the PQ-guided build's packed descriptor array may claim
    # (must leave room for feats + co-arrays + a transient repack copy;
    # 4.5 GB keeps S=64 alive at N=1M/maxM0=64 — measured peak with the
    # old copy freed before repack stays under ~10 GB on a 16 GB chip)
    BUILD_PQ_HBM_BUDGET = 4608 << 20

    @dc.dataclass
    class TrainParams(pecos_tpu.BaseParams):
        M: int = 32
        efC: int = 100
        max_level_upper_bound: int = 5
        metric_type: str = "ip"  # ip | l2
        max_M: Optional[int] = None  # upper-level degree cap, default M
        max_M0: Optional[int] = None  # level-0 degree cap, default 2*M
        seed: int = 0
        threads: int = -1  # parity only
        build_batch_size: int = 2048
        refine_iters: int = 1  # graph-repair passes after batched insertion
        # level-0 INSERTION search beam; 0 = efC (default).  Hypothesis tested
        # and REJECTED as a default at SIFT-1M: since the refine pass
        # re-searches every node at full efC, a narrower insertion beam (64)
        # looked free — it cut the build 930.5 s -> 809.6 s but cost recall
        # 0.9914 -> 0.9809 at efS=100 (below the reference's 0.9910): refine
        # walks the scaffold insertion built, and a weaker scaffold degrades
        # the refine searches themselves.  Left as an explicit knob for
        # recall-tolerant callers.  The reference has no refine pass and no
        # analog of this knob (hnsw.hpp:805-809).
        build_efC_insert: int = 0
        reverse_alg4: bool = False  # Alg-4 (vs keep-closest) reverse-edge prune
        # candidates popped per best-first iteration during BUILD searches:
        # higher = fewer sequential while_loop steps (each step pays a full
        # HBM gather + beam re-sort) at a few % more distance evals.
        # 0 = auto: 8 for dense features (the MXU scores the extra pops for
        # free and halving the step count halved the measured 100K build),
        # 4 for sparse (per-pair intersection cost dominates there)
        build_expand: int = 0
        # bfloat16 build searches halve gather bandwidth; forward/reverse
        # selection is distance-ORDER based so bf16 rounding barely moves it
        # (measured at SIFT-100K: recall 0.9998 vs 1.0000 at efS=50).
        # auto = bfloat16 for dense builds, float32 storage otherwise
        build_dtype: str = "auto"  # auto | float32 | bfloat16
        # feature storage: auto = keep CSR input sparse when densifying is
        # infeasible (D > sparse_dim_threshold); drm forces dense; csr forces
        # sparse (reference data_type, pecos/ann/hnsw/model.py:130-147)
        data_type: str = "auto"  # auto | drm | csr
        sparse_dim_threshold: int = 65536
        # PQ-guided build: level-0 insertion/refine searches walk the graph
        # on packed 4-bit PQ neighbor descriptors (ONE row gather per popped
        # node, see graph.pack_neighbor_codes) and the candidate list is
        # exact-rescored before Alg-4 selection.  In-loop search cost is
        # per-row gather overhead (~14 ns/row), so packed descriptors cut it
        # ~expand*M/expand = M-fold; edge selection and reverse-edge pruning
        # stay exact, so graph quality tracks the exact build (equality is
        # not expected — batched builds are already schedule-dependent).
        # Sparse features: PQ codes quantize a count-sketch (feature-hashing)
        # projection of the CSR rows to build_pq_sketch_dim dims — the guide
        # walk replaces the per-step broadcast-intersection distance kernels
        # (the dominant sparse build cost) with LUT lookups; only the
        # once-per-batch rescore/selection still runs sparse-exact.
        # auto = OFF (round-4 measurement: at SIFT-100K the exact bf16 walk
        # with expand=8 builds in 61.5 s eager / 54.7 s scanned vs the PQ
        # guide's 103.7 s — the LUT apply is VPU table-gathers, ~10-30x the
        # cost of the exact path's contiguous MACs per scored neighbor, the
        # same architectural fact that makes PQ4 SEARCH slower than exact on
        # this chip, benchmarks/README.md); "true" opts the guide back in
        # (it remains profitable for sparse corpora, where exact per-pair
        # intersection is the expensive step).
        build_pq: str = "auto"  # auto (off) | true | false
        build_pq_subspaces: int = 64
        build_pq_min_points: int = 50000
        # count-sketch width for the sparse-feature guide (see build_pq)
        build_pq_sketch_dim: int = 128
        # sparse builds: compute Alg-4 selection CROSS-distances from the
        # count-sketch (one MXU einsum) instead of the exact broadcast-
        # intersection mask — >50% of sparse build wall-clock (measured
        # 1.6 s/dispatch at B=2048/E=100/P=96).  MEASURED to cost recall on
        # clustered corpora (hash-collision noise lands exactly on Alg-4's
        # prune margins), so this is opt-in; the default fast path is
        # select_pool truncation, which stays exact.
        build_select_sketch: str = "false"  # true | false
        # >0: Alg-4 selection considers only the select_pool closest
        # candidates (exact distances).  The cross-distance work is quadratic
        # in pool width — the dominant sparse-build cost — while selection
        # quality only needs the pool to comfortably exceed M.  0 = full
        # search width (reference semantics, hnsw.hpp:555-592 scans all efC).
        select_pool: int = 0
        # PQ-guided searches run with ef = ceil(efC * this) and the widened
        # candidate list is exact-rescored before selection: the 4-bit guide
        # misranks the tail of the pool, so searching a little wider recovers
        # the true top-efC that an exact search would have found (measured at
        # SIFT-1M: the whole recall gap between PQ-guided and exact builds
        # lives in this tail).  Cost is ~linear in ef for the in-loop sort.
        build_pq_ef_mult: float = 1.3
        # Scan-fused build: the level-0 insertion loop and the refine pass run
        # as lax.scan megakernels (one device dispatch per ~SEG batches)
        # instead of ~10 host dispatches + uploads per batch.  The reference's
        # analog of the removed overhead is its OMP fan-out cost per point
        # (hnsw.hpp:805-809) — here the host loop itself was the bottleneck at
        # 1M points (thousands of dispatch/upload round trips through a
        # remote-device tunnel).  Upper-level points (~N/M of the corpus) are
        # inserted eagerly FIRST at all their levels, so every scanned batch
        # descends a finished upper hierarchy and always lands on an
        # L0-connected node.  auto = on for the device-resident (fast) build
        # path at N >= 65536; reverse_alg4 stays on the host-grouped loop.
        build_scan: str = "auto"  # auto | true | false
        # Intra-batch candidate merge (scan build): points inserted in the
        # same batch search the PRE-batch graph and so never see each other —
        # the defect the full-beam refine pass exists to repair.  Merging the
        # top-build_intra_k same-batch neighbors (ONE (B, B) MXU matmul on
        # features already in registers — no gathers) into each point's
        # candidate list fixes it at insert time for ~zero cost, where the
        # refine pass re-walks the whole graph (~40% of 1M build wall-clock).
        # 0 disables.  The reference's sequential insert has no such defect
        # (and no such pass) — hnsw.hpp:805-846 inserts one point at a time.
        build_intra_k: int = 32
        # Partial refine (scan mode): re-search only the earliest-inserted
        # fraction of nodes — the ones whose forward lists were built while
        # the graph was small and are therefore stale — against the LIVE
        # graph, scatter their re-selected lists, and reverse-merge.  Costs
        # ~fraction of a full pass.  1.0 = the classic full-rebuild pass.
        refine_fraction: float = 1.0

    @dc.dataclass
    class PredParams(pecos_tpu.BaseParams):
        efS: int = 100
        topk: int = 10
        threads: int = -1  # parity only
        # queries per device dispatch: one while_loop over an unbounded query
        # count is a single minutes-long XLA execution, which remote runtimes
        # may kill; chunking also bounds the search intermediates in HBM
        batch_size: int = 2048

    def __init__(
        self,
        feats: np.ndarray,
        neighbors0: np.ndarray,
        upper_neighbors: np.ndarray,
        node_levels: np.ndarray,
        entry_point: int,
        metric: str,
        pred_params=None,
    ):
        self.feats = feats  # (N, D) float32 host copy, dense ndarray or CSR
        self.neighbors0 = neighbors0  # (N, maxM0) int32
        self.upper_neighbors = upper_neighbors  # (max_level, N, maxM) int32
        self.node_levels = node_levels  # (N,) int32
        self.entry_point = int(entry_point)
        self.metric = metric
        self.pred_params = self.PredParams.from_dict(pred_params)
        self._dev: Optional[Tuple[DeviceGraph, list]] = None

    # -- device residency -------------------------------------------------------
    def _device(self):
        if self._dev is None:
            feats_d = (
                build_sparse_feats(self.feats)
                if smat.issparse(self.feats)
                else jnp.asarray(self.feats)
            )
            g0 = DeviceGraph(feats_d, jnp.asarray(self.neighbors0), self.metric)
            uppers = [
                DeviceGraph(feats_d, jnp.asarray(self.upper_neighbors[l]), self.metric)
                for l in range(self.upper_neighbors.shape[0])
            ]
            self._dev = (g0, uppers)
        return self._dev

    # -- train ------------------------------------------------------------------
    @classmethod
    def train(cls, X, train_params=None, pred_params=None, **kwargs) -> "HNSW":
        """Build the graph with deterministic batched insertion + refinement.

        Phase 1 (insert): points are added in growing batches; each batch
        searches the frozen graph in one device call, selects forward edges
        with fused Alg-4 (batch_select_from_search), and merges reverse edges
        with the batched scatter-prune kernel. All per-edge work that the
        reference does under per-node mutexes (hnsw.hpp:597-672) happens as a
        handful of device scatters per batch — there is no per-point Python.

        Phase 2 (refine, refine_iters passes): every node re-searches the
        finished graph for efC candidates, unions them with its current
        neighbors, re-selects forward edges with Alg-4, and the level-0
        adjacency is rebuilt from forward + distance-pruned reverse edges.
        This repairs the edges batched insertion misses (points inserted in
        the same batch never see each other) and is what lifts recall to the
        reference's ~1.0 operating point.

        Every device call uses ONE padded batch shape, so the whole build
        compiles a fixed handful of kernels regardless of N.
        """
        from .graph import (
            INF,
            batch_search_level_pq_packed,
            batch_select_from_search,
            exact_rescore,
            pack_rows_codes,
            refine_union_candidates,
            reverse_merge_chunk,
            reverse_merge_chunk_packed,
            reverse_merge_closest,
            reverse_merge_closest_packed,
            scatter_prune_rows_packed,
            scatter_set_rows_d,
            scatter_set_rows_packed,
            scatter_set_rows_packed_d,
        )

        params = cls.TrainParams.from_dict(train_params)
        params.override_with_kwargs(kwargs)
        use_sparse = smat.issparse(X) and (
            params.data_type == "csr"
            or (params.data_type == "auto" and X.shape[1] > params.sparse_dim_threshold)
        )
        if use_sparse:
            feats = X.tocsr().astype(np.float32)
        elif smat.issparse(X):
            feats = np.asarray(X.todense(), np.float32)
        else:
            feats = np.asarray(X, np.float32)
        N, D = feats.shape
        M = params.M
        maxM = params.max_M or M
        maxM0 = params.max_M0 or 2 * M
        efC = params.efC
        ef_ins = params.build_efC_insert or efC
        rng = np.random.default_rng(params.seed)

        # geometric level assignment (hnsw.hpp:785-794)
        mult = 1.0 / np.log(max(M, 2))
        levels = np.minimum(
            (-np.log(rng.uniform(size=N, low=1e-12)) * mult).astype(np.int32),
            params.max_level_upper_bound,
        )
        levels[0] = levels.max()  # first point anchors the top level
        max_level = int(levels.max())
        entry = 0
        metric = params.metric_type

        feats_d = build_sparse_feats(feats) if use_sparse else jnp.asarray(feats)
        build_dtype = params.build_dtype
        if build_dtype == "auto":
            build_dtype = "float32" if use_sparse else "bfloat16"
        if build_dtype == "bfloat16" and not use_sparse:
            # build-time search copy only; the model keeps f32 host feats
            feats_d = feats_d.astype(jnp.bfloat16)
        build_expand = params.build_expand or (4 if use_sparse else 8)
        dev_n0 = jnp.full((N, maxM0), -1, jnp.int32)
        dev_up = [jnp.full((N, maxM), -1, jnp.int32) for _ in range(max_level)]
        # Fast path (keep-closest reverse pruning, the default): a float32
        # distance co-array rides along with every adjacency array, making
        # the whole reverse-edge pass device-resident (reverse_merge_closest)
        # — no per-batch host fetch, no edge grouping, no feature gathers.
        # reverse_alg4=True keeps the original host-grouped scatter-prune
        # path (the diversity heuristic needs candidate cross-distances).
        fast = not params.reverse_alg4
        dev_d0 = jnp.full((N, maxM0), INF, jnp.float32) if fast else None
        dev_up_d = (
            [jnp.full((N, maxM), INF, jnp.float32) for _ in range(max_level)]
            if fast
            else [None] * max_level
        )

        # -- PQ-guided level-0 build search (see TrainParams.build_pq) --
        # Auto-fit the subspace count to the descriptor HBM budget: the
        # packed array costs N*maxM0*S bytes and must coexist with feats,
        # both co-arrays, the upper levels, and a transient second copy
        # during the refine repack — S shrinks before the feature is
        # disabled (coarser guide codes only perturb routing; the candidate
        # list is exact-rescored either way).
        guide_dim = params.build_pq_sketch_dim if use_sparse else D
        S_req = min(params.build_pq_subspaces, max(1, guide_dim // 2))
        S_fit = int(cls.BUILD_PQ_HBM_BUDGET // max(1, N * maxM0))
        S_pq = max(1, min(S_req, S_fit))
        # PQ-guided walk: auto enables it for dense features only — the
        # sketch+PQ guide measurably costs recall on sparse corpora, and the
        # sparse walk is NOT the build bottleneck (selection is; see
        # build_select_sketch) — sparse callers may still opt in with "true"
        # auto = off since round 4: the exact bf16/expand-8 walk measurably
        # beats the PQ-guided walk on dense corpora (see TrainParams.build_pq)
        use_pq_build = params.build_pq == "true" and S_pq >= 1 and guide_dim >= 2
        # count-sketch of sparse rows: selection cross-distances (and the
        # optional sparse PQ walk) ride a dense (N, sk) projection
        sketch_d = None
        if use_sparse and (
            params.build_select_sketch == "true"
            or (use_pq_build and params.build_pq == "true")
        ):
            sketch_d = jnp.asarray(_hash_sketch(feats, guide_dim))
        sel_sketch = sketch_d if params.build_select_sketch == "true" else None
        sel_pool = int(params.select_pool)
        codes_d = codebooks_d = nbr_desc = guide_d = None
        if use_pq_build:
            from .pq import build_lut_device, train_pq4

            t_pq = time.time()
            if use_sparse:
                guide_d = sketch_d
                pq = train_pq4(
                    np.asarray(sketch_d),
                    num_subspaces=S_pq,
                    iters=10,
                    seed=params.seed,
                    feats_dev=sketch_d,
                )
            else:
                guide_d = feats_d
                pq = train_pq4(
                    feats, num_subspaces=S_pq, iters=10, seed=params.seed, feats_dev=feats_d
                )
            codes_d = jnp.asarray(pq.codes)
            codebooks_d = jnp.asarray(pq.codebooks)
            # 2-D packed layout (N, maxM0*S): true-size HBM tiling — a 3-D
            # (N, maxM0, S) uint8 array lane-pads S -> 128 and doubles memory
            nbr_desc = jnp.zeros((N, maxM0 * S_pq), jnp.uint8)
            LOGGER.info(
                "hnsw build: PQ guide trained (S=%d) in %.1fs", S_pq, time.time() - t_pq
            )

        # single padded batch shape -> fixed set of compiled kernels
        B = min(params.build_batch_size, max(32, 1 << (max(N - 1, 1)).bit_length()))
        K_PAD = 64  # reverse-edge arrivals per node per scatter call
        # affected-row chunk for scatter-prune calls: each call gathers
        # (A, cap + K_PAD, D) candidate features — budget ~2^28 elements so
        # one batch needs a handful of dispatches, not dozens (every extra
        # dispatch pays a full tunnel round trip)
        row_width = feats_d.ids.shape[1] if use_sparse else feats.shape[1]
        A_CHUNK = int(
            min(65536, max(4096, (1 << 28) // max(1, (maxM0 + K_PAD) * row_width)))
        )

        def search_batch(
            q_idx: np.ndarray, entry_: int, ef: int, at_level: int = 0,
            Bq: Optional[int] = None,
        ):
            """Search the current graph AT a given level for q_idx (padded to
            Bq, default B); descends greedily through the levels above it
            first, exactly like the reference's per-level insertion search
            (hnsw.hpp:721-746).  Upper-level insertions carry ~B/M real
            queries, so callers pass a pow2-bucketed Bq — search cost scales
            with the padded width, and a 2048-wide search for 64 points is
            30x wasted work.  Returns (Bq, ef) ids/dists."""
            Bq = B if Bq is None else Bq
            pad = np.zeros(Bq - len(q_idx), np.int64)
            q_idx_dev = jnp.asarray(np.concatenate([q_idx, pad]))
            Q = _gather_rows(feats_d, q_idx_dev)
            cur = jnp.full((Bq,), entry_, jnp.int32)
            if max_level > at_level:
                # whole descent in ONE dispatch (profile: per-level descent
                # dispatches cost ~33 ms each through the tunnel)
                uppers_t = tuple(dev_up[l - 1] for l in range(max_level, at_level, -1))
                cur = batch_greedy_descent_multi(
                    feats_d, uppers_t, Q, cur, metric=metric, max_steps=64
                )
            if at_level == 0 and use_pq_build:
                # walk on packed PQ descriptors with a widened beam (the
                # 4-bit guide misranks the pool's tail), exact-rescore the
                # result so edge selection always sees exact distances
                ef_pq = int(np.ceil(ef * params.build_pq_ef_mult))
                Qg = Q if guide_d is feats_d else _gather_rows(guide_d, q_idx_dev)
                lut = build_lut_device(codebooks_d, Qg, metric=metric)
                ids, _ = batch_search_level_pq_packed(
                    codes_d,
                    dev_n0,
                    nbr_desc,
                    lut,
                    cur[:, None],
                    ef=ef_pq,
                    max_steps=4 * ef_pq,
                    expand=build_expand,
                )
                return exact_rescore(Q, feats_d, ids, metric=metric)
            arr = dev_n0 if at_level == 0 else dev_up[at_level - 1]
            g = DeviceGraph(feats_d, arr, metric)
            return batch_search_level(
                g, Q, cur[:, None], ef=ef, max_steps=4 * ef, expand=build_expand
            )

        def bucket_pow2(n: int, lo: int, hi: int) -> int:
            return int(min(hi, max(lo, 1 << (max(n, 1) - 1).bit_length())))

        def apply_reverse(arr, desc, dst: np.ndarray, src: np.ndarray, use_alg4: bool):
            """Merge src->dst reverse edges into adjacency arr (device).

            When ``desc`` is given (PQ-guided L0 build) the packed descriptor
            array is pruned/rewritten in the same dispatch; returns
            (arr, desc)."""
            prune = scatter_prune_rows_alg4 if use_alg4 else scatter_prune_rows
            Nn = arr.shape[0]
            for rows, cands in _group_edges(dst, src, K_PAD):
                for a0 in range(0, len(rows), A_CHUNK):
                    r = rows[a0 : a0 + A_CHUNK]
                    c = cands[a0 : a0 + A_CHUNK]
                    # pow2-bucketed pad: late edge groups are tiny (tens of
                    # rows) and a full-A_CHUNK pad would gather 100x the
                    # features the group needs
                    a_sz = min(A_CHUNK, max(1024, 1 << (len(r) - 1).bit_length()))
                    a_pad = a_sz - len(r)
                    if a_pad > 0:
                        r = np.concatenate([r, np.full(a_pad, Nn, np.int32)])
                        c = np.concatenate([c, np.full((a_pad, K_PAD), -1, np.int32)])
                    if desc is not None:
                        arr, desc = scatter_prune_rows_packed(
                            arr,
                            desc,
                            codes_d,
                            feats_d,
                            jnp.asarray(r),
                            jnp.asarray(c),
                            metric=metric,
                            alg4=use_alg4,
                        )
                    else:
                        arr = prune(
                            arr, feats_d, jnp.asarray(r), jnp.asarray(c), metric=metric
                        )
            return arr, desc

        def pad_rows(vals: np.ndarray, cap: int) -> np.ndarray:
            out = np.full((vals.shape[0], cap), -1, np.int32)
            k = min(cap, vals.shape[1])
            out[:, :k] = vals[:, :k]
            return out

        # ---- phase 1: batched insertion (growing ramp, then steady B) ----
        # Scan mode (build_scan): only the upper-level points (~N/M of the
        # corpus) go through this eager loop — at ALL their levels, L0
        # included, so the frozen upper hierarchy + every greedy-descent
        # landing node exist before the scanned level-0 sweep starts.
        # auto applies to DENSE corpora only: the dense 1M scan build is
        # measured at recall parity (benchmarks/README.md); sparse scans are
        # opt-in (build_scan="true") until an at-scale sparse recall
        # measurement against ground truth exists.
        use_scan = params.build_scan == "true" or (
            params.build_scan == "auto" and fast and N >= 65536 and not use_sparse
        )
        if use_scan and not fast:
            LOGGER.warning("build_scan requires the device-resident (fast) path; ignoring")
            use_scan = False
        if use_scan:
            order = np.where(levels >= 1)[0]
            order = order[order != 0]
        else:
            order = np.arange(1, N)
        pos = 0
        bs = 32
        while pos < len(order):
            batch = order[pos : pos + bs]
            b = len(batch)
            ids_d, dists_d = search_batch(batch, entry, ef_ins)
            sel_ids, sel_d = batch_select_from_search(
                feats_d, ids_d, dists_d, M=M, metric=metric, sketch=sel_sketch,
                pool=sel_pool,
            )
            # forward + reverse edges at level 0
            batch_pad = np.full(B, N, np.int64)
            batch_pad[:b] = batch
            rows_dev = jnp.asarray(batch_pad)
            if fast:
                # fully device-resident: set forward rows, then merge the
                # reverse edges — no host fetch of the selection at all
                if use_pq_build:
                    dev_n0, dev_d0, nbr_desc = scatter_set_rows_packed_d(
                        dev_n0, dev_d0, nbr_desc, codes_d, rows_dev, sel_ids, sel_d
                    )
                    dev_n0, dev_d0, nbr_desc = reverse_merge_closest_packed(
                        dev_n0, dev_d0, nbr_desc, codes_d, rows_dev, sel_ids, sel_d
                    )
                else:
                    dev_n0, dev_d0 = scatter_set_rows_d(
                        dev_n0, dev_d0, rows_dev, sel_ids, sel_d
                    )
                    dev_n0, dev_d0 = reverse_merge_closest(
                        dev_n0, dev_d0, rows_dev, sel_ids, sel_d
                    )
            else:
                sel_all = np.asarray(sel_ids)[:b]
                fwd0 = np.full((B, maxM0), -1, np.int32)
                fwd0[:b] = pad_rows(sel_all, maxM0)
                if use_pq_build:
                    dev_n0, nbr_desc = scatter_set_rows_packed(
                        dev_n0, nbr_desc, codes_d, rows_dev, jnp.asarray(fwd0)
                    )
                else:
                    dev_n0 = _scatter_set_rows(dev_n0, rows_dev, jnp.asarray(fwd0))
                valid = sel_all >= 0
                dst = sel_all[valid].astype(np.int64)
                src = np.repeat(batch, valid.sum(axis=1))
                if len(dst):
                    dev_n0, nbr_desc = apply_reverse(
                        dev_n0, nbr_desc, dst, src, params.reverse_alg4
                    )
            # upper levels: search AT each level for that level's candidates
            # and connect there — the reference inserts per level lc..0 with
            # per-level searches (hnsw.hpp:747-783); deriving upper edges from
            # L0 candidates instead produces weak routing graphs (measured:
            # recall collapsed to 0.31 at 1M points on clustered data)
            for l in range(1, max_level + 1):
                pts = batch[levels[batch] >= l]
                if len(pts) == 0:
                    continue
                B_up = bucket_pow2(len(pts), 32, B)
                ids_l, dists_l = search_batch(pts, entry, efC, at_level=l, Bq=B_up)
                sel_l, sel_dl = batch_select_from_search(
                    feats_d, ids_l, dists_l, M=M, metric=metric, sketch=sel_sketch,
                    pool=sel_pool,
                )
                rows = np.full(B_up, N, np.int64)
                rows[: len(pts)] = pts
                rows_l = jnp.asarray(rows)
                if fast:
                    dev_up[l - 1], dev_up_d[l - 1] = scatter_set_rows_d(
                        dev_up[l - 1], dev_up_d[l - 1], rows_l, sel_l, sel_dl
                    )
                    dev_up[l - 1], dev_up_d[l - 1] = reverse_merge_closest(
                        dev_up[l - 1], dev_up_d[l - 1], rows_l, sel_l, sel_dl
                    )
                    continue
                sel_np = np.asarray(sel_l)[: len(pts)]
                fwd_l = np.full((B_up, maxM), -1, np.int32)
                fwd_l[: len(pts)] = pad_rows(sel_np, maxM)
                dev_up[l - 1] = _scatter_set_rows(
                    dev_up[l - 1], rows_l, jnp.asarray(fwd_l)
                )
                validl = sel_np >= 0
                dstl = sel_np[validl].astype(np.int64)
                srcl = np.repeat(pts, validl.sum(axis=1))
                if len(dstl):
                    dev_up[l - 1], _ = apply_reverse(
                        dev_up[l - 1], None, dstl, srcl, params.reverse_alg4
                    )
            top = batch[np.argmax(levels[batch])]
            if levels[top] > levels[entry]:
                entry = int(top)
            pos += b
            bs = min(B, max(32, pos + 1))
            if pos % (64 * B) < b:
                LOGGER.info("hnsw build: %d/%d inserted", pos + 1, N)

        # ---- phase 1b (scan mode): level-0 points via lax.scan megakernels ----
        # The eager loop above issues ~10 dispatches + several host<->device
        # transfers per batch; at 1M points that is thousands of tunnel round
        # trips.  Here the whole steady-state insertion runs as a handful of
        # scans: per segment ONE dispatch covers SEG batches.  Frozen arrays
        # (features, PQ codes, upper levels) are passed as jit ARGUMENTS, not
        # closures, so no multi-GB buffer gets baked into an executable and
        # pinned past its phase.
        SEG = 32  # batches per scan dispatch (bounds single-execution length)
        if use_scan:
            if use_pq_build:
                from .pq import build_lut_device

            guide_is_feats = guide_d is feats_d
            uppers_desc = tuple(dev_up[l - 1] for l in range(max_level, 0, -1))
            frozen_common = {
                "feats": feats_d,
                "codes": codes_d,
                "cb": codebooks_d,
                "guide": None if guide_is_feats else guide_d,
                "sketch": sel_sketch,
                "up": uppers_desc,
            }

            def _search_l0(frozen, n0, desc, bids_row, ef):
                """Descent + level-0 search for one scanned batch (traced)."""
                safe = jnp.minimum(bids_row, N - 1)
                Q = frozen["feats"][safe]
                cur = jnp.full((bids_row.shape[0],), entry, jnp.int32)
                if max_level > 0:
                    cur = batch_greedy_descent_multi(
                        frozen["feats"], frozen["up"], Q, cur, metric=metric, max_steps=64
                    )
                if use_pq_build:
                    ef_pq = int(np.ceil(ef * params.build_pq_ef_mult))
                    Qg = Q if guide_is_feats else frozen["guide"][safe]
                    lut = build_lut_device(frozen["cb"], Qg, metric=metric)
                    ids_pq, _ = batch_search_level_pq_packed(
                        frozen["codes"], n0, desc, lut, cur[:, None],
                        ef=ef_pq, max_steps=4 * ef_pq, expand=build_expand,
                    )
                    ids_d, dists_d = exact_rescore(Q, frozen["feats"], ids_pq, metric=metric)
                else:
                    g = DeviceGraph(frozen["feats"], n0, metric)
                    ids_d, dists_d = batch_search_level(
                        g, Q, cur[:, None], ef=ef, max_steps=4 * ef,
                        expand=build_expand,
                    )
                return Q, ids_d, dists_d

            # dense-only: sparse Q rows are padded (ids, vals) pairs, not a
            # matmul-able block (and sparse scan builds are opt-in anyway)
            intra_k = 0 if use_sparse else min(int(params.build_intra_k), B - 1)

            def _intra_merge(Q, bids_row, ids_d, dists_d):
                """Merge top-intra_k SAME-BATCH neighbors into the candidate
                list.  Same-batch points are absent from the searched graph by
                construction, so no dedup is needed; one (B, B) MXU matmul on
                the already-gathered Q rows costs no extra HBM traffic."""
                f32 = jnp.float32
                dots = jnp.einsum(
                    "bd,cd->bc", Q, Q, preferred_element_type=f32
                )
                if metric == "ip":
                    Dq = 1.0 - dots
                else:
                    nn = jnp.sum(Q.astype(f32) * Q.astype(f32), axis=-1)
                    Dq = nn[:, None] + nn[None, :] - 2.0 * dots
                invalid = (bids_row >= N) | (bids_row < 0)
                Bsz = bids_row.shape[0]
                mask = invalid[None, :] | jnp.eye(Bsz, dtype=bool)
                Dq = jnp.where(mask, INF, Dq)
                neg_d, idx = jax.lax.top_k(-Dq, intra_k)  # (B, k)
                in_ids = jnp.where(neg_d > -INF / 2, bids_row[idx], -1)
                in_d = jnp.where(neg_d > -INF / 2, -neg_d, INF)
                all_ids = jnp.concatenate([ids_d, in_ids], axis=1)
                all_d = jnp.concatenate([dists_d, in_d], axis=1)
                order = jnp.argsort(all_d, axis=1)
                E = ids_d.shape[1]  # keep select at the original width
                return (
                    jnp.take_along_axis(all_ids, order, axis=1)[:, :E],
                    jnp.take_along_axis(all_d, order, axis=1)[:, :E],
                )

            def _l0_body(carry, bids_row, frozen):
                if use_pq_build:
                    n0, d0, desc = carry
                else:
                    (n0, d0), desc = carry, None
                Q, ids_d, dists_d = _search_l0(frozen, n0, desc, bids_row, ef_ins)
                if intra_k > 0:
                    ids_d, dists_d = _intra_merge(Q, bids_row, ids_d, dists_d)
                sel_ids, sel_d = batch_select_from_search(
                    frozen["feats"], ids_d, dists_d, M=M, metric=metric,
                    sketch=frozen["sketch"], pool=sel_pool,
                )
                if use_pq_build:
                    n0, d0, desc = scatter_set_rows_packed_d(
                        n0, d0, desc, frozen["codes"], bids_row, sel_ids, sel_d
                    )
                    n0, d0, desc = reverse_merge_closest_packed(
                        n0, d0, desc, frozen["codes"], bids_row, sel_ids, sel_d
                    )
                    return (n0, d0, desc), None
                n0, d0 = scatter_set_rows_d(n0, d0, bids_row, sel_ids, sel_d)
                n0, d0 = reverse_merge_closest(n0, d0, bids_row, sel_ids, sel_d)
                return (n0, d0), None

            @functools.partial(jax.jit, donate_argnums=(0,))
            def _run_insert(carry, frozen, xs):
                return jax.lax.scan(lambda c, x: _l0_body(c, x, frozen), carry, xs)[0]

            l0_pts = np.where(levels == 0)[0]
            l0_pts = l0_pts[l0_pts != 0].astype(np.int32)
            if len(l0_pts):
                nb = -(-len(l0_pts) // B)
                nb_total = -(-nb // SEG) * SEG  # pad to whole segments: ONE shape
                bids_all = np.full(nb_total * B, N, np.int32)
                bids_all[: len(l0_pts)] = l0_pts
                bids_all = bids_all.reshape(nb_total, B)
                carry = (dev_n0, dev_d0, nbr_desc) if use_pq_build else (dev_n0, dev_d0)
                t_scan = time.time()
                for s in range(0, nb_total, SEG):
                    carry = _run_insert(
                        carry, frozen_common, jnp.asarray(bids_all[s : s + SEG])
                    )
                    LOGGER.info(
                        "hnsw build: scanned %d/%d level-0 batches (%.1fs)",
                        min(s + SEG, nb_total), nb_total, time.time() - t_scan,
                    )
                carry = jax.block_until_ready(carry)
                if use_pq_build:
                    dev_n0, dev_d0, nbr_desc = carry
                else:
                    dev_n0, dev_d0 = carry

        # ---- phase 2: refinement passes over the finished graph ----
        N_CEIL = -(-N // B) * B  # fast path accumulators padded to whole batches
        if use_scan and params.refine_iters > 0:
            # scan-mode refine wrappers, hoisted ABOVE the refine loop so
            # refine_iters > 1 reuses the compiled executables (defining them
            # per-iteration would re-trace + re-compile each pass — expensive
            # through the remote-compile tunnel the scan mode exists to avoid)
            def _ref_body(carry, nodes_row, frozen, n0f, d0f, descf):
                acc_ids, acc_d = carry
                _, ids_d, dists_d = _search_l0(frozen, n0f, descf, nodes_row, efC)
                nodes_key = jnp.where(nodes_row >= N, jnp.int32(-2), nodes_row)
                all_ids, all_d = refine_union_candidates(
                    n0f, d0f, nodes_key, ids_d, dists_d
                )
                sel, sel_dv = batch_select_from_search(
                    frozen["feats"], all_ids, all_d, M=M, metric=metric,
                    sketch=frozen["sketch"], pool=sel_pool,
                )
                acc_ids, acc_d = scatter_set_rows_d(
                    acc_ids, acc_d, nodes_row, sel, sel_dv
                )
                return (acc_ids, acc_d), None

            @functools.partial(jax.jit, donate_argnums=(0,))
            def _run_refine(carry, frozen, n0f, d0f, descf, xs):
                return jax.lax.scan(
                    lambda c, x: _ref_body(c, x, frozen, n0f, d0f, descf), carry, xs
                )[0]

            def _merge_body(carry, s0, newi, newdv, codesf):
                if use_pq_build:
                    n0, d0, desc = carry
                    n0, d0, desc = reverse_merge_chunk_packed(
                        n0, d0, desc, codesf, newi, newdv, s0, B=B
                    )
                    return (n0, d0, desc), None
                n0, d0 = carry
                n0, d0 = reverse_merge_chunk(n0, d0, newi, newdv, s0, B=B)
                return (n0, d0), None

            @functools.partial(jax.jit, donate_argnums=(0,))
            def _run_merge(carry, newi, newdv, codesf, xs):
                return jax.lax.scan(
                    lambda c, x: _merge_body(c, x, newi, newdv, codesf), carry, xs
                )[0]

            def _pref_body(carry, nodes_row, frozen):
                """Partial-refine one batch IN PLACE: search the live carry,
                union with current neighbors (insertion-time links survive),
                re-select, scatter, reverse-merge — the insert body plus the
                union step, so only the scanned rows change."""
                if use_pq_build:
                    n0, d0, desc = carry
                else:
                    (n0, d0), desc = carry, None
                _, ids_d, dists_d = _search_l0(frozen, n0, desc, nodes_row, efC)
                nodes_key = jnp.where(nodes_row >= N, jnp.int32(-2), nodes_row)
                all_ids, all_d = refine_union_candidates(n0, d0, nodes_key, ids_d, dists_d)
                sel, sel_dv = batch_select_from_search(
                    frozen["feats"], all_ids, all_d, M=M, metric=metric,
                    sketch=frozen["sketch"], pool=sel_pool,
                )
                if use_pq_build:
                    n0, d0, desc = scatter_set_rows_packed_d(
                        n0, d0, desc, frozen["codes"], nodes_row, sel, sel_dv
                    )
                    n0, d0, desc = reverse_merge_closest_packed(
                        n0, d0, desc, frozen["codes"], nodes_row, sel, sel_dv
                    )
                    return (n0, d0, desc), None
                n0, d0 = scatter_set_rows_d(n0, d0, nodes_row, sel, sel_dv)
                n0, d0 = reverse_merge_closest(n0, d0, nodes_row, sel, sel_dv)
                return (n0, d0), None

            @functools.partial(jax.jit, donate_argnums=(0,))
            def _run_pref(carry, frozen, xs):
                return jax.lax.scan(lambda c, x: _pref_body(c, x, frozen), carry, xs)[0]

        for it in range(max(0, params.refine_iters)):
            LOGGER.info("hnsw refine pass %d/%d", it + 1, params.refine_iters)
            if use_scan and 0.0 < params.refine_fraction < 1.0:
                # partial refine: earliest-inserted level-0 fraction plus all
                # upper-level points (their L0 rows were built first of all)
                n_part = int(params.refine_fraction * len(l0_pts))
                nodes_sel = np.concatenate(
                    [np.where(levels > 0)[0].astype(np.int32), l0_pts[:n_part]]
                )
                nbp = -(-len(nodes_sel) // B)
                nbp_pad = -(-nbp // SEG) * SEG
                nodes_all = np.full(nbp_pad * B, N, np.int32)
                nodes_all[: len(nodes_sel)] = nodes_sel
                nodes_mat = nodes_all.reshape(nbp_pad, B)
                carry = (dev_n0, dev_d0, nbr_desc) if use_pq_build else (dev_n0, dev_d0)
                t_ref = time.time()
                for s in range(0, nbp_pad, SEG):
                    carry = _run_pref(carry, frozen_common, jnp.asarray(nodes_mat[s : s + SEG]))
                    LOGGER.info(
                        "hnsw partial refine: scanned %d/%d batches (%.1fs)",
                        min(s + SEG, nbp_pad), nbp_pad, time.time() - t_ref,
                    )
                carry = jax.block_until_ready(carry)
                if use_pq_build:
                    dev_n0, dev_d0, nbr_desc = carry
                else:
                    dev_n0, dev_d0 = carry
                continue
            if use_scan:
                # refine as two scans: (a) re-search + re-select every node's
                # forward edges against the FROZEN graph, (b) rebuild L0 and
                # merge reverse edges chunk by chunk.
                nbatch = N_CEIL // B
                nbatch_pad = -(-nbatch // SEG) * SEG
                nodes_all = np.full(nbatch_pad * B, N_CEIL, np.int32)
                nodes_all[:N] = np.arange(N, dtype=np.int32)
                nodes_mat = nodes_all.reshape(nbatch_pad, B)
                carry = (
                    jnp.full((N_CEIL, M), -1, jnp.int32),
                    jnp.full((N_CEIL, M), INF, jnp.float32),
                )
                t_ref = time.time()
                for s in range(0, nbatch_pad, SEG):
                    carry = _run_refine(
                        carry, frozen_common, dev_n0, dev_d0, nbr_desc,
                        jnp.asarray(nodes_mat[s : s + SEG]),
                    )
                    LOGGER.info(
                        "hnsw refine: scanned %d/%d batches (%.1fs)",
                        min(s + SEG, nbatch_pad), nbatch_pad, time.time() - t_ref,
                    )
                new_ids, new_d = jax.block_until_ready(carry)
                dev_n0 = jnp.concatenate(
                    [new_ids[:N], jnp.full((N, maxM0 - M), -1, jnp.int32)], axis=1
                )
                dev_d0 = jnp.concatenate(
                    [new_d[:N], jnp.full((N, maxM0 - M), INF, jnp.float32)], axis=1
                )
                if use_pq_build:
                    nbr_desc = None  # free the stale descriptor array first
                    nbr_desc = pack_rows_codes(codes_d, dev_n0)

                s0s = jnp.arange(0, N_CEIL, B, dtype=jnp.int32)
                carry = (dev_n0, dev_d0, nbr_desc) if use_pq_build else (dev_n0, dev_d0)
                carry = _run_merge(carry, new_ids, new_d, codes_d, s0s)
                if use_pq_build:
                    dev_n0, dev_d0, nbr_desc = carry
                else:
                    dev_n0, dev_d0 = carry
                continue
            if fast:
                new_ids = jnp.full((N_CEIL, M), -1, jnp.int32)
                new_d = jnp.full((N_CEIL, M), INF, jnp.float32)
            else:
                new_fwd = np.full((N, M), -1, np.int32)
            for s0 in range(0, N, B):
                nodes = np.arange(s0, min(s0 + B, N))
                b = len(nodes)
                ids_d, dists_d = search_batch(nodes, entry, efC)
                # drop self-matches, union the node's CURRENT neighbors into
                # the candidate set: insertion-time links (including the
                # long-range ones made while the graph was small) must
                # survive re-selection
                nodes_pad = np.full(B, -2, np.int64)
                nodes_pad[:b] = nodes
                nodes_d = jnp.asarray(nodes_pad)
                if fast:
                    all_ids, all_d = refine_union_candidates(
                        dev_n0, dev_d0, nodes_d, ids_d, dists_d
                    )
                else:
                    self_mask = ids_d == nodes_d[:, None]
                    INF_ = jnp.float32(3.4e38)
                    ids_d = jnp.where(self_mask, -1, ids_d)
                    dists_d = jnp.where(self_mask, INF_, dists_d)
                    safe_nodes = jnp.clip(nodes_d, 0, N - 1)
                    ex = dev_n0[safe_nodes]  # (B, maxM0)
                    Qn = feats_d[safe_nodes]
                    ex_d = jnp.where(ex >= 0, gather_dist(Qn, feats_d, ex, metric), INF_)
                    dup = jnp.any(ex[:, :, None] == ids_d[:, None, :], axis=2)
                    ex_d = jnp.where(dup | (nodes_d[:, None] < 0), INF_, ex_d)
                    ex = jnp.where(dup, -1, ex)
                    all_ids = jnp.concatenate([ids_d, ex], axis=1)
                    all_d = jnp.concatenate([dists_d, ex_d], axis=1)
                    order = jnp.argsort(all_d, axis=1)
                    all_ids = jnp.take_along_axis(all_ids, order, axis=1)
                    all_d = jnp.take_along_axis(all_d, order, axis=1)
                sel, sel_d = batch_select_from_search(
                    feats_d, all_ids, all_d, M=M, metric=metric, sketch=sel_sketch,
                    pool=sel_pool,
                )
                if fast:
                    rows_r = np.full(B, N_CEIL, np.int64)
                    rows_r[:b] = nodes
                    new_ids, new_d = scatter_set_rows_d(
                        new_ids, new_d, jnp.asarray(rows_r), sel, sel_d
                    )
                else:
                    new_fwd[nodes] = np.asarray(sel)[:b]
            # rebuild L0: forward edges, then distance-pruned reverse edges
            if fast:
                dev_n0 = jnp.concatenate(
                    [new_ids[:N], jnp.full((N, maxM0 - M), -1, jnp.int32)], axis=1
                )
                dev_d0 = jnp.concatenate(
                    [new_d[:N], jnp.full((N, maxM0 - M), INF, jnp.float32)], axis=1
                )
                if use_pq_build:
                    nbr_desc = None  # free the old 4-GB-class array first
                    nbr_desc = pack_rows_codes(codes_d, dev_n0)
                for s0 in range(0, N_CEIL, B):
                    s0_dev = jnp.int32(s0)
                    if use_pq_build:
                        dev_n0, dev_d0, nbr_desc = reverse_merge_chunk_packed(
                            dev_n0, dev_d0, nbr_desc, codes_d, new_ids, new_d, s0_dev, B=B
                        )
                    else:
                        dev_n0, dev_d0 = reverse_merge_chunk(
                            dev_n0, dev_d0, new_ids, new_d, s0_dev, B=B
                        )
            else:
                n0_host = np.full((N, maxM0), -1, np.int32)
                n0_host[:, :M] = new_fwd
                dev_n0 = jnp.asarray(n0_host)
                if use_pq_build:
                    nbr_desc = pack_rows_codes(codes_d, dev_n0)
                valid = new_fwd >= 0
                dst = new_fwd[valid].astype(np.int64)
                src = np.repeat(np.arange(N, dtype=np.int64), valid.sum(axis=1))
                dev_n0, nbr_desc = apply_reverse(
                    dev_n0, nbr_desc, dst, src, params.reverse_alg4
                )

        neighbors0 = np.asarray(dev_n0)
        uppers = (
            np.stack([np.asarray(u) for u in dev_up])
            if max_level
            else np.zeros((0, N, maxM), np.int32)
        )
        model = cls(
            feats,
            neighbors0,
            uppers,
            levels,
            entry,
            metric,
            pred_params=pred_params,
        )
        return model

    # -- predict ------------------------------------------------------------------
    def predict(
        self, X, pred_params=None, ret_csr: bool = False, **kwargs
    ):
        params = self.get_pred_params() if pred_params is None else self.PredParams.from_dict(pred_params)
        params.override_with_kwargs(kwargs)
        efS, topk = params.efS, params.topk
        g0, uppers = self._device()
        sparse_graph = isinstance(g0.feats, SparseFeats)
        if sparse_graph:
            Q = X.tocsr().astype(np.float32) if smat.issparse(X) else smat.csr_matrix(
                np.asarray(X, np.float32)
            )
        else:
            Q = np.asarray(X.todense(), np.float32) if smat.issparse(X) else np.asarray(X, np.float32)
        NQ = Q.shape[0]
        chunk = max(1, params.batch_size)
        ids = np.empty((NQ, topk), np.int32)
        dists = np.empty((NQ, topk), np.float32)
        for s in range(0, NQ, chunk):
            Qc = Q[s : s + chunk]
            pad = chunk - Qc.shape[0] if NQ > chunk else 0
            if sparse_graph:
                if pad:
                    Qc = smat.vstack(
                        [Qc, smat.csr_matrix((pad, Q.shape[1]), dtype=np.float32)]
                    ).tocsr()
                # fixed row capacity across chunks -> one compiled search
                qcap = 32 * (-(-int(max(np.diff(Q.tocsr().indptr).max(), 1)) // 32))
                sf = build_sparse_feats(Qc, cap=qcap)
                Qd = SparseBlock(sf.ids, sf.vals, sf.sq)
                nrows = Qc.shape[0]
            else:
                if pad:
                    Qc = np.vstack([Qc, np.zeros((pad, Q.shape[1]), np.float32)])
                Qd = jnp.asarray(Qc)
                nrows = Qc.shape[0]
            cur = jnp.full((nrows,), self.entry_point, jnp.int32)
            if uppers:
                cur = batch_greedy_descent_multi(
                    g0.feats,
                    tuple(uppers[l - 1].neighbors for l in range(len(uppers), 0, -1)),
                    Qd,
                    cur,
                    metric=self.metric,
                    max_steps=64,
                )
            ids_c, dists_c = batch_search_level(
                g0, Qd, cur[:, None], ef=max(efS, topk), max_steps=4 * max(efS, topk)
            )
            n = min(chunk, NQ - s)
            ids[s : s + n] = np.asarray(ids_c)[:n, :topk]
            dists[s : s + n] = np.asarray(dists_c)[:n, :topk]
        if ret_csr:
            return smat_util.csr_from_topk_arrays(
                ids.astype(np.int64), -dists.astype(np.float32), self.feats.shape[0]
            )
        return ids, dists

    def get_pred_params(self):
        import copy

        return copy.deepcopy(self.pred_params)

    # -- persistence ---------------------------------------------------------------
    def save(self, folder: str):
        os.makedirs(folder, exist_ok=True)
        param = self.append_meta(
            {
                "model": type(self).__name__,
                "metric": self.metric,
                "entry_point": self.entry_point,
                "pred_kwargs": self.pred_params.to_dict(),
            }
        )
        param["sparse_feats"] = bool(smat.issparse(self.feats))
        with open(os.path.join(folder, "param.json"), "w") as f:
            json.dump(param, f, indent=True)
        if smat.issparse(self.feats):
            smat_util.save_matrix(os.path.join(folder, "feats.npz"), self.feats)
            np.savez(
                os.path.join(folder, "graph.npz"),
                neighbors0=self.neighbors0,
                upper_neighbors=self.upper_neighbors,
                node_levels=self.node_levels,
            )
        else:
            np.savez(
                os.path.join(folder, "graph.npz"),
                feats=self.feats,
                neighbors0=self.neighbors0,
                upper_neighbors=self.upper_neighbors,
                node_levels=self.node_levels,
            )

    @classmethod
    def load(cls, folder: str) -> "HNSW":
        with open(os.path.join(folder, "param.json")) as f:
            param = json.load(f)
        z = np.load(os.path.join(folder, "graph.npz"))
        if param.get("sparse_feats"):
            feats = smat_util.load_matrix(os.path.join(folder, "feats.npz")).tocsr()
        else:
            feats = z["feats"]
        return cls(
            feats,
            z["neighbors0"],
            z["upper_neighbors"],
            z["node_levels"],
            param["entry_point"],
            param["metric"],
            pred_params={
                k: v
                for k, v in param.get("pred_kwargs", {}).items()
                if k in ("efS", "topk", "threads")
            },
        )


class HNSWProductQuantizer4Bits(pecos_tpu.BaseClass):
    """HNSW with PQ4-quantized level-0 scoring + exact rerank.

    Reference: pecos/core/ann/hnsw.hpp:976-1335 — train a plain HNSW, quantize
    L0 features (16 centroids/subspace, 4 bits/code), search with the
    per-query LUT, rerank the top num_rerank exactly (:1239-1258).  The
    reference supports dense-L2 only (:1000-1003); the TPU LUT gather is
    metric-agnostic so ip is supported too.
    """

    @dc.dataclass
    class TrainParams(pecos_tpu.BaseParams):
        hnsw_params: Optional["HNSW.TrainParams"] = None
        num_subspaces: int = 64
        kmeans_iters: int = 10
        seed: int = 0

    @dc.dataclass
    class PredParams(pecos_tpu.BaseParams):
        efS: int = 100
        topk: int = 10
        num_rerank: int = 100
        threads: int = -1
        batch_size: int = 2048  # queries per device dispatch (see HNSW)
        # packed neighbor descriptors: one row gather per popped node scores
        # all M neighbors (graph.pack_neighbor_codes).  "auto" packs when the
        # (N, M, S) uint8 array fits the HBM budget; costs N*M*S bytes.
        packed: str = "auto"  # "auto" | "true" | "false"

    PACKED_HBM_BUDGET = 6 << 30  # bytes of HBM the packed array may claim

    def __init__(self, hnsw: HNSW, pq, pred_params=None):
        self.hnsw = hnsw
        self.pq = pq
        self.pred_params = self.PredParams.from_dict(pred_params)
        self._codes_d = None
        self._nbr_codes_d = None

    @classmethod
    def train(cls, X, train_params=None, pred_params=None, **kwargs) -> "HNSWProductQuantizer4Bits":
        from .pq import train_pq4

        params = cls.TrainParams.from_dict(train_params)
        params.override_with_kwargs(kwargs)
        hp = HNSW.TrainParams.from_dict(params.hnsw_params)
        hp.data_type = "drm"  # PQ codes quantize dense rows (reference: dense-L2 only)
        hnsw = HNSW.train(X, train_params=hp)
        pq = train_pq4(
            hnsw.feats,
            num_subspaces=params.num_subspaces,
            iters=params.kmeans_iters,
            seed=params.seed,
        )
        return cls(hnsw, pq, pred_params=pred_params)

    @classmethod
    def from_hnsw(
        cls,
        hnsw: HNSW,
        *,
        num_subspaces: int = 64,
        kmeans_iters: int = 10,
        seed: int = 0,
        pred_params=None,
    ) -> "HNSWProductQuantizer4Bits":
        """Quantize an ALREADY-BUILT graph: reuses the (expensive) HNSW build
        and only trains the PQ codebooks + codes on its features.  The
        reference has no equivalent (its PQ4 variant always rebuilds,
        hnsw.hpp:976-1035) — on TPU the graph build dominates wall-clock, so
        grafting PQ onto an existing index is the natural workflow."""
        import scipy.sparse as _smat

        from .pq import train_pq4

        if _smat.issparse(hnsw.feats):
            raise ValueError("PQ4 quantization requires dense features (data_type='drm')")
        pq = train_pq4(hnsw.feats, num_subspaces=num_subspaces, iters=kmeans_iters, seed=seed)
        return cls(hnsw, pq, pred_params=pred_params)

    def predict(self, X, pred_params=None, **kwargs):
        from .graph import (
            batch_greedy_descent,
            batch_search_level_pq,
            batch_search_level_pq_packed,
            pack_neighbor_codes,
        )
        from .pq import build_lut

        params = self.get_pred_params() if pred_params is None else self.PredParams.from_dict(pred_params)
        params.override_with_kwargs(kwargs)
        Q = np.asarray(X.todense(), np.float32) if smat.issparse(X) else np.asarray(X, np.float32)
        NQ = Q.shape[0]
        g0, uppers = self.hnsw._device()
        if self._codes_d is None:
            self._codes_d = jnp.asarray(self.pq.codes)
        N, M = g0.neighbors.shape
        S = self.pq.codes.shape[1]
        use_packed = params.packed == "true" or (
            params.packed == "auto" and N * M * S <= self.PACKED_HBM_BUDGET
        )
        if use_packed and self._nbr_codes_d is None:
            self._nbr_codes_d = pack_neighbor_codes(g0.neighbors, self._codes_d)
        from .graph import gather_dist

        chunk = max(1, params.batch_size)
        topk = params.topk
        out_ids = np.empty((NQ, topk), np.int32)
        out_d = np.empty((NQ, topk), np.float32)
        for s in range(0, NQ, chunk):
            Qc = Q[s : s + chunk]
            pad = chunk - Qc.shape[0] if NQ > chunk else 0
            if pad:
                Qc = np.vstack([Qc, np.zeros((pad, Q.shape[1]), np.float32)])
            Qd = jnp.asarray(Qc)
            cur = jnp.full((Qc.shape[0],), self.hnsw.entry_point, jnp.int32)
            if uppers:
                from .graph import batch_greedy_descent_multi

                cur = batch_greedy_descent_multi(
                    g0.feats,
                    tuple(uppers[l - 1].neighbors for l in range(len(uppers), 0, -1)),
                    Qd,
                    cur,
                    metric=self.hnsw.metric,
                    max_steps=64,
                )
            lut = jnp.asarray(build_lut(self.pq, Qc, self.hnsw.metric))
            ef = max(params.efS, params.num_rerank, topk)
            if use_packed:
                ids, _ = batch_search_level_pq_packed(
                    self._codes_d,
                    g0.neighbors,
                    self._nbr_codes_d,
                    lut,
                    cur[:, None],
                    ef=ef,
                    max_steps=4 * ef,
                )
            else:
                ids, _ = batch_search_level_pq(
                    self._codes_d,
                    g0.neighbors,
                    lut,
                    cur[:, None],
                    ef=ef,
                    max_steps=4 * ef,
                )
            # exact rerank of the top num_rerank (hnsw.hpp:1239-1258)
            top = ids[:, : params.num_rerank]
            exact = gather_dist(
                Qd, g0.feats, jnp.clip(top, 0, g0.feats.shape[0] - 1), self.hnsw.metric
            )
            exact = jnp.where(top >= 0, exact, jnp.float32(3.4e38))
            neg_top, pos = jax.lax.top_k(-exact, min(topk, exact.shape[1]))
            n = min(chunk, NQ - s)
            out_ids[s : s + n] = np.asarray(jnp.take_along_axis(top, pos, axis=1))[:n]
            out_d[s : s + n] = np.asarray(-neg_top)[:n]
        return out_ids, out_d

    def get_pred_params(self):
        import copy

        return copy.deepcopy(self.pred_params)

    def save(self, folder: str):
        os.makedirs(folder, exist_ok=True)
        self.hnsw.save(os.path.join(folder, "hnsw"))
        np.savez(
            os.path.join(folder, "pq.npz"),
            codebooks=self.pq.codebooks,
            codes=self.pq.codes,
            dim=np.int64(self.pq.dim),
        )
        with open(os.path.join(folder, "param.json"), "w") as f:
            json.dump(self.append_meta({"pred_kwargs": self.pred_params.to_dict()}), f)

    @classmethod
    def load(cls, folder: str) -> "HNSWProductQuantizer4Bits":
        from .pq import ProductQuantizer4Bits

        hnsw = HNSW.load(os.path.join(folder, "hnsw"))
        z = np.load(os.path.join(folder, "pq.npz"))
        pq = ProductQuantizer4Bits(
            codebooks=z["codebooks"], codes=z["codes"], dim=int(z["dim"])
        )
        with open(os.path.join(folder, "param.json")) as f:
            param = json.load(f)
        return cls(
            hnsw,
            pq,
            pred_params={
                k: v
                for k, v in param.get("pred_kwargs", {}).items()
                if k in ("efS", "topk", "num_rerank", "threads", "packed")
            },
        )
