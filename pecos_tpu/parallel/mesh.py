"""Mesh construction and sharded training/inference steps.

XR-Linear's scale axes (SURVEY.md §2.3):
- ``dp``: instances (rows of X) — data parallel; gradient contractions
  (X^T g) psum over this axis, inserted automatically by XLA from shardings.
- ``lp``: labels (columns of Y/W) — the label-model-parallel axis, the analog
  of the reference's sub-tree model parallelism
  (pecos/distributed/xmc/xlinear/model.py:259-617). Label blocks are
  embarrassingly parallel in training; beams all-gather over it at predict.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as smat
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pecos_tpu.xmc import solvers


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None) -> Mesh:
    """Build a (dp, lp) mesh over the first n_devices.

    dp defaults to the largest power-of-two <= sqrt(n) so both axes scale.
    """
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if dp is None:
        dp = 1
        while dp * dp * 2 <= n:
            dp *= 2
    lp = n // dp
    mesh_devices = np.asarray(devices[: dp * lp]).reshape(dp, lp)
    return Mesh(mesh_devices, axis_names=("dp", "lp"))


def shard_opt_state(opt_state, mesh: Mesh):
    """ZeRO-analog (stage-1) optimizer-state sharding over the whole mesh.

    Every array leaf of the optimizer state (AdamW mu/nu moments, MultiSteps
    accumulators, ...) is sharded along its first axis divisible by the mesh
    size; params stay replicated.  This is the role DeepSpeed ZeRO-1 plays in
    the reference's distributed encoder fine-tune
    (pecos/distributed/xmc/xtransformer/dist_trainer.py:163, module.py:139+):
    per-device optimizer memory drops ~n_devices x while updates stay
    bit-identical (the elementwise moment update never crosses the shard
    boundary, so XLA keeps the sharding through the jitted train step).

    Returns (sharded_state, n_sharded_leaves).
    """
    mesh_axes = tuple(mesh.shape.keys())
    n_dev = int(np.prod(list(mesh.shape.values())))
    count = 0

    def shard_leaf(leaf):
        nonlocal count
        if not hasattr(leaf, "shape") or getattr(leaf, "ndim", 0) == 0:
            return leaf
        for ax in range(leaf.ndim):
            if leaf.shape[ax] % n_dev == 0 and leaf.shape[ax] >= n_dev:
                spec = [None] * leaf.ndim
                spec[ax] = mesh_axes
                count += 1
                return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))
        return leaf

    return jax.tree_util.tree_map(shard_leaf, opt_state), count


def shard_solve_block(
    mesh: Mesh,
    X: np.ndarray,  # (N, D) — N divisible by dp
    y: np.ndarray,  # (N, Lb) — Lb divisible by lp
    c: np.ndarray,  # (N, Lb)
    *,
    loss: str = "sqhinge",
    eps: float = 0.01,
    max_newton: int = 20,
    cg_max: int = 10,
) -> jax.Array:
    """One full sharded training step: the batched Newton-CG solve with X
    sharded over dp, labels sharded over lp, W replicated over dp and sharded
    over lp.  XLA inserts the psum for the X^T contractions across dp."""
    x_sh = NamedSharding(mesh, P("dp", None))
    yl_sh = NamedSharding(mesh, P("dp", "lp"))
    w_sh = NamedSharding(mesh, P(None, "lp"))

    Xd = jax.device_put(jnp.asarray(X, jnp.float32), x_sh)
    yd = jax.device_put(jnp.asarray(y, jnp.float32), yl_sh)
    cd = jax.device_put(jnp.asarray(c, jnp.float32), yl_sh)

    fn = jax.jit(
        lambda X_, y_, c_: solvers.solve_block(
            X_, y_, c_, loss=loss, eps=eps, max_newton=max_newton, cg_max=cg_max
        ),
        out_shardings=w_sh,
    )
    return fn(Xd, yd, cd)


def shard_chain_predict(mesh: Mesh, compiled, X: np.ndarray, **kwargs):
    """Data-parallel beam-search predict: queries sharded over every mesh axis.

    The model (weights + children tables) is replicated; each device walks the
    tree for its query shard — the TPU analog of the reference's
    thread-per-query OMP fan-out (libpecos.cpp:526-553).
    """
    from pecos_tpu.xmc.inference import chain_predict, prepare_queries

    q_sh = NamedSharding(mesh, P(("dp", "lp"), None))
    Xd = jax.device_put(jnp.asarray(prepare_queries(X, compiled.bias)), q_sh)
    beam = kwargs.get("beam_size", 10)
    topk = kwargs.get("only_topk", 20)
    pps = tuple([kwargs.get("post_processor", "l3-hinge")] * compiled.depth)
    fn = jax.jit(lambda X_, layers: chain_predict(X_, layers, beam, topk, pps))
    return fn(Xd, compiled.layers)


def _pad_layer_labels(layer, lp: int):
    """Pad a DeviceLayer's label dimension to a multiple of lp so the weight
    arrays divide evenly over the label-parallel axis.  The children table is
    untouched (it only ever names real labels), so padded labels are never
    candidates and contribute nothing."""
    from pecos_tpu.xmc.inference import DeviceLayer

    L = layer.nr_labels
    Lp = -(-L // lp) * lp
    pad = Lp - L
    if layer.kind == "dense":
        if pad == 0:
            return DeviceLayer("dense", L, layer.children, W=layer.W)
        W = jnp.pad(layer.W, ((0, 0), (0, pad)))
        return DeviceLayer("dense", L, layer.children, W=W)
    # normalize plabel to packed-only so the leaf structure is fixed
    packed = layer.packed
    if packed is None:
        packed = jnp.concatenate(
            [layer.feat_ids, jax.lax.bitcast_convert_type(layer.feat_vals, jnp.int32)],
            axis=1,
        )
    if pad:
        packed = jnp.pad(packed, ((0, pad), (0, 0)))
    return DeviceLayer("plabel", L, layer.children, packed=packed)


def _pad_layer_parents(layer, lp: int):
    """Pad a plabel DeviceLayer's parent-packed table to a multiple of lp
    parents so it divides over the label-parallel axis.  Sharding by PARENT
    block (each device owns every child of its parents) is what lets the
    sharded predictor reuse the parent-packed gather-free intersection
    scoring — one gathered row per beam parent covers all its children's
    weights (see inference.score_candidates_sparse_parents).  Padded parents
    are never beam candidates (the children table is untouched)."""
    from pecos_tpu.xmc.inference import DeviceLayer, build_parent_packed

    pp = layer.parent_packed
    if pp is None:
        packed = layer.packed
        if packed is None:
            packed = jnp.concatenate(
                [
                    layer.feat_ids,
                    jax.lax.bitcast_convert_type(layer.feat_vals, jnp.int32),
                ],
                axis=1,
            )
        pp = jnp.asarray(
            build_parent_packed(np.asarray(packed), np.asarray(layer.children))
        )
    n_par = pp.shape[0]
    pad = (-n_par) % lp
    if pad:
        pp = jnp.pad(pp, ((0, pad), (0, 0), (0, 0)))
    return DeviceLayer(
        "plabel", layer.nr_labels, layer.children, parent_packed=pp
    )


def shard_chain_predict_labels_sparse(
    mesh: Mesh,
    compiled,
    X,
    *,
    beam_size: int = 10,
    only_topk: int = 20,
    post_processor: str = "l3-hinge",
):
    """Label-sharded (model-parallel) beam search on the SPARSE query engine.

    The sharded counterpart of CompiledHierModel's fast sparse path — the
    one that produces the headline QPS: queries travel as padded (ids, vals)
    pairs (never densified for plabel layers), plabel layers score with the
    parent-packed broadcast-intersection kernel (gather-free,
    inference._intersect_scores), and dense layers score via the W-row
    gather.  Sharding:

    - dense layers: ``W`` as ``P(None, "lp")`` — label-column blocks.
    - plabel layers: ``parent_packed`` as ``P("lp", None, None)`` — PARENT
      blocks, so each device owns all children of its parents and one
      gathered row per owned beam parent scores all of them.
    - queries: ``P("dp", None)``, replicated over lp.

    Per level one ``lax.pmax`` over lp (the beam-score all-gather, riding
    ICI) reassembles full candidate scores; top-k runs replicated.
    Reference analog: pecos/distributed/xmc/xlinear/model.py:259-617.
    """
    from pecos_tpu.xmc.inference import (
        NEG_INF,
        _intersect_scores,
        prepare_queries_padded,
    )
    from pecos_tpu.xmc.postprocessor import PostProcessor

    lp = mesh.shape["lp"]
    dp = mesh.shape["dp"]
    depth = compiled.depth
    D = compiled.nr_features
    bias = compiled.bias
    bias_id = D if bias > 0 else None
    pp_names = (
        tuple([post_processor] * depth)
        if isinstance(post_processor, str)
        else tuple(post_processor)
    )
    layers = [
        _pad_layer_labels(l, lp) if l.kind == "dense" else _pad_layer_parents(l, lp)
        for l in compiled.layers
    ]
    leaves, treedef = jax.tree_util.tree_flatten(layers)
    specs = []
    for layer in layers:
        specs.append(P(None, None))  # children: replicated
        if layer.kind == "dense":
            specs.append(P(None, "lp"))  # W columns = labels
        else:
            specs.append(P("lp", None, None))  # parent_packed rows = parents
    assert len(specs) == len(leaves)

    ids_np, vals_np = prepare_queries_padded(X.tocsr() if smat.issparse(X) else X)
    if ids_np.shape[0] % dp:
        raise ValueError(f"batch {ids_np.shape[0]} not divisible by dp={dp}")

    def local_chain(qids, qvals, *leaves):
        layers = jax.tree_util.tree_unflatten(treedef, leaves)
        N = qids.shape[0]
        lp_idx = jax.lax.axis_index("lp")
        n_roots = layers[0].children.shape[0]
        parents = jnp.tile(jnp.arange(n_roots, dtype=jnp.int32), (N, 1))
        pvals = jnp.full(
            (N, n_roots), PostProcessor.get(pp_names[0]).init_value, jnp.float32
        )
        for d, layer in enumerate(layers):
            pp = PostProcessor.get(pp_names[d])
            maxc = layer.max_children
            B = parents.shape[1]
            safe_parents = jnp.clip(parents, 0, layer.children.shape[0] - 1)
            cand = layer.children[safe_parents].reshape(N, B * maxc)
            valid = (cand >= 0) & (parents >= 0).repeat(maxc, axis=1)
            if layer.kind == "dense":
                # local label block scored straight from sparse queries:
                # one W-row gather + contraction (score_candidates_dense_sparse)
                W = layer.W  # (D+1, Lb) local block
                Lb = W.shape[1]
                Wg = W[jnp.clip(qids, 0, W.shape[0] - 1)]  # (N, Qn, Lb)
                scores_all = jnp.einsum(
                    "bql,bq->bl", Wg, qvals, preferred_element_type=jnp.float32
                )
                if bias_id is not None:
                    scores_all = scores_all + jnp.float32(bias) * W[bias_id]
                local = cand - lp_idx * Lb
                own = (local >= 0) & (local < Lb)
                raw = jnp.take_along_axis(
                    scores_all, jnp.clip(local, 0, Lb - 1), axis=1
                )
            else:
                # parent-block ownership: one gathered parent-packed row per
                # owned beam parent scores all its children via the
                # broadcast-intersection kernel (no dense query, no gathers)
                ppk = layer.parent_packed  # (Pb, maxc, 2P) local block
                Pb = ppk.shape[0]
                twoP = ppk.shape[2]
                Pcap = twoP // 2
                local_p = safe_parents - lp_idx * Pb
                own_p = (local_p >= 0) & (local_p < Pb)
                safe_l = jnp.clip(local_p, 0, Pb - 1)
                w = ppk[safe_l].reshape(N, B * maxc, twoP)
                K = B * maxc
                pad_k = (-K) % 8
                if pad_k:
                    w = jnp.concatenate(
                        [w, jnp.zeros((N, pad_k, twoP), w.dtype)], axis=1
                    )
                wi = w[..., :Pcap]
                wv = jax.lax.bitcast_convert_type(w[..., Pcap:], jnp.float32)
                raw = _intersect_scores(
                    qids, qvals, wi, wv, 8, bias_id, jnp.float32(bias)
                )[:, :K]
                own = own_p.repeat(maxc, axis=1)
            raw = jax.lax.pmax(jnp.where(own, raw, NEG_INF), "lp")
            val = pp.transform_jnp(raw)
            if d > 0:
                val = pp.combiner_jnp(val, pvals.repeat(maxc, axis=1))
            val = jnp.where(valid, val, NEG_INF)
            k = min(only_topk if d == depth - 1 else beam_size, B * maxc)
            topv, topi = jax.lax.top_k(val, k)
            parents = jnp.take_along_axis(cand, topi, axis=1)
            parents = jnp.where(topv > NEG_INF * 0.5, parents, -1)
            pvals = topv
        return parents, pvals

    fn = jax.jit(
        jax.shard_map(
            local_chain,
            mesh=mesh,
            in_specs=tuple([P("dp", None), P("dp", None)] + specs),
            out_specs=(P("dp", None), P("dp", None)),
            check_vma=False,
        )
    )
    return fn(jnp.asarray(ids_np), jnp.asarray(vals_np), *leaves)


def predict_sharded(
    mesh: Mesh,
    compiled,
    X,
    *,
    beam_size: int = 10,
    only_topk: int = 20,
    post_processor: str = "l3-hinge",
):
    """User-facing label-sharded predict: any X (sparse/dense) -> top-k CSR.

    Routes sparse queries through the sparse sharded engine (parent-packed
    intersection scoring) and dense queries through the dense one; pads the
    query count to a multiple of dp.  This is what
    ``XLinearModel.predict(..., mesh=...)`` calls."""
    from pecos_tpu.utils import smat_util
    from pecos_tpu.xmc.inference import CompiledHierModel

    if hasattr(compiled, "_get_compiled"):
        compiled = compiled._get_compiled()
    assert isinstance(compiled, CompiledHierModel)
    dp = mesh.shape["dp"]
    N = X.shape[0]
    pad = (-N) % dp
    if pad:
        if smat.issparse(X):
            Xp = smat.vstack(
                [X.tocsr(), smat.csr_matrix((pad, X.shape[1]), dtype=X.dtype)]
            ).tocsr()
        else:
            Xp = np.vstack([X, np.zeros((pad, X.shape[1]), X.dtype)])
    else:
        Xp = X
    fn = shard_chain_predict_labels_sparse if smat.issparse(Xp) else (
        lambda *a, **k: shard_chain_predict_labels(*a, **k)
    )
    labels, vals = fn(
        mesh,
        compiled,
        Xp,
        beam_size=beam_size,
        only_topk=only_topk,
        post_processor=post_processor,
    )
    labels = np.asarray(labels)[:N]
    vals = np.asarray(vals)[:N]
    return smat_util.csr_from_topk_arrays(labels, vals, compiled.nr_labels)


def shard_chain_predict_labels(
    mesh: Mesh,
    compiled,
    X: np.ndarray,
    *,
    beam_size: int = 10,
    only_topk: int = 20,
    post_processor: str = "l3-hinge",
):
    """Label-sharded (model-parallel) beam-search predict.

    The TPU analog of the reference's sub-tree model parallelism
    (pecos/distributed/xmc/xlinear/model.py:259-617): every layer's weights
    are sharded over the ``lp`` mesh axis by label block — ``W`` as
    ``P(None, "lp")`` for dense layers, padded-label rows as ``P("lp", None)``
    for plabel layers — so each device holds only ``1/lp`` of the model and a
    chain too big for one chip's HBM fits the mesh.  Queries shard over
    ``dp`` and replicate over ``lp``.

    Per level, each device scores the beam candidates whose labels fall in
    its block (everything else is -inf) and a single ``lax.pmax`` over
    ``lp`` — the beam-score all-gather, riding ICI — reassembles the full
    candidate scores; top-k then runs replicated on every device.  The
    per-level collective moves only (batch, beam*max_children) floats, never
    weights.
    """
    from pecos_tpu.xmc.inference import NEG_INF, prepare_queries
    from pecos_tpu.xmc.postprocessor import PostProcessor

    lp = mesh.shape["lp"]
    dp = mesh.shape["dp"]
    depth = compiled.depth
    pp_names = (
        tuple([post_processor] * depth)
        if isinstance(post_processor, str)
        else tuple(post_processor)
    )
    layers = [_pad_layer_labels(l, lp) for l in compiled.layers]
    leaves, treedef = jax.tree_util.tree_flatten(layers)
    specs = []
    for layer in layers:
        specs.append(P(None, None))  # children: replicated
        if layer.kind == "dense":
            specs.append(P(None, "lp"))  # W columns = labels
        else:
            specs.append(P("lp", None))  # packed rows = labels
    assert len(specs) == len(leaves)

    Xd = prepare_queries(X, compiled.bias)
    if Xd.shape[0] % dp:
        raise ValueError(f"batch {Xd.shape[0]} not divisible by dp={dp}")

    def local_chain(Xq, *leaves):
        layers = jax.tree_util.tree_unflatten(treedef, leaves)
        N = Xq.shape[0]
        lp_idx = jax.lax.axis_index("lp")
        n_roots = layers[0].children.shape[0]
        parents = jnp.tile(jnp.arange(n_roots, dtype=jnp.int32), (N, 1))
        pvals = jnp.full(
            (N, n_roots), PostProcessor.get(pp_names[0]).init_value, jnp.float32
        )
        for d, layer in enumerate(layers):
            pp = PostProcessor.get(pp_names[d])
            maxc = layer.max_children
            B = parents.shape[1]
            safe_parents = jnp.clip(parents, 0, layer.children.shape[0] - 1)
            cand = layer.children[safe_parents].reshape(N, B * maxc)
            valid = (cand >= 0) & (parents >= 0).repeat(maxc, axis=1)
            # ownership: device b holds labels [b*Lb, (b+1)*Lb)
            Lb = layer.W.shape[1] if layer.kind == "dense" else layer.packed.shape[0]
            offset = lp_idx * Lb
            local = cand - offset
            own = (local >= 0) & (local < Lb)
            safe = jnp.clip(local, 0, Lb - 1)
            if layer.kind == "dense":
                scores_all = jnp.dot(Xq, layer.W, preferred_element_type=jnp.float32)
                raw = jnp.take_along_axis(scores_all, safe, axis=1)
            else:
                Pcap = layer.packed.shape[1] // 2
                w = layer.packed[safe]  # (N, K, 2P)
                ids = w[..., :Pcap]
                vals = jax.lax.bitcast_convert_type(w[..., Pcap:], jnp.float32)
                xg = jnp.take_along_axis(Xq[:, None, :], ids, axis=2)
                raw = jnp.sum(xg * vals, axis=-1)
            raw = jax.lax.pmax(jnp.where(own, raw, NEG_INF), "lp")
            val = pp.transform_jnp(raw)
            if d > 0:
                val = pp.combiner_jnp(val, pvals.repeat(maxc, axis=1))
            val = jnp.where(valid, val, NEG_INF)
            k = min(only_topk if d == depth - 1 else beam_size, B * maxc)
            topv, topi = jax.lax.top_k(val, k)
            parents = jnp.take_along_axis(cand, topi, axis=1)
            parents = jnp.where(topv > NEG_INF * 0.5, parents, -1)
            pvals = topv
        return parents, pvals

    fn = jax.jit(
        jax.shard_map(
            local_chain,
            mesh=mesh,
            in_specs=tuple([P("dp", None)] + specs),
            out_specs=(P("dp", None), P("dp", None)),
            check_vma=False,
        )
    )
    return fn(jnp.asarray(Xd), *leaves)
