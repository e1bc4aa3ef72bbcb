"""Label-sharded (model-parallel) inference over the device mesh.

Asserts the sharded beam search (weights P(None, "lp") / P("lp", None),
per-level beam-score all-gather) returns exactly the replicated predictor's
output on an 8-virtual-device CPU mesh.  Reference analog: sub-tree model
parallelism in pecos/distributed/xmc/xlinear/model.py:259-617.
"""

import jax
import numpy as np
import pytest
import scipy.sparse as smat

from pecos_tpu.parallel.mesh import (
    make_mesh,
    shard_chain_predict,
    shard_chain_predict_labels,
)
from pecos_tpu.xmc.base import HierarchicalMLModel, MLModel


def _toy_model(L0=8, L1=64, L2=498, D=32, seed=0, nnz_per_col=8):
    rng = np.random.default_rng(seed)

    def rand_csc(rows, cols):
        r = np.concatenate(
            [rng.choice(rows, size=nnz_per_col, replace=False) for _ in range(cols)]
        )
        c = np.repeat(np.arange(cols), nnz_per_col)
        v = rng.standard_normal(len(r)).astype(np.float32)
        return smat.csc_matrix((v, (r, c)), shape=(rows, cols))

    def chain_csc(children, parents):
        rows = np.arange(children)
        cols = rows * parents // children
        return smat.csc_matrix(
            (np.ones(children, np.float32), (rows, cols)), shape=(children, parents)
        )

    Db = D + 1
    chain = [
        MLModel(W=rand_csc(Db, L0), C=chain_csc(L0, 1), bias=1.0),
        MLModel(W=rand_csc(Db, L1), C=chain_csc(L1, L0), bias=1.0),
        MLModel(W=rand_csc(Db, L2), C=chain_csc(L2, L1), bias=1.0),
    ]
    model = HierarchicalMLModel(chain)
    X = rng.standard_normal((32, D)).astype(np.float32)
    return model, X


@pytest.mark.parametrize("force_plabel", [False, True])
def test_label_sharded_predict_matches_replicated(force_plabel):
    mesh = make_mesh(8)
    assert mesh.shape["lp"] >= 2
    model, X = _toy_model()
    if force_plabel:
        # exercise the padded-label-row (plabel) branch on the bottom layer
        from pecos_tpu.xmc.inference import CompiledHierModel

        Ws = [m.W for m in model.model_chain]
        Cs = [m.C for m in model.model_chain]
        compiled = CompiledHierModel.from_host_chain(
            Ws, Cs, bias=1.0, layouts=["dense", "dense", "plabel"]
        )
    else:
        compiled = model._get_compiled()

    ref_labels, ref_vals = shard_chain_predict(
        mesh, compiled, X, beam_size=4, only_topk=5
    )
    labels, vals = shard_chain_predict_labels(
        mesh, compiled, X, beam_size=4, only_topk=5
    )
    # L2=498 is not divisible by lp=4 -> exercises label padding
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(ref_labels))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5)


def test_label_sharded_placement():
    """The weights must actually be sharded over lp, not replicated."""
    mesh = make_mesh(8)
    model, X = _toy_model()
    compiled = model._get_compiled()
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pecos_tpu.parallel.mesh import _pad_layer_labels

    lp = mesh.shape["lp"]
    layer = _pad_layer_labels(compiled.layers[-1], lp)
    sharded_W = jax.device_put(layer.W, NamedSharding(mesh, P(None, "lp")))
    shard_shapes = {s.data.shape for s in sharded_W.addressable_shards}
    assert shard_shapes == {(layer.W.shape[0], layer.W.shape[1] // lp)}


def _sparse_queries(N, D, nnz, seed=3):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(N), nnz)
    cols = np.concatenate(
        [rng.choice(D, size=nnz, replace=False) for _ in range(N)]
    )
    vals = rng.standard_normal(N * nnz).astype(np.float32)
    return smat.csr_matrix((vals, (rows, cols)), shape=(N, D))


def test_label_sharded_sparse_matches_single_chip():
    """The sparse sharded engine (parent-packed intersection scoring, weights
    sharded by parent block over lp) must reproduce the single-chip sparse
    predictor's CSR output exactly (same labels, values to fp tolerance)."""
    from pecos_tpu.parallel.mesh import predict_sharded
    from pecos_tpu.xmc.inference import CompiledHierModel

    mesh = make_mesh(8)
    assert mesh.shape["lp"] >= 2
    model, _ = _toy_model()
    Ws = [m.W for m in model.model_chain]
    Cs = [m.C for m in model.model_chain]
    # bottom layer plabel: exercises the parent-packed sharded path; the
    # toy L2=498 is not divisible by lp -> exercises parent padding too
    compiled = CompiledHierModel.from_host_chain(
        Ws, Cs, bias=1.0, layouts=["dense", "dense", "plabel"]
    )
    D = compiled.nr_features
    Xq = _sparse_queries(24, D, nnz=6)

    ref = compiled.predict(Xq, beam_size=4, only_topk=5)
    got = predict_sharded(mesh, compiled, Xq, beam_size=4, only_topk=5)
    assert (ref.indices != got.indices).sum() == 0
    np.testing.assert_array_equal(ref.indptr, got.indptr)
    np.testing.assert_allclose(got.data, ref.data, rtol=1e-5, atol=1e-6)


def test_xlinear_predict_mesh_kwarg():
    """XLinearModel.predict(..., mesh=) routes through the label-sharded
    engine and agrees with the default predict."""
    from pecos_tpu.xmc.xlinear.model import XLinearModel

    mesh = make_mesh(8)
    model, X = _toy_model()
    xlm = XLinearModel(model)
    D = X.shape[1]
    Xq = _sparse_queries(16, D, nnz=5)
    ref = xlm.predict(Xq, beam_size=4, only_topk=5)
    got = xlm.predict(Xq, beam_size=4, only_topk=5, mesh=mesh)
    assert (ref.indices != got.indices).sum() == 0
    np.testing.assert_allclose(got.data, ref.data, rtol=1e-5, atol=1e-6)
    # dense queries route through the dense sharded engine
    Xd = np.asarray(Xq.todense())
    got_d = xlm.predict(Xd, beam_size=4, only_topk=5, mesh=mesh)
    assert (ref.indices != got_d.indices).sum() == 0
    np.testing.assert_allclose(got_d.data, ref.data, rtol=1e-4, atol=1e-5)
