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
