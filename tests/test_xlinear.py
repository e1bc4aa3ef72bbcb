"""End-to-end XR-Linear tests: train -> beam-search predict -> metrics.

Follows the reference's consistency idiom (test_xlinear.py:106): the fused
device chain predictor must agree with the independent per-layer loop, for
every post-processor; plus golden-quality checks on synthetic separable data.
"""

import numpy as np
import pytest
import scipy.sparse as smat

from pecos_tpu.utils import smat_util
from pecos_tpu.xmc import Indexer, LabelEmbeddingFactory
from pecos_tpu.xmc.xlinear import XLinearModel


def _synthetic_xmc(n=240, d=16, L=32, seed=0):
    """Separable multi-label data: each label is a Gaussian blob direction."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((L, d)).astype(np.float32) * 3
    X = np.zeros((n, d), np.float32)
    rows, cols = [], []
    for i in range(n):
        l = i % L
        X[i] = centers[l] + rng.standard_normal(d).astype(np.float32) * 0.25
        rows.append(i)
        cols.append(l)
        # occasionally add a second label
        if i % 7 == 0:
            l2 = (l + 1) % L
            rows.append(i)
            cols.append(l2)
    Y = smat.csr_matrix((np.ones(len(rows), np.float32), (rows, cols)), shape=(n, L))
    return smat.csr_matrix(X), Y


@pytest.fixture(scope="module")
def trained():
    X, Y = _synthetic_xmc()
    label_feat = LabelEmbeddingFactory.create(Y, X, method="pifa")
    chain = Indexer.gen(label_feat, max_leaf_size=4, nr_splits=2, seed=7)
    xlm = XLinearModel.train(X, Y, C=chain, threshold=0.0)
    return X, Y, xlm


def test_end_to_end_precision(trained):
    X, Y, xlm = trained
    P = xlm.predict(X, beam_size=8, only_topk=5)
    m = smat_util.Metrics.generate(Y, P, topk=5)
    assert m.prec[0] > 0.9, f"P@1 = {m.prec[0]}"


def test_chain_vs_layer_loop_consistency(trained):
    X, Y, xlm = trained
    for pp in ["l3-hinge", "sigmoid", "log-l3-hinge", "noop"]:
        fused = xlm.predict(X, beam_size=6, only_topk=4, post_processor=pp)
        loop = xlm.model._predict_layer_loop(X, beam_size=6)
        # loop uses per-layer defaults; re-run with uniform override for comparison
        pp_params = xlm.model.get_pred_params()
        for p in pp_params.model_chain:
            p.post_processor = pp
            p.only_topk = 4
        loop = xlm.model._predict_layer_loop(X, pred_params=pp_params, beam_size=6)
        fd = np.asarray(fused.todense())
        ld = np.asarray(loop.todense())
        np.testing.assert_allclose(fd, ld, rtol=2e-4, atol=2e-5, err_msg=f"pp={pp}")


def test_beam_size_one_is_greedy(trained):
    X, Y, xlm = trained
    P = xlm.predict(X, beam_size=1, only_topk=1)
    assert P.nnz == X.shape[0]


def test_save_load_predict_identical(tmp_path, trained):
    X, Y, xlm = trained
    folder = str(tmp_path / "xlm")
    xlm.save(folder)
    loaded = XLinearModel.load(folder)
    P1 = xlm.predict(X, beam_size=4, only_topk=3)
    P2 = loaded.predict(X, beam_size=4, only_topk=3)
    assert (P1 != P2).nnz == 0


def test_matcher_ranker_modes():
    X, Y = _synthetic_xmc(n=120, d=12, L=16, seed=3)
    label_feat = LabelEmbeddingFactory.create(Y, X, method="pifa")
    chain = Indexer.gen(label_feat, max_leaf_size=2, nr_splits=2, seed=1)
    depth = len(chain)
    matcher = XLinearModel.train(X, Y, C=chain, mode="matcher", ranker_level=1, threshold=0.0)
    assert matcher.model.depth == depth - 1
    assert matcher.nr_labels == chain[-2].shape[0]
    ranker = XLinearModel.train(X, Y, C=chain, mode="ranker", ranker_level=1, threshold=0.0)
    assert ranker.model.depth == 1
    assert ranker.nr_labels == Y.shape[1]


def test_ova_single_layer():
    X, Y = _synthetic_xmc(n=80, d=10, L=8, seed=4)
    xlm = XLinearModel.train(X, Y, C=None, threshold=0.0)
    assert xlm.model.depth == 1
    P = xlm.predict(X, only_topk=1)
    truth = np.asarray(Y.argmax(axis=1)).ravel()
    # rows with two labels: accept either
    pred = np.asarray(P.argmax(axis=1)).ravel()
    acc = np.mean([Y[i, pred[i]] > 0 for i in range(X.shape[0])])
    assert acc > 0.9


def test_rel_mode_induce_runs():
    X, Y = _synthetic_xmc(n=60, d=8, L=8, seed=5)
    chain = Indexer.gen(
        LabelEmbeddingFactory.create(Y, X, method="pifa"), max_leaf_size=2, nr_splits=2
    )
    xlm = XLinearModel.train(X, Y, C=chain, rel_mode="induce", rel_norm="l1", threshold=0.0)
    P = xlm.predict(X, only_topk=3)
    assert P.shape == (X.shape[0], Y.shape[1])


def test_hierarchical_add_getitem(trained):
    X, Y, xlm = trained
    hm = xlm.model
    if hm.depth >= 2:
        top = hm[: hm.depth - 1]
        bot = hm[hm.depth - 1 :]
        combo = top + bot
        assert combo.depth == hm.depth
        P1 = hm.predict(X, beam_size=4)
        P2 = combo.predict(X, beam_size=4)
        assert (P1 != P2).nnz == 0


def test_plabel_layout_sparse_consistency(trained):
    """Force the plabel (sparse-intersection) layout and compare against the
    dense-layout fused predictions — must agree to float tolerance."""
    import jax.numpy as jnp
    from pecos_tpu.xmc.inference import CompiledHierModel

    X, Y, xlm = trained
    hm = xlm.model
    dense_pred = xlm.predict(X, beam_size=6, only_topk=4)
    compiled_pl = CompiledHierModel.from_host_chain(
        [m.W for m in hm.model_chain],
        [m.C for m in hm.model_chain],
        bias=hm.model_chain[0].bias,
        layouts=["plabel"] * hm.depth,
    )
    pl_pred = compiled_pl.predict(
        X, beam_size=6, only_topk=4, post_processor="l3-hinge"
    )
    np.testing.assert_allclose(
        np.asarray(pl_pred.todense()),
        np.asarray(dense_pred.todense()),
        rtol=2e-4,
        atol=2e-5,
    )


def test_realtime_single_query(trained):
    """batch=1 realtime path: same result as the same query inside a batch."""
    X, Y, xlm = trained
    P_batch = xlm.predict(X[:16], beam_size=6, only_topk=4)
    P_single = xlm.predict(X[:1], beam_size=6, only_topk=4)
    # same labels; values may differ in the last ulp (different XLA tilings)
    np.testing.assert_array_equal(
        np.sort(P_batch[:1].indices), np.sort(P_single.indices)
    )
    np.testing.assert_allclose(
        np.asarray(P_batch[:1].todense()), np.asarray(P_single.todense()), rtol=1e-5, atol=1e-6
    )


def test_wire_format_roundtrip():
    """encode_wire_batch/decode_wire_batch must be bit-exact for float32
    values and exact-on-ids for bfloat16, at several D regimes (hi_bits =
    0 / 2 / 16)."""
    import jax
    from pecos_tpu.xmc.inference import decode_wire_batch, encode_wire_batch

    rng = np.random.default_rng(0)
    for D in [1000, 2**18, 2**31 - 3]:
        cap = 24 if D < 2**20 else 8
        B = 16
        ids = rng.integers(0, D + 2, size=(B, cap)).astype(np.int32)
        vals = rng.standard_normal((B, cap)).astype(np.float32)
        buf = encode_wire_batch(ids, vals, D, "float32")
        ids2, vals2 = (np.asarray(a) for a in decode_wire_batch(
            jax.numpy.asarray(buf), D, cap, "float32"))
        np.testing.assert_array_equal(ids2, ids)
        np.testing.assert_array_equal(vals2, vals)
        buf = encode_wire_batch(ids, vals, D, "bfloat16")
        ids3, vals3 = (np.asarray(a) for a in decode_wire_batch(
            jax.numpy.asarray(buf), D, cap, "bfloat16"))
        np.testing.assert_array_equal(ids3, ids)
        import ml_dtypes
        np.testing.assert_array_equal(
            vals3, vals.astype(ml_dtypes.bfloat16).astype(np.float32))
        buf = encode_wire_batch(ids, vals, D, "float16")
        ids4, vals4 = (np.asarray(a) for a in decode_wire_batch(
            jax.numpy.asarray(buf), D, cap, "float16"))
        np.testing.assert_array_equal(ids4, ids)
        np.testing.assert_array_equal(
            vals4, vals.astype(np.float16).astype(np.float32))
        buf = encode_wire_batch(ids, vals, D, "uint8")
        ids5, vals5 = (np.asarray(a) for a in decode_wire_batch(
            jax.numpy.asarray(buf), D, cap, "uint8"))
        np.testing.assert_array_equal(ids5, ids)
        step = (np.abs(vals).max(axis=1) / 127.0).astype(np.float16)
        q = np.clip(np.rint(vals / step.astype(np.float32)[:, None]), -127, 127)
        np.testing.assert_allclose(
            vals5, (q * step.astype(np.float32)[:, None]).astype(np.float32),
            rtol=0, atol=0)


def test_realtime_session_matches_batch_predict(trained):
    X, Y, xlm = trained
    sess = xlm.realtime_session(beam_size=6, only_topk=4, batch=1, cap=16)
    ref = xlm.predict(X[:5], beam_size=6, only_topk=4)
    for i in range(5):
        one = sess.predict(X[i])
        np.testing.assert_allclose(
            np.asarray(one.todense()),
            np.asarray(ref[i].todense()),
            rtol=1e-5,
            atol=1e-6,
        )
    # microbatch session: 4 rows in one dispatch, including a short batch
    sess4 = xlm.realtime_session(beam_size=6, only_topk=4, batch=4, cap=16)
    got = sess4.predict(X[:3])
    np.testing.assert_allclose(
        np.asarray(got.todense()), np.asarray(ref[:3].todense()), rtol=1e-5, atol=1e-6
    )
    # engine-only latency is measurable and positive
    assert sess.on_device_latency_ms(X[:1], iters=3) > 0.0


def test_realtime_session_errors(trained):
    X, Y, xlm = trained
    sess = xlm.realtime_session(batch=1, cap=16)
    with pytest.raises(ValueError, match="batch"):
        sess.predict(X[:2])
    with pytest.raises(ValueError, match="Feature dimension"):
        sess.predict(smat.csr_matrix((1, X.shape[1] + 3), dtype=np.float32))
    dense_row = np.ones((1, X.shape[1]), np.float32)  # nnz 16 == cap is fine
    sess.predict(dense_row)
    sess_small = xlm.realtime_session(batch=1, cap=8)
    with pytest.raises(ValueError, match="cap"):
        sess_small.predict(dense_row)
