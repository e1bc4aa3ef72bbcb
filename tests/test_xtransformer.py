"""XR-Transformer tests on toy text with a tiny random-init encoder
(reference idiom: test_xtransformer.py:40-204 — 1-step training on toy text)."""

import os

import numpy as np
import pytest
import scipy.sparse as smat

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("xtf")
    words = [f"tok{i}" for i in range(24)]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    vocab_file = d / "vocab.txt"
    vocab_file.write_text("\n".join(vocab) + "\n")
    L = 8
    corpus, rows, cols = [], [], []
    for i in range(64):
        l = i % L
        corpus.append(f"tok{l} tok{l + 8} tok{l + 16}")
        rows.append(i)
        cols.append(l)
    Y = smat.csr_matrix((np.ones(64, np.float32), (rows, cols)), shape=(64, L))
    rng = np.random.default_rng(0)
    X_feat = smat.csr_matrix(rng.standard_normal((64, 12)).astype(np.float32))
    model_config = dict(
        vocab_size=len(vocab),
        dim=32,
        n_layers=1,
        n_heads=2,
        hidden_dim=64,
        max_position_embeddings=64,
        vocab_file=str(vocab_file),
    )
    return corpus, Y, X_feat, model_config


def _train_params(model_config, epochs=8):
    from pecos_tpu.xmc.xtransformer import TransformerMatcher

    return TransformerMatcher.TrainParams(
        model_type="distilbert",
        model_config=model_config,
        truncate_length=16,
        batch_size=16,
        num_train_epochs=epochs,
        learning_rate=2e-3,
        max_active_matching_labels=8,
        bootstrap_method="inherit",
        seed=0,
    )


def test_matcher_train_predict(tiny_setup):
    from pecos_tpu.xmc.xtransformer import MLProblemWithText, TransformerMatcher

    corpus, Y, X_feat, model_config = tiny_setup
    prob = MLProblemWithText(corpus, Y, X_feat=X_feat)
    matcher, trn_pred, trn_emb = TransformerMatcher.train(
        prob, train_params=_train_params(model_config)
    )
    assert trn_emb.shape == (64, 32)
    assert trn_pred.shape == (64, 8)
    top1 = np.asarray(trn_pred.argmax(axis=1)).ravel()
    truth = np.asarray(Y.argmax(axis=1)).ravel()
    acc = (top1 == truth).mean()
    assert acc > 0.8, f"matcher train accuracy {acc}"


def test_matcher_save_load(tiny_setup, tmp_path):
    from pecos_tpu.xmc.xtransformer import MLProblemWithText, TransformerMatcher

    corpus, Y, X_feat, model_config = tiny_setup
    prob = MLProblemWithText(corpus, Y)
    matcher, _, _ = TransformerMatcher.train(
        prob, train_params=_train_params(model_config, epochs=1)
    )
    folder = str(tmp_path / "matcher")
    matcher.save(folder)
    loaded = TransformerMatcher.load(folder)
    P1, E1 = matcher.predict(corpus[:8])
    P2, E2 = loaded.predict(corpus[:8])
    np.testing.assert_allclose(E1, E2, rtol=1e-5, atol=1e-6)
    assert (P1 != P2).nnz == 0


def test_xtransformer_three_phase(tiny_setup, tmp_path):
    from pecos_tpu.xmc.xtransformer import MLProblemWithText, XTransformer

    corpus, Y, X_feat, model_config = tiny_setup
    prob = MLProblemWithText(corpus, Y, X_feat=X_feat)
    xtf = XTransformer.train(
        prob,
        train_params=XTransformer.TrainParams(
            matcher_params_chain=_train_params(model_config),
            preliminary_indexer_params={"max_leaf_size": 2, "nr_splits": 2},
            refined_indexer_params={"max_leaf_size": 2, "nr_splits": 2},
        ),
        threshold=0.0,
    )
    P = xtf.predict(corpus, X_feat=X_feat, only_topk=2)
    assert P.shape == (64, 8)
    truth = np.asarray(Y.argmax(axis=1)).ravel()
    top1 = np.asarray(P.argmax(axis=1)).ravel()
    acc = (top1 == truth).mean()
    assert acc > 0.8, f"3-phase accuracy {acc}"

    emb = xtf.encode(corpus[:4])
    assert emb.shape == (4, 32)

    folder = str(tmp_path / "xtf")
    xtf.save(folder)
    loaded = XTransformer.load(folder)
    P2 = loaded.predict(corpus, X_feat=X_feat, only_topk=2)
    assert (P != P2).nnz == 0


def test_dist_fine_tune_dp_mesh(tiny_setup):
    """Data-parallel matcher fine-tune over the virtual 8-device mesh
    (DeepSpeed-analog path, distributed/xmc/xtransformer)."""
    from pecos_tpu.distributed.xmc.xtransformer import dist_fine_tune
    from pecos_tpu.xmc.xtransformer import MLProblemWithText

    corpus, Y, X_feat, model_config = tiny_setup
    prob = MLProblemWithText(corpus, Y)
    matcher, trn_pred, trn_emb = dist_fine_tune(
        prob, train_params=_train_params(model_config, epochs=8)
    )
    import numpy as np

    top1 = np.asarray(trn_pred.argmax(axis=1)).ravel()
    truth = np.asarray(Y.argmax(axis=1)).ravel()
    assert (top1 == truth).mean() > 0.7


def test_ensemble_prediction_modes(tiny_setup):
    from pecos_tpu.xmc.xtransformer import MLProblemWithText, XTransformer

    corpus, Y, X_feat, model_config = tiny_setup
    prob = MLProblemWithText(corpus, Y, X_feat=X_feat)
    xtf = XTransformer.train(
        prob,
        train_params=XTransformer.TrainParams(
            matcher_params_chain=_train_params(model_config, epochs=4),
            preliminary_indexer_params={"max_leaf_size": 2, "nr_splits": 2},
            refined_indexer_params={"max_leaf_size": 2, "nr_splits": 2},
        ),
        threshold=0.0,
    )
    import numpy as np

    for m in ("concat-only", "transformer-only", "average", "rank_average"):
        P = xtf.predict(corpus[:16], X_feat=X_feat[:16], ens_method=m, only_topk=3)
        assert P.shape == (16, Y.shape[1]), m
        assert P.nnz > 0, m


def test_matcher_amenities(tiny_setup, tmp_path):
    """Grad accumulation + val checkpoint-best + warm start + concat model
    (reference matcher.py:942-1496 training amenities)."""
    from pecos_tpu.xmc.xtransformer import MLProblemWithText, TransformerMatcher

    corpus, Y, X_feat, model_config = tiny_setup
    prob = MLProblemWithText(corpus, Y, X_feat=X_feat)
    val_prob = MLProblemWithText(corpus[:32], Y[:32])
    tp = _train_params(model_config, epochs=4)
    tp.gradient_accumulation_steps = 2
    tp.save_steps = 4
    matcher, trn_pred, _ = TransformerMatcher.train(
        prob,
        train_params=tp,
        pred_params=TransformerMatcher.PredParams(ensemble_method="average"),
        val_prob=val_prob,
    )
    # concat model trained and ensembled
    assert matcher.concat_model is not None
    assert trn_pred.shape == (64, 8)
    top1 = np.asarray(trn_pred.argmax(axis=1)).ravel()
    truth = np.asarray(Y.argmax(axis=1)).ravel()
    assert (top1 == truth).mean() > 0.8

    # save/load roundtrip keeps the concat model; warm start reuses it
    out = str(tmp_path / "matcher_amen")
    matcher.save(out)
    loaded = TransformerMatcher.load(out)
    assert loaded.concat_model is not None
    P1, _ = loaded.predict(corpus, X_feat=X_feat)
    P2, _ = matcher.predict(corpus, X_feat=X_feat)
    assert (P1 != P2).nnz == 0

    tp2 = _train_params(model_config, epochs=1)
    tp2.init_model_dir = out
    m2, _, _ = TransformerMatcher.train(prob, train_params=tp2)
    assert m2.hidden_size == matcher.hidden_size


def test_xtransformer_frozen_encoder(tiny_setup):
    """do_fine_tune=False: pretrained/random encoder used as-is, embeddings
    feed the concat ranker (reference model.py:271-303)."""
    from pecos_tpu.xmc.xtransformer import MLProblemWithText, XTransformer

    corpus, Y, X_feat, model_config = tiny_setup
    prob = MLProblemWithText(corpus, Y, X_feat=X_feat)
    xt = XTransformer.train(
        prob,
        train_params={
            "do_fine_tune": False,
            "matcher_params_chain": {
                "model_type": "distilbert",
                "model_config": model_config,
                "truncate_length": 16,
            },
            "preliminary_indexer_params": {"nr_splits": 4, "max_leaf_size": 4},
            "fix_clustering": True,
        },
    )
    P = xt.predict(corpus, X_feat=X_feat, beam_size=4, only_topk=3)
    assert P.shape == (64, 8)
    top1 = np.asarray(P.argmax(axis=1)).ravel()
    truth = np.asarray(Y.argmax(axis=1)).ravel()
    # frozen random encoder still separable through the concat ranker (X_feat)
    assert (top1 == truth).mean() > 0.5


def test_xmc_text_dataset_shards(tiny_setup, tmp_path):
    """Shard save/load roundtrip (reference XMCTextDataset, module.py:369-466)."""
    from transformers import DistilBertTokenizerFast

    from pecos_tpu.xmc.xtransformer.module import XMCTextDataset

    corpus, Y, X_feat, model_config = tiny_setup
    tok = DistilBertTokenizerFast(vocab_file=model_config["vocab_file"])
    M = (Y @ smat.csr_matrix(np.ones((8, 4), np.float32))).tocsr()
    ds = XMCTextDataset.from_text(tok, corpus, truncate_length=16, Y=Y, M=M)
    assert len(ds) == 64
    # in-memory shard
    sh = ds.get_shard(8, 24)
    assert len(sh) == 16
    np.testing.assert_array_equal(
        sh.tokens["input_ids"], ds.tokens["input_ids"][8:24]
    )
    # disk roundtrip with 4 shards
    d = str(tmp_path / "ds")
    ds.save(d, num_shards=4)
    assert XMCTextDataset.get_data_stats(d)["num_shards"] == 4
    s2 = XMCTextDataset.load(d, shard=2)
    assert len(s2) == 16
    np.testing.assert_array_equal(
        s2.tokens["input_ids"], ds.tokens["input_ids"][32:48]
    )
    assert (s2.Y != Y[32:48]).nnz == 0
    assert (s2.M != M[32:48]).nnz == 0
    assert s2.R is None
    # label batches come out shard-local
    rng = np.random.default_rng(0)
    ids, tgt, costs = s2.label_batches(max_active=8, pad_label=8, rng=rng)
    assert ids.shape == (16, 8)
    with pytest.raises(ValueError):
        XMCTextDataset.load(d, shard=9)
