"""XMR reranker tests (reference: pecos/xmr/reranker, HF-Trainer based;
here: flax/optax two-tower)."""

import os

import numpy as np
import pytest

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    d = tmp_path_factory.mktemp("rr")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "good", "bad", "query", "item"]
    vf = d / "vocab.txt"
    vf.write_text("\n".join(vocab) + "\n")
    model_config = dict(
        vocab_size=len(vocab), dim=16, n_layers=1, n_heads=2, hidden_dim=32,
        max_position_embeddings=32, vocab_file=str(vf),
    )
    rng = np.random.default_rng(0)
    inputs, labels, numr = [], [], []
    for q in range(24):
        for g, rel in enumerate([1.0, 0.0, 0.0, 0.0]):
            word = "good" if rel > 0 else "bad"
            inputs.append(f"query {q} [SEP] {word} item")
            labels.append(rel)
            numr.append([rel * 2 - 1 + rng.normal() * 0.1, rng.normal()])
    return inputs, np.array(labels, np.float32), np.array(numr, np.float32), model_config


@pytest.mark.parametrize("loss", ["pointwise", "pairwise", "listwise"])
def test_train_ranks_relevant_higher(tiny, loss):
    from pecos_tpu.xmr.reranker import RankingModel

    inputs, labels, numr, model_config = tiny
    model = RankingModel.train(
        inputs,
        labels,
        numeric_feats=numr,
        train_params=dict(
            model_type="distilbert",
            model_config=model_config,
            truncate_length=12,
            batch_size=16,
            num_train_epochs=6,
            learning_rate=3e-3,
            loss_fn=loss,
            group_size=4,
        ),
    )
    scores = model.predict(inputs, numeric_feats=numr)
    s = scores.reshape(-1, 4)
    # relevant item (index 0 in each group) should outrank the rest
    acc = (s.argmax(axis=1) == 0).mean()
    assert acc > 0.8, f"{loss}: ranking accuracy {acc}"


def test_save_load(tiny, tmp_path):
    from pecos_tpu.xmr.reranker import RankingModel

    inputs, labels, numr, model_config = tiny
    model = RankingModel.train(
        inputs[:16],
        labels[:16],
        numeric_feats=numr[:16],
        train_params=dict(
            model_type="distilbert", model_config=model_config,
            truncate_length=12, batch_size=8, num_train_epochs=1,
        ),
    )
    folder = str(tmp_path / "rr")
    model.save(folder)
    loaded = RankingModel.load(folder)
    s1 = model.predict(inputs[:8], numeric_feats=numr[:8])
    s2 = loaded.predict(inputs[:8], numeric_feats=numr[:8])
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)


def test_data_utils(tmp_path):
    import pandas as pd

    from pecos_tpu.xmr.reranker.model import RankingDataUtils

    df = pd.DataFrame(
        {"query": ["q1", "q1", "q2"], "item": ["a", "b", "c"], "relevance": [1.0, 0.0, 0.5]}
    )
    p = str(tmp_path / "d.parquet")
    df.to_parquet(p)
    loaded = RankingDataUtils.load_parquet([p])
    inputs, labels = RankingDataUtils.build_pairs(loaded)
    assert inputs[0] == "q1 [SEP] a"
    np.testing.assert_array_equal(labels, [1.0, 0.0, 0.5])


def test_lora_fine_tune_ranks(tiny):
    """LoRA (peft analog, reference setup.py:99): frozen encoder + low-rank
    attention deltas must still learn the ranking; adapters bake into the
    encoder so save/load/predict are unchanged."""
    from pecos_tpu.xmr.reranker import RankingModel

    inputs, labels, numr, model_config = tiny
    model = RankingModel.train(
        inputs,
        labels,
        numeric_feats=numr,
        train_params=dict(
            model_type="distilbert",
            model_config=model_config,
            truncate_length=12,
            batch_size=16,
            num_train_epochs=6,
            learning_rate=3e-3,
            loss_fn="pairwise",
            group_size=4,
            lora_rank=4,
        ),
    )
    scores = model.predict(inputs, numeric_feats=numr)
    s = scores.reshape(-1, 4)
    acc = (s.argmax(axis=1) == 0).mean()
    assert acc > 0.8, f"lora ranking accuracy {acc}"


def test_train_streaming_parquet(tiny, tmp_path):
    """Parquet-shard streaming training (reference streams HF-datasets shards,
    reranker/data_utils.py:268-299): one shard resident at a time, same
    ranking quality as in-memory training on the concatenated data."""
    import pandas as pd

    from pecos_tpu.xmr.reranker import RankingModel
    from pecos_tpu.xmr.reranker.model import RankingDataUtils

    _, _, _, model_config = tiny
    rows = []
    for q in range(24):
        for rel in [1.0, 0.0, 0.0, 0.0]:
            word = "good" if rel > 0 else "bad"
            rows.append({"query": f"query {q}", "item": f"{word} item", "relevance": rel})
    df = pd.DataFrame(rows)
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    for i in range(3):
        df.iloc[i * 32 : (i + 1) * 32].to_parquet(shard_dir / f"part-{i}.parquet")

    assert RankingDataUtils.get_parquet_rows(str(shard_dir)) == 96
    shards = list(RankingDataUtils.iter_parquet_shards(str(shard_dir)))
    assert len(shards) == 3 and all(len(s) == 32 for s in shards)

    model = RankingModel.train_streaming(
        str(shard_dir),
        train_params=dict(
            model_type="distilbert",
            model_config=model_config,
            truncate_length=12,
            batch_size=16,
            num_train_epochs=6,
            learning_rate=3e-3,
            loss_fn="pairwise",
            group_size=4,
            seed=0,
        ),
    )
    scores = model.predict(
        ["q [SEP] good item", "q [SEP] bad item"], batch_size=2, truncate_length=12
    )
    assert scores[0] > scores[1]
