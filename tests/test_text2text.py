"""Text2Text end-to-end test (reference idiom: test_text2text.py CLI e2e)."""

import numpy as np
import pytest

from pecos_tpu.apps.text2text import Text2Text


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("t2t")
    items = [f"item number {i} keyword{i}" for i in range(12)]
    (d / "items.txt").write_text("\n".join(items) + "\n")
    lines = []
    for i in range(96):
        l = i % 12
        lines.append(f"{l}\tquery text mentioning keyword{l} and stuff")
    (d / "input.txt").write_text("\n".join(lines) + "\n")
    return d


def test_train_predict_save_load(data, tmp_path):
    model = Text2Text.train(
        str(data / "input.txt"),
        str(data / "items.txt"),
        indexer_kwargs={"max_leaf_size": 4, "nr_splits": 2},
        xlinear_kwargs={"threshold": 0.0},
    )
    queries = [f"tell me about keyword{i}" for i in range(12)]
    results = model.predict(queries, topk=3)
    top1 = [r[0][0] for r in results]
    acc = np.mean([f"keyword{i}" in t for i, t in enumerate(top1)])
    assert acc > 0.9, f"top1 items: {top1}"

    folder = str(tmp_path / "t2t_model")
    model.save(folder)
    loaded = Text2Text.load(folder)
    results2 = loaded.predict(queries, topk=3)
    assert [r[0][0] for r in results2] == top1


def test_ensemble_members(data):
    model = Text2Text.train(
        str(data / "input.txt"),
        str(data / "items.txt"),
        label_embed_type=["pifa", "pii"],
        ensemble_seeds=[0, 1],
        indexer_kwargs={"max_leaf_size": 4, "nr_splits": 2},
        xlinear_kwargs={"threshold": 0.0},
    )
    assert len(model.xlinear_models) == 4
    results = model.predict(["about keyword3"], topk=2)
    assert len(results[0]) == 2


def test_cached_workspace(data, tmp_path):
    ws = str(tmp_path / "ws")
    kwargs = dict(
        indexer_kwargs={"max_leaf_size": 4, "nr_splits": 2},
        xlinear_kwargs={"threshold": 0.0},
        workspace_folder=ws,
    )
    Text2Text.train(str(data / "input.txt"), str(data / "items.txt"), **kwargs)
    import os

    cached = os.listdir(ws)
    assert any(f.startswith("X_feat") for f in cached)
    # second run should reuse the cache without error
    Text2Text.train(str(data / "input.txt"), str(data / "items.txt"), **kwargs)
