import numpy as np

from pecos_tpu.utils.featurization.text import Preprocessor, Tfidf, Vectorizer

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "never jump over the lazy dog quickly",
    "bright foxes leap over lazy dogs in summer",
    "the dog sleeps in the sun",
]


def test_tfidf_matches_sklearn_word_unigram():
    from sklearn.feature_extraction.text import TfidfVectorizer

    ours = Tfidf.train(CORPUS, {"ngram_range": (1, 1), "norm": "l2"})
    X = ours.predict(CORPUS)
    sk = TfidfVectorizer(norm="l2", smooth_idf=True, sublinear_tf=False)
    Xs = sk.fit_transform(CORPUS)
    assert X.shape[0] == Xs.shape[0]
    # same vocab size (token patterns match for these simple texts)
    assert X.shape[1] == Xs.shape[1]
    # compare row norms and a cosine-similarity structure invariance
    G1 = (X @ X.T).toarray()
    G2 = (Xs @ Xs.T).toarray()
    # sklearn idf = ln((1+n)/(1+df)) + 1 differs from ours; compare sparsity pattern
    assert (G1 > 1e-9).sum() == (G2 > 1e-9).sum()
    np.testing.assert_allclose(G1.diagonal(), 1.0, rtol=1e-5)


def test_tfidf_sklearn_exact_with_add_one_idf():
    from sklearn.feature_extraction.text import TfidfVectorizer

    # ours with smooth+add-one idf == sklearn's formula ln((1+n)/(1+df))+1
    ours = Tfidf.train(
        CORPUS, {"ngram_range": (1, 1), "norm": "l2", "smooth_idf": True, "add_one_idf": True}
    )
    X = ours.predict(CORPUS).toarray()
    sk = TfidfVectorizer(norm="l2")
    Xs = sk.fit_transform(CORPUS).toarray()
    vocab_ours = sorted(ours.bases[0].vocab)
    vocab_sk = sorted(sk.vocabulary_)
    assert vocab_ours == vocab_sk
    # align columns by vocab order
    ours_order = [ours.bases[0].vocab[t] for t in vocab_ours]
    sk_order = [sk.vocabulary_[t] for t in vocab_sk]
    np.testing.assert_allclose(X[:, ours_order], Xs[:, sk_order], rtol=1e-5, atol=1e-6)


def test_tfidf_ensemble():
    model = Tfidf.train(
        CORPUS,
        {
            "base_vect_configs": [
                {"ngram_range": (1, 2), "analyzer": "word"},
                {"ngram_range": (3, 3), "analyzer": "char"},
            ],
            "norm": "l2",
        },
    )
    X = model.predict(CORPUS)
    assert X.shape[0] == len(CORPUS)
    assert model.nr_features == sum(b.nr_features for b in model.bases)
    norms = np.sqrt(np.asarray(X.multiply(X).sum(axis=1)).ravel())
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_df_pruning():
    model = Tfidf.train(CORPUS, {"ngram_range": (1, 1), "min_df_cnt": 2})
    for tok in model.bases[0].vocab:
        df = sum(1 for doc in CORPUS if tok in doc.split() or tok in doc)
        assert df >= 2, tok


def test_max_feature():
    model = Tfidf.train(CORPUS, {"ngram_range": (1, 1), "max_feature": 5})
    assert model.nr_features == 5


def test_vectorizer_registry_save_load(tmp_path):
    v = Vectorizer.train(CORPUS, {"type": "tfidf", "kwargs": {"ngram_range": (1, 1)}})
    X1 = v.predict(CORPUS)
    folder = str(tmp_path / "vect")
    v.save(folder)
    v2 = Vectorizer.load(folder)
    X2 = v2.predict(CORPUS)
    assert (X1 != X2).nnz == 0


def test_preprocessor_xmc_file(tmp_path):
    path = tmp_path / "data.txt"
    path.write_text("0,2\tthe quick brown fox\n1\tlazy dog sleeps\n\t no labels here\n")
    parsed = Preprocessor.load_data_from_file(str(path))
    assert len(parsed["corpus"]) == 3
    Y = parsed["label_matrix"]
    assert Y.shape == (3, 3)
    assert Y[0, 0] == 1 and Y[0, 2] == 1 and Y[1, 1] == 1
    pre = Preprocessor.train(parsed["corpus"], {"type": "tfidf", "kwargs": {}})
    X = pre.predict(parsed["corpus"])
    assert X.shape[0] == 3


def test_char_wb_analyzer():
    model = Tfidf.train(CORPUS, {"ngram_range": (2, 3), "analyzer": "char_wb"})
    X = model.predict(["the fox"])
    assert X.nnz > 0


def test_streaming_file_train_matches_in_memory(tmp_path):
    """Tfidf.train on a file path streams bounded chunks (reference trains
    from file through a bounded buffer, tfidf.hpp:982-1126) and must produce
    the identical model/matrix as in-memory train on the same lines."""
    rng = np.random.default_rng(0)
    vocab_pool = [f"tok{i}" for i in range(300)]
    corpus = [
        " ".join(rng.choice(vocab_pool, size=rng.integers(3, 20)))
        for _ in range(500)
    ]
    path = tmp_path / "corpus.txt"
    path.write_text("\n".join(corpus) + "\n", encoding="utf-8")

    cfg = {"ngram_range": (1, 2), "norm": "l2", "max_feature": 400}
    in_mem = Tfidf.train(corpus, dict(cfg))
    streamed = Tfidf.train(str(path), {**cfg, "chunk_docs": 64})  # 8 chunks
    assert streamed.nr_features == in_mem.nr_features
    assert streamed.bases[0].vocab == in_mem.bases[0].vocab
    np.testing.assert_allclose(streamed.bases[0].idf, in_mem.bases[0].idf, rtol=1e-6)
    X1 = in_mem.predict(corpus)
    X2 = streamed.predict(corpus)
    assert (X1 != X2).nnz == 0
