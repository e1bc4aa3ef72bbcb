"""Text vectorizers: native TF-IDF n-gram ensembles + sklearn wrappers.

Host-side counterpart of the reference's C++ TF-IDF stack
(pecos/core/utils/tfidf.hpp: Tokenizer :297, BaseVectorizer :646,
Vectorizer-ensemble :1212) and the python registry
(pecos/utils/featurization/text/vectorizers.py:27-160).

The native ``Tfidf`` is an **ensemble of base vectorizers** — e.g. word 1-2
grams plus char 3-grams — each with its own df-pruning / idf / tf options;
their feature blocks are hstacked and the rows re-normalized, matching the
reference semantics (tfidf.hpp:1212-1466).  Tokenization is a hot host-side
path; this implementation vectorizes with hashed counting in numpy/python and
is the candidate for a future C++ extension.
"""

from __future__ import annotations

import dataclasses as dc
import json
import os
import re
from collections import Counter
from typing import List, Optional, Sequence

import numpy as np
import scipy.sparse as smat

import pecos_tpu
from pecos_tpu.utils import smat_util

_WORD_RE = re.compile(r"\w+", re.UNICODE)


class Vectorizer(pecos_tpu.BaseClass):
    """Registry + dispatch (reference vectorizers.py:27-160)."""

    vectorizer_dict = {}

    @classmethod
    def register(cls, name):
        def deco(sub):
            cls.vectorizer_dict[name] = sub
            return sub

        return deco

    @classmethod
    def train(cls, trn_corpus, config: Optional[dict] = None, dtype=np.float32):
        config = config if config is not None else {"type": "tfidf", "kwargs": {}}
        ty = config.get("type", "tfidf")
        if ty not in cls.vectorizer_dict:
            raise ValueError(f"unknown vectorizer type {ty!r}")
        model = cls.vectorizer_dict[ty].train(trn_corpus, config.get("kwargs", {}), dtype=dtype)
        return cls(config, model)

    def __init__(self, config, model):
        self.config = config
        self.model = model

    def predict(self, corpus, **kwargs):
        return self.model.predict(corpus, **kwargs)

    def save(self, folder):
        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, "config.json"), "w") as f:
            json.dump(self.config, f)
        self.model.save(os.path.join(folder, "model"))

    @classmethod
    def load(cls, folder):
        with open(os.path.join(folder, "config.json")) as f:
            config = json.load(f)
        model = cls.vectorizer_dict[config["type"]].load(os.path.join(folder, "model"))
        return cls(config, model)


@dc.dataclass
class TfidfBaseParams(pecos_tpu.BaseParams):
    """One base vectorizer's params (reference tfidf.hpp:66-192)."""

    ngram_range: Sequence[int] = (1, 1)
    truncate_length: int = -1  # max tokens (word) / chars (char); -1 = no cap
    max_feature: int = 0  # keep top-k features by df (0 = all)
    min_df_ratio: float = 0.0
    max_df_ratio: float = 1.0
    min_df_cnt: int = 0
    max_df_cnt: int = -1  # -1 = no cap
    binary: bool = False
    use_idf: bool = True
    smooth_idf: bool = True
    add_one_idf: bool = False
    sublinear_tf: bool = False
    keep_frequent_feature: bool = True
    norm: str = "l2"
    analyzer: str = "word"  # word | char | char_wb


def _tokenize(text: str, analyzer: str, truncate: int) -> List[str]:
    if analyzer == "word":
        toks = _WORD_RE.findall(text.lower())
        if truncate > 0:
            toks = toks[:truncate]
        return toks
    elif analyzer == "char":
        s = text.lower()
        if truncate > 0:
            s = s[:truncate]
        return list(s)
    elif analyzer == "char_wb":
        # char n-grams only inside word boundaries, words padded with spaces
        toks = _WORD_RE.findall(text.lower())
        if truncate > 0:
            toks = toks[:truncate]
        return [f" {t} " for t in toks]
    raise ValueError(f"unknown analyzer {analyzer!r}")


def _ngrams(units: List[str], analyzer: str, lo: int, hi: int):
    if analyzer == "word":
        for n in range(lo, hi + 1):
            for i in range(len(units) - n + 1):
                yield " ".join(units[i : i + n])
    else:
        # char / char_wb: n-grams of characters (within each padded word for wb)
        seqs = ["".join(units)] if analyzer == "char" else units
        for s in seqs:
            for n in range(lo, hi + 1):
                for i in range(len(s) - n + 1):
                    yield s[i : i + n]


class _TfidfBase:
    """One trained base vectorizer: vocab + idf weights."""

    def __init__(self, params: TfidfBaseParams, vocab: dict, idf: np.ndarray):
        self.params = params
        self.vocab = vocab
        self.idf = idf

    @classmethod
    def train(cls, corpus: Sequence[str], params: TfidfBaseParams) -> "_TfidfBase":
        lo, hi = params.ngram_range
        n_doc = len(corpus)
        df = Counter()
        for text in corpus:
            units = _tokenize(text, params.analyzer, params.truncate_length)
            df.update(set(_ngrams(units, params.analyzer, lo, hi)))
        # df pruning (tfidf.hpp BaseVectorizer::train df-threshold logic)
        min_df = max(params.min_df_cnt, int(np.ceil(params.min_df_ratio * n_doc)))
        max_df = n_doc if params.max_df_cnt < 0 else params.max_df_cnt
        max_df = min(max_df, int(np.floor(params.max_df_ratio * n_doc)))
        items = [(t, c) for t, c in df.items() if min_df <= c <= max_df]
        if params.max_feature > 0 and len(items) > params.max_feature:
            # keep most or least frequent features per keep_frequent_feature
            items.sort(key=lambda tc: (-tc[1] if params.keep_frequent_feature else tc[1], tc[0]))
            items = items[: params.max_feature]
        items.sort(key=lambda tc: tc[0])  # deterministic feature ids
        vocab = {t: i for i, (t, _) in enumerate(items)}
        dfs = np.array([c for _, c in items], dtype=np.float64)
        if params.use_idf:
            s = 1.0 if params.smooth_idf else 0.0
            idf = np.log((n_doc + s) / (dfs + s))
            if params.add_one_idf:
                idf += 1.0
        else:
            idf = np.ones(len(items))
        return cls(params, vocab, idf.astype(np.float32))

    @property
    def nr_features(self) -> int:
        return len(self.vocab)

    def predict(self, corpus: Sequence[str]) -> smat.csr_matrix:
        p = self.params
        lo, hi = p.ngram_range
        indptr = [0]
        indices: List[int] = []
        data: List[float] = []
        for text in corpus:
            units = _tokenize(text, p.analyzer, p.truncate_length)
            cnt = Counter(
                self.vocab[g]
                for g in _ngrams(units, p.analyzer, lo, hi)
                if g in self.vocab
            )
            ks = sorted(cnt)
            tf = np.array([cnt[k] for k in ks], dtype=np.float32)
            if p.binary:
                tf = np.ones_like(tf)
            elif p.sublinear_tf:
                tf = 1.0 + np.log(tf)
            vals = tf * self.idf[ks] if p.use_idf else tf
            indices.extend(ks)
            data.extend(vals.tolist())
            indptr.append(len(indices))
        X = smat.csr_matrix(
            (np.array(data, np.float32), np.array(indices, np.int64), np.array(indptr)),
            shape=(len(corpus), self.nr_features),
        )
        if p.norm in ("l1", "l2"):
            X = smat_util.normalize(X, axis=1, norm=p.norm)
        return X

    def to_dict(self):
        return {
            "params": self.params.to_dict(),
            "vocab": list(self.vocab.keys()),
            "idf": self.idf.tolist(),
        }

    @classmethod
    def from_dict(cls, d):
        params = TfidfBaseParams.from_dict(d["params"])
        vocab = {t: i for i, t in enumerate(d["vocab"])}
        return cls(params, vocab, np.array(d["idf"], np.float32))


@Vectorizer.register("tfidf")
class Tfidf(pecos_tpu.BaseClass):
    """Ensemble TF-IDF vectorizer (reference tfidf.hpp Vectorizer :1212)."""

    def __init__(self, bases: List[_TfidfBase], norm: str = "l2"):
        self.bases = bases
        self.norm = norm

    @classmethod
    def train(cls, trn_corpus, config: Optional[dict] = None, dtype=np.float32) -> "Tfidf":
        config = dict(config or {})
        norm = config.pop("norm", "l2")
        base_cfgs = config.pop("base_vect_configs", None)
        if base_cfgs is None:
            base_cfgs = [config] if config else [{}]
        corpus = cls._as_corpus(trn_corpus)
        bases = [
            _TfidfBase.train(corpus, TfidfBaseParams.from_dict({**bc, "norm": bc.get("norm", norm)}))
            for bc in base_cfgs
        ]
        return cls(bases, norm=norm)

    @staticmethod
    def _as_corpus(corpus) -> List[str]:
        if isinstance(corpus, str):
            with open(corpus, encoding="utf-8") as f:
                return [line.rstrip("\n") for line in f]
        return list(corpus)

    @property
    def nr_features(self) -> int:
        return sum(b.nr_features for b in self.bases)

    def predict(self, corpus, **kwargs) -> smat.csr_matrix:
        corpus = self._as_corpus(corpus)
        blocks = [b.predict(corpus) for b in self.bases]
        if len(blocks) == 1:
            return blocks[0]
        X = smat_util.hstack_csr(blocks)
        # ensemble re-normalization across the stacked blocks (tfidf.hpp:1381+)
        if self.norm in ("l1", "l2"):
            X = smat_util.normalize(X, axis=1, norm=self.norm)
        return X

    def save(self, folder):
        os.makedirs(folder, exist_ok=True)
        payload = {"norm": self.norm, "bases": [b.to_dict() for b in self.bases]}
        with open(os.path.join(folder, "tfidf_model.json"), "w") as f:
            json.dump(payload, f)

    @classmethod
    def load(cls, folder):
        with open(os.path.join(folder, "tfidf_model.json")) as f:
            payload = json.load(f)
        return cls([_TfidfBase.from_dict(b) for b in payload["bases"]], payload["norm"])


@Vectorizer.register("sklearn_tfidf")
class SklearnTfidf(pecos_tpu.BaseClass):
    """Thin wrapper over sklearn TfidfVectorizer (reference vectorizers.py:310)."""

    def __init__(self, model):
        self.model = model

    @classmethod
    def train(cls, trn_corpus, config=None, dtype=np.float32):
        from sklearn.feature_extraction.text import TfidfVectorizer

        config = dict(config or {})
        config.setdefault("dtype", dtype)
        if "ngram_range" in config:
            config["ngram_range"] = tuple(config["ngram_range"])
        model = TfidfVectorizer(**config)
        model.fit(Tfidf._as_corpus(trn_corpus))
        return cls(model)

    def predict(self, corpus, **kwargs):
        return self.model.transform(Tfidf._as_corpus(corpus)).astype(np.float32)

    def save(self, folder):
        import pickle

        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, "model.pkl"), "wb") as f:
            pickle.dump(self.model, f)

    @classmethod
    def load(cls, folder):
        import pickle

        with open(os.path.join(folder, "model.pkl"), "rb") as f:
            return cls(pickle.load(f))


@Vectorizer.register("sklearn_hashing")
class SklearnHashing(pecos_tpu.BaseClass):
    """Wrapper over sklearn HashingVectorizer (reference vectorizers.py:401)."""

    def __init__(self, model):
        self.model = model

    @classmethod
    def train(cls, trn_corpus, config=None, dtype=np.float32):
        from sklearn.feature_extraction.text import HashingVectorizer

        config = dict(config or {})
        config.setdefault("dtype", dtype)
        if "ngram_range" in config:
            config["ngram_range"] = tuple(config["ngram_range"])
        model = HashingVectorizer(**config)
        model.fit(Tfidf._as_corpus(trn_corpus))
        return cls(model)

    def predict(self, corpus, **kwargs):
        return self.model.transform(Tfidf._as_corpus(corpus)).astype(np.float32)

    def save(self, folder):
        import pickle

        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, "model.pkl"), "wb") as f:
            pickle.dump(self.model, f)

    @classmethod
    def load(cls, folder):
        import pickle

        with open(os.path.join(folder, "model.pkl"), "rb") as f:
            return cls(pickle.load(f))
