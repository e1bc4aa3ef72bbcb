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
import logging
import os
import re
from collections import Counter
from typing import List, Optional, Sequence

import numpy as np
import scipy.sparse as smat

import ctypes

import pecos_tpu
from pecos_tpu.utils import smat_util

_WORD_RE = re.compile(r"\w+", re.UNICODE)

# ---------------------------------------------------------------------------
# native tokenizer bridge (pecos_tpu/core/tokenizer.cpp): C++ does the hot
# tokenize/ngram/hash/count loop (>=10x the pure-Python path); df pruning,
# idf, vocabulary ordering and CSR assembly stay vectorized numpy below.
# ---------------------------------------------------------------------------
_ANALYZER_CODE = {"word": 0, "char": 1, "char_wb": 2}
_tok_lib = None
_NATIVE_OK = True  # flipped off if the native core fails to build/load


def _load_tok_lib():
    global _tok_lib, _NATIVE_OK
    if _tok_lib is None and _NATIVE_OK:
        try:
            from pecos_tpu.core import build_core

            lib = ctypes.CDLL(build_core())
            i64p = ctypes.POINTER(ctypes.c_int64)
            u64p = ctypes.POINTER(ctypes.c_uint64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.tok_count.restype = ctypes.c_void_p
            lib.tok_count.argtypes = [
                ctypes.c_char_p, i64p, ctypes.c_int64, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_int,
            ]
            lib.tok_nnz.restype = ctypes.c_int64
            lib.tok_nnz.argtypes = [ctypes.c_void_p]
            lib.tok_n_unique.restype = ctypes.c_int64
            lib.tok_n_unique.argtypes = [ctypes.c_void_p]
            lib.tok_str_blob_size.restype = ctypes.c_int64
            lib.tok_str_blob_size.argtypes = [ctypes.c_void_p]
            lib.tok_fill.argtypes = [ctypes.c_void_p, i64p, u64p, i32p]
            lib.tok_fill_strings.argtypes = [ctypes.c_void_p, ctypes.c_char_p, i64p, u64p, i64p]
            lib.tok_free.argtypes = [ctypes.c_void_p]
            lib.tok_hash_strings.argtypes = [ctypes.c_char_p, i64p, ctypes.c_int64, u64p]
            lib.tok_sort_order.argtypes = [ctypes.c_char_p, i64p, i64p, ctypes.c_int64, i64p]
            lib.tok_lookup_build.restype = ctypes.c_void_p
            lib.tok_lookup_build.argtypes = [u64p, ctypes.c_int64]
            lib.tok_lookup.argtypes = [ctypes.c_void_p, u64p, ctypes.c_int64, i64p]
            lib.tok_lookup_free.argtypes = [ctypes.c_void_p]
            _tok_lib = lib
        except Exception:  # toolchain missing: fall back to the Python path
            _NATIVE_OK = False
    return _tok_lib


def _native_count(corpus, analyzer: str, lo: int, hi: int, truncate: int, want_strings: bool):
    """Tokenize+count a corpus natively.

    Returns (doc_indptr, hashes, counts[, tokens]) where hashes/counts hold
    each document's unique n-gram 64-bit hashes and multiplicities; `tokens`
    (train only) is the list of first-occurrence n-gram strings.
    """
    lib = _load_tok_lib()
    enc = [t.lower().encode("utf-8") for t in corpus]
    offsets = np.zeros(len(enc) + 1, np.int64)
    if enc:
        offsets[1:] = np.cumsum([len(b) for b in enc])
    blob = b"".join(enc)
    i64p = ctypes.POINTER(ctypes.c_int64)
    handle = lib.tok_count(
        blob, offsets.ctypes.data_as(i64p), len(enc), _ANALYZER_CODE[analyzer],
        lo, hi, truncate, int(want_strings),
    )
    try:
        nnz = lib.tok_nnz(handle)
        doc_indptr = np.zeros(len(enc) + 1, np.int64)
        hashes = np.zeros(nnz, np.uint64)
        counts = np.zeros(nnz, np.int32)
        lib.tok_fill(
            handle,
            doc_indptr.ctypes.data_as(i64p),
            hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if not want_strings:
            return doc_indptr, hashes, counts
        n_uniq = lib.tok_n_unique(handle)
        blob_sz = lib.tok_str_blob_size(handle)
        sblob = ctypes.create_string_buffer(max(int(blob_sz), 1))
        soffs = np.zeros(n_uniq + 1, np.int64)
        shash = np.zeros(n_uniq, np.uint64)
        sdfs = np.zeros(n_uniq, np.int64)
        lib.tok_fill_strings(
            handle, sblob, soffs.ctypes.data_as(i64p),
            shash.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            sdfs.ctypes.data_as(i64p),
        )
        raw = sblob.raw[: int(blob_sz)]
        return doc_indptr, hashes, counts, (raw, soffs, shash, sdfs)
    finally:
        lib.tok_free(handle)


def _flat_rows(lens: np.ndarray) -> np.ndarray:
    """row-id per flattened element for variable-length rows: the int32
    cumsum equivalent of np.repeat(arange(n), lens) with ~1/4 the memory
    traffic (first-touch page faults dominate large temporaries on the
    target VMs, so footprint is wall-clock)."""
    total = int(lens.sum())
    rows = np.zeros(total, np.int32)
    if len(lens) > 1:
        rows[np.cumsum(lens[:-1])] = 1
    return np.cumsum(rows, dtype=np.int32)


def _void_keys(blob: bytes, offs: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """memcmp-sortable keys for the tokens selected by idx: right-zero-padded
    UTF-8 bytes viewed as a void dtype (byte order == codepoint order, zero
    pad sorts shorter strings first — identical to Python str ordering)."""
    lens = offs[idx + 1] - offs[idx]
    n = len(idx)
    maxlen = int(lens.max()) if n else 1
    mat = np.zeros((max(n, 1), maxlen), np.uint8)
    if n:
        rows = _flat_rows(lens)
        starts = np.zeros(n, np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        flat = np.arange(int(lens.sum()), dtype=np.int64)
        within = flat
        within -= starts[rows]  # in place: `flat` is dead after this
        src_pos = offs[idx][rows] + within
        mat[rows, within] = np.frombuffer(blob, np.uint8)[src_pos]
    return mat[:n].view(f"V{maxlen}").ravel()


def _hash_tokens(tokens: List[str]) -> np.ndarray:
    """FNV-1a 64 hashes of vocab tokens via the native core (reload path)."""
    lib = _load_tok_lib()
    enc = [t.encode("utf-8") for t in tokens]
    offsets = np.zeros(len(enc) + 1, np.int64)
    if enc:
        offsets[1:] = np.cumsum([len(b) for b in enc])
    out = np.zeros(len(enc), np.uint64)
    lib.tok_hash_strings(
        b"".join(enc),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(enc),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return out


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
    """One trained base vectorizer: vocab + idf weights.

    Token strings live either in a classic dict (Python path, reload) or in a
    packed (blob, offsets) store in column order (native path) — the dict is
    materialized lazily since the fast predict path only needs the hashes.
    """

    def __init__(self, params: TfidfBaseParams, vocab: Optional[dict], idf: np.ndarray):
        self.params = params
        self._vocab = vocab
        self.idf = idf
        self._tok_storage: Optional[tuple] = None  # (blob bytes, offsets) in col order
        self._hash_sorted: Optional[np.ndarray] = None
        self._col_sorted: Optional[np.ndarray] = None

    @property
    def vocab(self) -> dict:
        if self._vocab is None and self._tok_storage is not None:
            blob, offs = self._tok_storage
            self._vocab = {
                blob[offs[i] : offs[i + 1]].decode("utf-8"): i for i in range(len(offs) - 1)
            }
        return self._vocab

    @classmethod
    def _from_native_vocab(cls, params, blob, offs, shash, df, n_doc) -> "_TfidfBase":
        """Vectorized vocabulary selection: df pruning + feature cap +
        byte-lexicographic column ordering, no per-token Python."""
        min_df = max(params.min_df_cnt, int(np.ceil(params.min_df_ratio * n_doc)))
        max_df = n_doc if params.max_df_cnt < 0 else params.max_df_cnt
        max_df = min(max_df, int(np.floor(params.max_df_ratio * n_doc)))
        idx = np.nonzero((df >= min_df) & (df <= max_df))[0]
        if params.max_feature > 0 and len(idx) > params.max_feature:
            vk = _void_keys(blob, offs, idx)
            dkey = -df[idx] if params.keep_frequent_feature else df[idx]
            order = np.lexsort((vk, dkey))
            idx = idx[order[: params.max_feature]]
        # column ordering: byte-lexicographic sort in C++ (tok_sort_order) —
        # the numpy void-key pipeline materializes ~1 GB of temporaries, which
        # first-touch page faults make the hottest phase of train on these VMs
        lib = _load_tok_lib()
        idx = np.ascontiguousarray(idx, np.int64)
        if lib is not None and len(idx):
            i64p = ctypes.POINTER(ctypes.c_int64)
            order = np.zeros(len(idx), np.int64)
            offs64 = np.ascontiguousarray(offs, np.int64)
            lib.tok_sort_order(
                blob, offs64.ctypes.data_as(i64p), idx.ctypes.data_as(i64p),
                len(idx), order.ctypes.data_as(i64p),
            )
        else:
            order = np.argsort(_void_keys(blob, offs, idx))
        idx = idx[order]
        dfs = df[idx].astype(np.float64)
        if params.use_idf:
            s = 1.0 if params.smooth_idf else 0.0
            idf = np.log((n_doc + s) / (dfs + s))
            if params.add_one_idf:
                idf += 1.0
        else:
            idf = np.ones(len(idx))
        obj = cls(params, None, idf.astype(np.float32))
        # repack selected tokens in column order
        lens = offs[idx + 1] - offs[idx]
        new_offs = np.zeros(len(idx) + 1, np.int64)
        new_offs[1:] = np.cumsum(lens)
        src = np.frombuffer(blob, np.uint8)
        if len(idx):
            rows = _flat_rows(lens)
            pos = np.arange(int(lens.sum()), dtype=np.int64)
            pos -= new_offs[:-1][rows]
            pos += offs[idx][rows]
            packed = src[pos].tobytes()
        else:
            packed = b""
        obj._tok_storage = (packed, new_offs)
        h = shash[idx]
        horder = np.argsort(h)
        obj._hash_sorted = h[horder]
        obj._col_sorted = np.arange(len(idx), dtype=np.int64)[horder]
        return obj

    @staticmethod
    def _select_vocab(items, params, n_doc):
        """df pruning + feature cap + deterministic ordering
        (tfidf.hpp BaseVectorizer::train df-threshold logic)."""
        min_df = max(params.min_df_cnt, int(np.ceil(params.min_df_ratio * n_doc)))
        max_df = n_doc if params.max_df_cnt < 0 else params.max_df_cnt
        max_df = min(max_df, int(np.floor(params.max_df_ratio * n_doc)))
        items = [(t, c) for t, c in items if min_df <= c <= max_df]
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
        return vocab, idf.astype(np.float32)

    @classmethod
    def train(cls, corpus: Sequence[str], params: TfidfBaseParams) -> "_TfidfBase":
        lo, hi = params.ngram_range
        n_doc = len(corpus)
        if _load_tok_lib() is not None:
            res = _native_count(
                corpus, params.analyzer, lo, hi, params.truncate_length, want_strings=True
            )
            # the C++ counter tracks per-token document frequency inline
            # (64-bit FNV collisions, odds ~V^2/2^64, would merge two tokens'
            # counts — same exposure as the reference's hashed vocab build)
            doc_indptr, hashes, counts, (blob, soffs, shash, sdfs) = res
            return cls._from_native_vocab(params, blob, soffs, shash, sdfs, n_doc)
        # pure-Python fallback (no native toolchain, or a hash collision)
        df_ctr = Counter()
        for text in corpus:
            units = _tokenize(text, params.analyzer, params.truncate_length)
            df_ctr.update(set(_ngrams(units, params.analyzer, lo, hi)))
        vocab, idf = cls._select_vocab(list(df_ctr.items()), params, n_doc)
        return cls(params, vocab, idf)

    @classmethod
    def train_file(cls, path: str, params: TfidfBaseParams, chunk_docs: int = 65536) -> "_TfidfBase":
        """Streaming train from a text file, one line per document: only
        ``chunk_docs`` documents are resident at a time (the reference trains
        TF-IDF from file through a bounded producer/consumer buffer,
        tfidf.hpp:982-1126).  DF counts and first-seen token strings
        accumulate across chunks; vocabulary selection runs once at the end,
        so the result is bit-identical to in-memory train on the same lines.
        """
        lo, hi = params.ngram_range

        def chunks():
            buf = []
            with open(path, encoding="utf-8") as f:
                for line in f:
                    buf.append(line.rstrip("\n"))
                    if len(buf) >= chunk_docs:
                        yield buf
                        buf = []
            if buf:
                yield buf

        if _load_tok_lib() is None:
            # pure-Python streaming fallback: Counter accumulation per chunk
            df_ctr: Counter = Counter()
            n_doc = 0
            for chunk in chunks():
                n_doc += len(chunk)
                for text in chunk:
                    units = _tokenize(text, params.analyzer, params.truncate_length)
                    df_ctr.update(set(_ngrams(units, params.analyzer, lo, hi)))
            vocab, idf = cls._select_vocab(list(df_ctr.items()), params, n_doc)
            return cls(params, vocab, idf)

        n_doc = 0
        acc_h = np.zeros(0, np.uint64)  # sorted unique hashes seen so far
        acc_df = np.zeros(0, np.int64)  # aligned document frequencies
        acc_blob = bytearray()  # first-seen token strings, insertion order
        acc_offs: list = [0]
        acc_str_h: list = []  # hash arrays aligned with stored strings
        for chunk in chunks():
            n_doc += len(chunk)
            _, hashes, _, (blob, soffs, shash, _sdfs) = _native_count(
                chunk, params.analyzer, lo, hi, params.truncate_length, want_strings=True
            )
            uh, df = np.unique(hashes, return_counts=True)
            if len(uh) != len(shash):
                # 64-bit FNV collision inside this chunk (~V^2/2^64 odds):
                # restart with the exact in-memory path, which resolves
                # collisions through real token strings
                logging.getLogger(__name__).warning(
                    "tfidf hash collision during streaming train; re-training in memory"
                )
                with open(path, encoding="utf-8") as f:
                    return cls.train([line.rstrip("\n") for line in f], params)
            # accumulate dfs for known hashes; collect the rest as new
            pos = np.searchsorted(acc_h, uh)
            safe = np.minimum(pos, max(len(acc_h) - 1, 0))
            found = (pos < len(acc_h)) & (acc_h[safe] == uh) if len(acc_h) else np.zeros(len(uh), bool)
            acc_df[pos[found]] += df[found]
            # store strings for first-seen hashes (shash is first-occurrence order)
            spos = np.searchsorted(acc_h, shash)
            ssafe = np.minimum(spos, max(len(acc_h) - 1, 0))
            s_new = ~((spos < len(acc_h)) & (acc_h[ssafe] == shash)) if len(acc_h) else np.ones(len(shash), bool)
            new_idx = np.nonzero(s_new)[0]
            if len(new_idx):
                lens = (soffs[new_idx + 1] - soffs[new_idx]).astype(np.int64)
                src = np.frombuffer(blob, np.uint8)
                within = np.arange(lens.sum()) - np.repeat(np.cumsum(lens) - lens, lens)
                acc_blob += src[np.repeat(soffs[new_idx], lens) + within].tobytes()
                base = acc_offs[-1]
                acc_offs.extend((base + np.cumsum(lens)).tolist())
                acc_str_h.append(shash[new_idx])
                # merge the new hashes into the sorted accumulator
                order = np.argsort(shash[new_idx])
                nh = shash[new_idx][order]
                ndf = df[np.searchsorted(uh, nh)]
                merged_h = np.concatenate([acc_h, nh])
                merged_df = np.concatenate([acc_df, ndf])
                morder = np.argsort(merged_h, kind="stable")
                acc_h, acc_df = merged_h[morder], merged_df[morder]
        if not n_doc:
            return cls(params, {}, np.zeros(0, np.float32))
        str_h = np.concatenate(acc_str_h) if acc_str_h else np.zeros(0, np.uint64)
        df_of_token = acc_df[np.searchsorted(acc_h, str_h)] if len(acc_h) else np.zeros(0, np.int64)
        return cls._from_native_vocab(
            params, bytes(acc_blob), np.asarray(acc_offs, np.int64), str_h, df_of_token, n_doc
        )

    @property
    def nr_features(self) -> int:
        if self._vocab is None and self._tok_storage is not None:
            return len(self._tok_storage[1]) - 1
        return len(self._vocab)

    def _hash_lookup_tables(self):
        if self._hash_sorted is None:
            h = _hash_tokens(list(self.vocab.keys()))
            order = np.argsort(h)
            self._hash_sorted = h[order]
            self._col_sorted = np.fromiter(self.vocab.values(), np.int64, len(self.vocab))[order]
        return self._hash_sorted, self._col_sorted

    def _lookup_cols(self, hashes: np.ndarray) -> np.ndarray:
        """hash -> column id (-1 when absent), via the C++ open-addressing
        table (one probe beats a 22-step binary search per n-gram; the table
        is built once per model and cached)."""
        hs, cs = self._hash_lookup_tables()
        lib = _load_tok_lib()
        if lib is None or not len(hs):
            if not len(hs):
                return np.full(len(hashes), -1, np.int64)
            pos = np.minimum(np.searchsorted(hs, hashes), len(hs) - 1)
            return np.where(hs[pos] == hashes, cs[pos], -1)
        handle = getattr(self, "_lookup_handle", None)
        if handle is None:
            u64p = ctypes.POINTER(ctypes.c_uint64)
            hs = np.ascontiguousarray(hs, np.uint64)
            raw = lib.tok_lookup_build(hs.ctypes.data_as(u64p), len(hs))
            handle = self._lookup_handle = ctypes.c_void_p(raw)
            # keep table order alive for value translation
            self._lookup_cols_arr = np.ascontiguousarray(cs, np.int64)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        q = np.ascontiguousarray(hashes, np.uint64)
        out = np.zeros(len(q), np.int64)
        lib.tok_lookup(handle, q.ctypes.data_as(u64p), len(q), out.ctypes.data_as(i64p))
        found = out >= 0
        out[found] = self._lookup_cols_arr[out[found]]
        return out

    def __del__(self):
        handle = getattr(self, "_lookup_handle", None)
        if handle is not None and _tok_lib is not None:
            try:
                _tok_lib.tok_lookup_free(handle)
            except Exception:
                pass

    def __getstate__(self):
        # the native lookup table is a ctypes handle (unpicklable); it and
        # the derived caches rebuild lazily on first predict after unpickle
        state = dict(self.__dict__)
        for k in ("_lookup_handle", "_lookup_cols_arr"):
            state.pop(k, None)
        return state

    def predict(self, corpus: Sequence[str]) -> smat.csr_matrix:
        p = self.params
        lo, hi = p.ngram_range
        if _load_tok_lib() is not None:
            doc_indptr, hashes, counts = _native_count(
                corpus, p.analyzer, lo, hi, p.truncate_length, want_strings=False
            )
            mapped = self._lookup_cols(hashes)
            valid = mapped >= 0
            cols = mapped[valid]
            tf = counts[valid].astype(np.float32)
            rows = _flat_rows(np.diff(doc_indptr))[valid]
            if p.binary:
                tf = np.ones_like(tf)
            elif p.sublinear_tf:
                tf = 1.0 + np.log(tf)
            vals = tf * self.idf[cols] if p.use_idf else tf
            X = smat.csr_matrix(
                (vals, (rows, cols)), shape=(len(corpus), self.nr_features)
            )
        else:
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
        chunk_docs = int(config.pop("chunk_docs", 65536))
        base_cfgs = config.pop("base_vect_configs", None)
        if base_cfgs is None:
            base_cfgs = [config] if config else [{}]
        params = [
            TfidfBaseParams.from_dict({**bc, "norm": bc.get("norm", norm)}) for bc in base_cfgs
        ]
        if isinstance(trn_corpus, str):
            # file input trains through the streaming path: one bounded chunk
            # of lines resident at a time (reference tfidf.hpp:982-1126)
            bases = [_TfidfBase.train_file(trn_corpus, p, chunk_docs=chunk_docs) for p in params]
        else:
            corpus = cls._as_corpus(trn_corpus)
            bases = [_TfidfBase.train(corpus, p) for p in params]
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
