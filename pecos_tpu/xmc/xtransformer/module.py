"""Data containers for text XMC training.

Reference: pecos/xmc/xtransformer/module.py — MLProblemWithText (:24),
XMCTextTensorizer (:79), XMCLabelTensorizer (:135, per-instance active-label
sets padded with the padding label / subsampled to max_active_matching_labels).

TPU shape discipline: every batch is (input_ids, attention_mask, label_ids,
targets, costs) with static (B, seq_len) and (B, max_active) shapes; the
padding label (= nr_labels) carries zero cost.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np
import scipy.sparse as smat


@dataclasses.dataclass
class MLProblemWithText:
    """Text + (optionally) numerical features + labels for one training level."""

    X_text: Sequence[str]
    Y: smat.csr_matrix
    X_feat: Optional[smat.spmatrix] = None

    def __post_init__(self):
        self.Y = self.Y.tocsr()
        if len(self.X_text) != self.Y.shape[0]:
            raise ValueError("X_text and Y row count mismatch")

    @property
    def nr_labels(self):
        return self.Y.shape[1]


def tokenize_corpus(
    tokenizer, corpus: Sequence[str], truncate_length: int = 128, cache_dir: Optional[str] = None
):
    """Pre-tokenize the whole corpus into fixed-shape arrays.

    With ``cache_dir`` the arrays are persisted to an npz keyed by a content
    hash of (corpus, truncate_length, tokenizer class) — the analog of the
    reference's tokenized .pt shard cache (matcher.py:1329-1358)."""
    cache_path = None
    if cache_dir is not None:
        import hashlib
        import os

        h = hashlib.sha256()
        h.update(type(tokenizer).__name__.encode())
        h.update(str(truncate_length).encode())
        for t in corpus:
            h.update(t.encode("utf-8", "ignore"))
            h.update(b"\x00")
        cache_path = os.path.join(cache_dir, f"tokens_{h.hexdigest()[:24]}.npz")
        if os.path.exists(cache_path):
            z = np.load(cache_path)
            return {"input_ids": z["input_ids"], "attention_mask": z["attention_mask"]}
    enc = tokenizer(
        list(corpus),
        padding="max_length",
        truncation=True,
        max_length=truncate_length,
        return_tensors="np",
    )
    out = {
        "input_ids": enc["input_ids"].astype(np.int32),
        "attention_mask": enc["attention_mask"].astype(np.int32),
    }
    if cache_path is not None:
        import os

        os.makedirs(cache_dir, exist_ok=True)
        np.savez(cache_path, **out)
    return out


def build_active_label_batches(
    Y: smat.csr_matrix,
    M: Optional[smat.csr_matrix],
    R: Optional[smat.csr_matrix],
    max_active: int,
    pad_label: int,
    rng: np.random.Generator,
    Cp: float = 1.0,
    Cn: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-instance active label sets: positives from Y, negatives from M's
    matched clusters' labels (already expanded by the caller into label space),
    padded/subsampled to max_active (reference XMCLabelTensorizer :135).

    Returns (label_ids (N, max_active), targets (N, max_active) +-1,
    costs (N, max_active), 0 at padding).
    """
    N, L = Y.shape
    label_ids = np.full((N, max_active), pad_label, np.int32)
    targets = np.ones((N, max_active), np.float32)
    costs = np.zeros((N, max_active), np.float32)
    M = M.tocsr() if M is not None else None
    R = R.tocsr() if R is not None else None
    for i in range(N):
        pos = Y.indices[Y.indptr[i] : Y.indptr[i + 1]]
        if M is not None:
            cand = M.indices[M.indptr[i] : M.indptr[i + 1]]
            neg = np.setdiff1d(cand, pos, assume_unique=False)
        else:
            neg = np.setdiff1d(np.arange(L), pos)
        # keep all positives (subsample if they alone overflow), fill rest with negatives
        if len(pos) > max_active:
            pos = rng.choice(pos, size=max_active, replace=False)
        n_neg = max_active - len(pos)
        if len(neg) > n_neg:
            neg = rng.choice(neg, size=n_neg, replace=False)
        ids = np.concatenate([pos, neg])
        label_ids[i, : len(ids)] = ids
        targets[i, : len(pos)] = 1.0
        targets[i, len(pos) : len(ids)] = -1.0
        if R is not None and len(pos):
            rrow = R[i].toarray().ravel()
            costs[i, : len(pos)] = Cp * rrow[pos]
        else:
            costs[i, : len(pos)] = Cp
        costs[i, len(pos) : len(ids)] = Cn
    return label_ids, targets, costs
