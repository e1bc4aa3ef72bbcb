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


class XMCTextDataset:
    """Sharded container of tokenized text + label/matching matrices.

    TPU redesign of the reference XMCTextDataset (module.py:369-466): the
    reference tokenizes lazily per __getitem__ under a torch DataLoader; here
    tokens are fixed-shape numpy arrays (the jit-friendly wire format), and
    the shard surface — get_shard(start, end), save(dir, num_shards),
    load(dir, shard) — matches the reference so multi-node trainers can stage
    one shard per worker.  Shards are npz + scipy npz (no pickle)."""

    def __init__(
        self,
        tokens: dict,
        Y: Optional[smat.csr_matrix] = None,
        M: Optional[smat.csr_matrix] = None,
        R: Optional[smat.csr_matrix] = None,
    ):
        n = tokens["input_ids"].shape[0]
        for mat, nm in ((Y, "Y"), (M, "M"), (R, "R")):
            if mat is not None and mat.shape[0] != n:
                raise ValueError(f"{nm} rows ({mat.shape[0]}) != instances ({n})")
        self.tokens = tokens
        self.Y = Y.tocsr() if Y is not None else None
        self.M = M.tocsr() if M is not None else None
        self.R = R.tocsr() if R is not None else None

    @classmethod
    def from_text(cls, tokenizer, corpus, truncate_length=128, Y=None, M=None, R=None, cache_dir=None):
        toks = tokenize_corpus(tokenizer, corpus, truncate_length, cache_dir=cache_dir)
        return cls(toks, Y=Y, M=M, R=R)

    def __len__(self):
        return self.tokens["input_ids"].shape[0]

    def get_shard(self, start: int, end: int) -> "XMCTextDataset":
        sl = slice(start, end)
        return self.__class__(
            {k: v[sl] for k, v in self.tokens.items()},
            Y=self.Y[sl] if self.Y is not None else None,
            M=self.M[sl] if self.M is not None else None,
            R=self.R[sl] if self.R is not None else None,
        )

    def save(self, save_dir: str, num_shards: Optional[int] = None, init_shard_idx: int = 0):
        import json
        import os

        from pecos_tpu.utils import smat_util

        num_shards = num_shards or 1
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "config.json"), "w") as f:
            json.dump(
                {
                    "model": self.__class__.__name__,
                    "num_shards": num_shards,
                    "num_instances": len(self),
                },
                f,
                indent=True,
            )
        chunk = (len(self) + num_shards - 1) // num_shards
        for sid in range(init_shard_idx, init_shard_idx + num_shards):
            shard = self.get_shard(chunk * sid, min(chunk * (sid + 1), len(self)))
            sdir = os.path.join(save_dir, str(sid))
            os.makedirs(sdir, exist_ok=True)
            np.savez(os.path.join(sdir, "tokens.npz"), **shard.tokens)
            for nm in ("Y", "M", "R"):
                mat = getattr(shard, nm)
                if mat is not None:
                    smat_util.save_matrix(os.path.join(sdir, f"{nm}.npz"), mat)

    @classmethod
    def get_data_stats(cls, load_dir: str) -> dict:
        import json

        with open(f"{load_dir}/config.json") as f:
            return json.load(f)

    @classmethod
    def load(cls, load_dir: str, shard: int = 0) -> "XMCTextDataset":
        import os

        from pecos_tpu.utils import smat_util

        nr = cls.get_data_stats(load_dir)["num_shards"]
        if shard >= nr:
            raise ValueError(f"shard#{shard} requested but only {nr} shards saved")
        sdir = os.path.join(load_dir, str(shard))
        z = np.load(os.path.join(sdir, "tokens.npz"))
        tokens = {k: z[k] for k in z.files}
        mats = {}
        for nm in ("Y", "M", "R"):
            p = os.path.join(sdir, f"{nm}.npz")
            mats[nm] = smat_util.load_matrix(p).tocsr() if os.path.exists(p) else None
        return cls(tokens, **mats)

    def label_batches(self, max_active: int, pad_label: int, rng, Cp: float = 1.0, Cn: float = 1.0):
        """Active-label arrays for this shard (see build_active_label_batches)."""
        if self.Y is None:
            raise ValueError("label_batches requires Y")
        return build_active_label_batches(
            self.Y, self.M, self.R, max_active, pad_label, rng, Cp=Cp, Cn=Cn
        )


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
