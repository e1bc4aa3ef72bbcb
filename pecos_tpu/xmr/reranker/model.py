"""XMR reranker: two-tower (text + numeric) scoring model.

Reference: pecos/xmr/reranker/model.py (TextNumrEncoder :174-300 — HF text
tower + numeric MLP tower + score head; RankingModel :302-880) and
trainer.py:28-238 (pointwise / pairwise / listwise losses).

TPU re-design: the text tower is a Flax HF encoder, the numeric tower a small
MLP expressed as plain parameter pytrees, and a training step (encoder fwd +
tower concat + head + loss + adamw) is one jitted function.  The HF-Trainer /
DeepSpeed machinery of the reference collapses into an optax loop; multi-chip
data parallelism comes from jit sharding over the (dp,) mesh axis instead of
ZeRO/NCCL.
"""

from __future__ import annotations

import dataclasses as dc
import json
import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import pecos_tpu
from pecos_tpu.xmc.xtransformer import network
from pecos_tpu.xmc.xtransformer.module import tokenize_corpus

LOGGER = logging.getLogger(__name__)


def _mlp_init(rng, sizes: Sequence[int]) -> List[Dict[str, np.ndarray]]:
    layers = []
    for i in range(len(sizes) - 1):
        layers.append(
            {
                "w": (rng.standard_normal((sizes[i], sizes[i + 1])) * np.sqrt(2.0 / sizes[i])).astype(
                    np.float32
                ),
                "b": np.zeros(sizes[i + 1], np.float32),
            }
        )
    return layers


def _mlp_apply(params, x):
    for i, layer in enumerate(params):
        x = jnp.dot(x, layer["w"], preferred_element_type=jnp.float32) + layer["b"]
        if i < len(params) - 1:
            x = jax.nn.gelu(x)
    return x


# ---------------------------------------------------------------------------
# LoRA adapters (reference dependency: peft, setup.py:99) — low-rank deltas on
# the attention projection kernels; the base encoder stays frozen
# ---------------------------------------------------------------------------


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def lora_target_paths(encoder_params, target_substrings: Sequence[str]) -> List[str]:
    """Paths of 2-D kernel leaves whose path mentions a target projection."""
    flat = jax.tree_util.tree_flatten_with_path(encoder_params)[0]
    out = []
    for path, leaf in flat:
        p = _path_str(path)
        if (
            hasattr(leaf, "ndim")
            and leaf.ndim == 2
            and p.endswith("kernel")
            and any(t in p for t in target_substrings)
        ):
            out.append(p)
    return sorted(out)


def lora_init(encoder_params, paths: Sequence[str], rank: int, seed: int = 0):
    """A ~ N(0, 0.02), B = 0 per target kernel (delta starts at exactly 0)."""
    rng = np.random.default_rng(seed)
    flat = {
        _path_str(p): leaf
        for p, leaf in jax.tree_util.tree_flatten_with_path(encoder_params)[0]
    }
    adapters = {}
    for p in paths:
        d_in, d_out = flat[p].shape
        adapters[p] = {
            "a": (rng.standard_normal((d_in, rank)) * 0.02).astype(np.float32),
            "b": np.zeros((rank, d_out), np.float32),
        }
    return adapters


def lora_apply(encoder_params, adapters, alpha: float):
    """Rebuild the encoder tree with kernel' = W + (alpha/r) A@B."""
    if not adapters:
        return encoder_params
    rank = next(iter(adapters.values()))["a"].shape[1]
    scale = alpha / max(rank, 1)

    flat, treedef = jax.tree_util.tree_flatten_with_path(encoder_params)
    new_leaves = []
    for path, leaf in flat:
        p = _path_str(path)
        if p in adapters:
            ab = adapters[p]
            leaf = leaf + scale * jnp.dot(
                ab["a"], ab["b"], preferred_element_type=jnp.float32
            )
        new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class TextNumrEncoder(pecos_tpu.BaseClass):
    """Text tower (Flax encoder) + numeric MLP tower + linear score head."""

    def __init__(self, encoder, tokenizer, numr_params, head_params, numr_dim: int):
        self.encoder = encoder
        self.tokenizer = tokenizer
        self.numr_params = numr_params  # list of {"w","b"} or None
        self.head_params = head_params  # {"w": (H_cat, 1), "b": (1,)}
        self.numr_dim = numr_dim

    @property
    def hidden_size(self):
        cfg = self.encoder.config
        return cfg.dim if hasattr(cfg, "dim") else cfg.hidden_size


class RankingModel(pecos_tpu.BaseClass):
    @dc.dataclass
    class TrainParams(pecos_tpu.BaseParams):
        model_type: str = "distilbert"
        model_shortcut: str = "distilbert-base-uncased"
        model_config: Optional[dict] = None
        numr_hidden: Tuple[int, ...] = (64,)
        truncate_length: int = 64
        batch_size: int = 16
        learning_rate: float = 5e-5
        weight_decay: float = 0.01
        num_train_epochs: int = 1
        max_steps: int = 0
        loss_fn: str = "pointwise"  # pointwise | pairwise | listwise
        pairwise_margin: float = 0.3
        group_size: int = 4  # candidates per query for pairwise/listwise
        # LoRA (reference peft role): rank 0 = full fine-tune; rank > 0
        # freezes the encoder and trains low-rank attention-kernel deltas
        lora_rank: int = 0
        lora_alpha: float = 16.0
        lora_targets: Tuple[str, ...] = ("q_lin", "v_lin", "query", "value")
        seed: int = 0

    @dc.dataclass
    class PredParams(pecos_tpu.BaseParams):
        batch_size: int = 64
        truncate_length: int = 64

    def __init__(self, enc: TextNumrEncoder, train_params=None, pred_params=None):
        self.enc = enc
        self.train_params = self.TrainParams.from_dict(train_params)
        self.pred_params = self.PredParams.from_dict(pred_params)

    # ------------------------------------------------------------------ setup
    @classmethod
    def init_model(cls, train_params: "RankingModel.TrainParams", numr_dim: int) -> "RankingModel":
        from pecos_tpu.xmc.xtransformer.matcher import TransformerMatcher

        tp = TransformerMatcher.TrainParams(
            model_type=train_params.model_type,
            model_shortcut=train_params.model_shortcut,
            model_config=train_params.model_config,
            seed=train_params.seed,
        )
        encoder, tokenizer = TransformerMatcher.download_model(tp)
        cfg = encoder.config
        hidden = cfg.dim if hasattr(cfg, "dim") else cfg.hidden_size
        rng = np.random.default_rng(train_params.seed)
        numr_params = (
            _mlp_init(rng, (numr_dim, *train_params.numr_hidden)) if numr_dim > 0 else None
        )
        cat = hidden + (train_params.numr_hidden[-1] if numr_dim > 0 else 0)
        head = {"w": (rng.standard_normal((cat, 1)) * 0.02).astype(np.float32), "b": np.zeros(1, np.float32)}
        return cls(TextNumrEncoder(encoder, tokenizer, numr_params, head, numr_dim), train_params)

    # ------------------------------------------------------------------ losses
    @staticmethod
    def _loss(logits, labels, kind: str, margin: float):
        """logits/labels (B, G): G candidates per query row."""
        if kind == "pointwise":
            return jnp.mean((jax.nn.sigmoid(logits) - labels) ** 2)
        elif kind == "pairwise":
            # hinge on all intra-group pairs ordered by label
            li = logits[:, :, None] - logits[:, None, :]  # (B, G, G)
            yi = labels[:, :, None] - labels[:, None, :]
            mask = (yi > 0).astype(jnp.float32)
            viol = jnp.maximum(margin - li, 0.0) * mask
            return jnp.sum(viol) / jnp.maximum(jnp.sum(mask), 1.0)
        elif kind == "listwise":
            # softmax cross entropy against normalized relevance
            p = labels / jnp.maximum(labels.sum(axis=1, keepdims=True), 1e-6)
            logp = jax.nn.log_softmax(logits, axis=1)
            return -jnp.mean(jnp.sum(p * logp, axis=1))
        raise ValueError(kind)

    # ------------------------------------------------------------------ train
    @classmethod
    def _training_context(cls, train_params, numr_dim: int):
        """Model init + optimizer + the jitted train step, shared by the
        in-memory and parquet-streaming training entry points."""
        import optax

        self = cls.init_model(train_params, numr_dim)
        enc = self.enc
        G = train_params.group_size if train_params.loss_fn != "pointwise" else 1
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(train_params.learning_rate, weight_decay=train_params.weight_decay),
        )
        use_lora = train_params.lora_rank > 0
        frozen_enc = None
        if use_lora:
            target_paths = lora_target_paths(enc.encoder.params, train_params.lora_targets)
            if not target_paths:
                raise ValueError(
                    f"no LoRA target kernels matched {train_params.lora_targets} "
                    "in the encoder parameter tree"
                )
            LOGGER.info("LoRA rank %d on %d kernels", train_params.lora_rank, len(target_paths))
            frozen_enc = jax.tree.map(jnp.asarray, enc.encoder.params)
            params = {
                "lora": jax.tree.map(
                    jnp.asarray,
                    lora_init(
                        enc.encoder.params, target_paths, train_params.lora_rank,
                        seed=train_params.seed,
                    ),
                ),
                "numr": jax.tree.map(jnp.asarray, enc.numr_params) if enc.numr_params else None,
                "head": jax.tree.map(jnp.asarray, enc.head_params),
            }
        else:
            params = {
                "encoder": enc.encoder.params,
                "numr": jax.tree.map(jnp.asarray, enc.numr_params) if enc.numr_params else None,
                "head": jax.tree.map(jnp.asarray, enc.head_params),
            }
        opt_state = tx.init(params)
        encoder = enc.encoder
        kind, margin = train_params.loss_fn, train_params.pairwise_margin
        lora_alpha = train_params.lora_alpha

        @jax.jit
        def train_step(params, opt_state, batch, key):
            def loss_fn(p):
                enc_params = (
                    lora_apply(frozen_enc, p["lora"], lora_alpha)
                    if use_lora
                    else p["encoder"]
                )
                out = encoder(
                    input_ids=batch["input_ids"],
                    attention_mask=batch["attention_mask"],
                    params=enc_params,
                    dropout_rng=key,
                    train=True,
                )
                emb = network.pooled_embedding(out, batch["attention_mask"])
                if p["numr"] is not None:
                    nm = _mlp_apply(p["numr"], batch["numr"])
                    emb = jnp.concatenate([emb, nm], axis=1)
                logits = (jnp.dot(emb, p["head"]["w"]) + p["head"]["b"])[:, 0]
                bsz = logits.shape[0] // G
                return cls._loss(
                    logits.reshape(bsz, G), batch["labels"].reshape(bsz, G), kind, margin
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        def finalize(params):
            if use_lora:
                # bake the low-rank deltas into the encoder weights: predict,
                # save and load then work on the merged model unchanged
                enc.encoder.params = jax.device_get(
                    lora_apply(frozen_enc, params["lora"], lora_alpha)
                )
            else:
                enc.encoder.params = jax.device_get(params["encoder"])
            if params["numr"] is not None:
                enc.numr_params = jax.device_get(params["numr"])
            enc.head_params = jax.device_get(params["head"])
            return self

        return self, enc, G, params, opt_state, train_step, finalize

    @classmethod
    def _run_epoch_batches(
        cls, train_step, params, opt_state, key, toks, labels, numeric_feats,
        G: int, B: int, rng, total: int, step: int,
    ):
        """Shuffled group-batched pass over one (tokenized) data block."""
        N = labels.shape[0]
        groups = np.arange(N // G)
        rng.shuffle(groups)
        for s in range(0, len(groups) * G - B + 1, B) if N >= B else [0]:
            gsel = groups[s // G : s // G + B // G]
            idx = (gsel[:, None] * G + np.arange(G)[None, :]).ravel()
            if len(idx) < B:
                idx = np.concatenate([idx, idx[: B - len(idx)]])
            batch = {
                "input_ids": jnp.asarray(toks["input_ids"][idx]),
                "attention_mask": jnp.asarray(toks["attention_mask"][idx]),
                "labels": jnp.asarray(labels[idx]),
                "numr": jnp.asarray(numeric_feats[idx]) if numeric_feats is not None else None,
            }
            key, sub = jax.random.split(key)
            params, opt_state, loss = train_step(params, opt_state, batch, sub)
            step += 1
            if step % 20 == 0:
                LOGGER.info(f"reranker step {step}/{total} loss={float(loss):.5f}")
            if step >= total:
                break
        return params, opt_state, key, step

    @classmethod
    def train(
        cls,
        inputs: Sequence[str],  # B*G flattened "query [SEP] item" texts
        labels: np.ndarray,  # (B*G,) relevance in [0, 1]
        numeric_feats: Optional[np.ndarray] = None,  # (B*G, F)
        train_params=None,
        pred_params=None,
        **kwargs,
    ) -> "RankingModel":
        train_params = cls.TrainParams.from_dict(train_params)
        train_params.override_with_kwargs(kwargs)
        numr_dim = numeric_feats.shape[1] if numeric_feats is not None else 0
        self, enc, G, params, opt_state, train_step, finalize = cls._training_context(
            train_params, numr_dim
        )
        N = len(inputs)
        if N % G:
            raise ValueError(f"inputs length {N} not divisible by group_size {G}")
        toks = tokenize_corpus(enc.tokenizer, inputs, train_params.truncate_length)
        labels = np.asarray(labels, np.float32)
        B = max(G, (train_params.batch_size // G) * G)
        steps_per_epoch = max(1, N // B)
        total = train_params.max_steps or steps_per_epoch * train_params.num_train_epochs
        rng = np.random.default_rng(train_params.seed)
        key = jax.random.PRNGKey(train_params.seed)
        step = 0
        for _epoch in range(max(1, train_params.num_train_epochs)):
            params, opt_state, key, step = cls._run_epoch_batches(
                train_step, params, opt_state, key, toks, labels, numeric_feats,
                G, B, rng, total, step,
            )
            if step >= total:
                break
        return finalize(params)

    @classmethod
    def train_streaming(
        cls,
        shard_paths: Sequence[str],
        query_col: str = "query",
        item_col: str = "item",
        label_col: str = "relevance",
        train_params=None,
        pred_params=None,
        **kwargs,
    ) -> "RankingModel":
        """Train from parquet shards one shard at a time — only the current
        shard's rows are tokenized and resident (the reference streams shards
        through HF datasets, reranker/data_utils.py:268-299).  Groups must not
        straddle shard boundaries: each shard's row count must be divisible by
        group_size (how the reference lays out its grouped parquet data)."""
        train_params = cls.TrainParams.from_dict(train_params)
        train_params.override_with_kwargs(kwargs)
        self, enc, G, params, opt_state, train_step, finalize = cls._training_context(
            train_params, 0
        )
        n_total = RankingDataUtils.get_parquet_rows(shard_paths)
        B = max(G, (train_params.batch_size // G) * G)
        steps_per_epoch = max(1, n_total // B)
        total = train_params.max_steps or steps_per_epoch * train_params.num_train_epochs
        rng = np.random.default_rng(train_params.seed)
        key = jax.random.PRNGKey(train_params.seed)
        step = 0
        for _epoch in range(max(1, train_params.num_train_epochs)):
            for df in RankingDataUtils.iter_parquet_shards(shard_paths):
                inputs, labels = RankingDataUtils.build_pairs(
                    df, query_col=query_col, item_col=item_col, label_col=label_col
                )
                if len(inputs) % G:
                    raise ValueError(
                        f"shard rows ({len(inputs)}) not divisible by group_size {G}"
                    )
                toks = tokenize_corpus(enc.tokenizer, inputs, train_params.truncate_length)
                params, opt_state, key, step = cls._run_epoch_batches(
                    train_step, params, opt_state, key, toks, labels, None,
                    G, B, rng, total, step,
                )
                if step >= total:
                    break
            if step >= total:
                break
        return finalize(params)

    # ------------------------------------------------------------------ predict
    def predict(self, inputs: Sequence[str], numeric_feats: Optional[np.ndarray] = None, **kwargs):
        pred_params = self.PredParams.from_dict(self.pred_params)
        pred_params.override_with_kwargs(kwargs)
        enc = self.enc
        toks = tokenize_corpus(enc.tokenizer, list(inputs), pred_params.truncate_length)
        N = toks["input_ids"].shape[0]
        B = pred_params.batch_size
        encoder = enc.encoder
        numr = jax.tree.map(jnp.asarray, enc.numr_params) if enc.numr_params else None
        head = jax.tree.map(jnp.asarray, enc.head_params)

        @jax.jit
        def fwd(ii, am, nm):
            out = encoder(input_ids=ii, attention_mask=am, train=False)
            emb = network.pooled_embedding(out, am)
            if numr is not None:
                emb = jnp.concatenate([emb, _mlp_apply(numr, nm)], axis=1)
            return (jnp.dot(emb, head["w"]) + head["b"])[:, 0]

        scores = []
        for s in range(0, N, B):
            ii = toks["input_ids"][s : s + B]
            am = toks["attention_mask"][s : s + B]
            nm = numeric_feats[s : s + B] if numeric_feats is not None else None
            pad = B - ii.shape[0]
            if pad:
                ii = np.vstack([ii, np.zeros((pad, ii.shape[1]), ii.dtype)])
                am = np.vstack([am, np.zeros((pad, am.shape[1]), am.dtype)])
                if nm is not None:
                    nm = np.vstack([nm, np.zeros((pad, nm.shape[1]), nm.dtype)])
            out = np.asarray(
                fwd(jnp.asarray(ii), jnp.asarray(am), jnp.asarray(nm) if nm is not None else None)
            )
            scores.append(out[: out.shape[0] - pad] if pad else out)
        return np.concatenate(scores) if scores else np.zeros(0, np.float32)

    # ------------------------------------------------------------------ persist
    def save(self, save_dir: str):
        os.makedirs(save_dir, exist_ok=True)
        self.enc.encoder.save_pretrained(os.path.join(save_dir, "encoder"))
        self.enc.tokenizer.save_pretrained(os.path.join(save_dir, "tokenizer"))
        towers = {"numr_dim": self.enc.numr_dim}
        np.savez(
            os.path.join(save_dir, "towers.npz"),
            head_w=self.enc.head_params["w"],
            head_b=self.enc.head_params["b"],
            **{
                f"numr{i}_{k}": v
                for i, layer in enumerate(self.enc.numr_params or [])
                for k, v in layer.items()
            },
        )
        param = self.append_meta(
            {
                "train_params": self.train_params.to_dict(),
                "pred_params": self.pred_params.to_dict(),
                "numr_dim": self.enc.numr_dim,
                "n_numr_layers": len(self.enc.numr_params or []),
            }
        )
        with open(os.path.join(save_dir, "param.json"), "w") as f:
            json.dump(param, f, indent=True)

    @classmethod
    def load(cls, load_dir: str) -> "RankingModel":
        import transformers

        with open(os.path.join(load_dir, "param.json")) as f:
            param = json.load(f)
        train_params = cls.TrainParams.from_dict(
            {k: v for k, v in param["train_params"].items() if k != "__meta__"}
        )
        _, model_cls, _ = network.resolve_encoder(train_params.model_type)
        encoder = model_cls.from_pretrained(os.path.join(load_dir, "encoder"))
        tokenizer = transformers.AutoTokenizer.from_pretrained(os.path.join(load_dir, "tokenizer"))
        z = np.load(os.path.join(load_dir, "towers.npz"))
        head = {"w": z["head_w"], "b": z["head_b"]}
        numr = [
            {"w": z[f"numr{i}_w"], "b": z[f"numr{i}_b"]}
            for i in range(param["n_numr_layers"])
        ] or None
        enc = TextNumrEncoder(encoder, tokenizer, numr, head, param["numr_dim"])
        pred_params = {k: v for k, v in param["pred_params"].items() if k != "__meta__"}
        return cls(enc, train_params=train_params, pred_params=pred_params)


class RankingDataUtils(object):
    """Parquet-sharded (query, item, relevance) data helpers
    (reference data_utils.py)."""

    @staticmethod
    def load_parquet(paths: Sequence[str]):
        import pandas as pd

        frames = [pd.read_parquet(p) for p in paths]
        return pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]

    @staticmethod
    def build_pairs(df, query_col="query", item_col="item", label_col="relevance", sep=" [SEP] "):
        inputs = (df[query_col].astype(str) + sep + df[item_col].astype(str)).tolist()
        labels = df[label_col].to_numpy(dtype=np.float32)
        return inputs, labels

    @staticmethod
    def _expand_paths(paths_or_folder) -> list:
        import glob
        import os

        if isinstance(paths_or_folder, str):
            if os.path.isdir(paths_or_folder):
                return sorted(glob.glob(os.path.join(paths_or_folder, "*.parquet")))
            return [paths_or_folder]
        return list(paths_or_folder)

    @classmethod
    def get_parquet_rows(cls, paths_or_folder) -> int:
        """Total row count from parquet footers only — no data read
        (reference data_utils.py:268-284)."""
        import pyarrow.parquet as pq

        return sum(
            pq.ParquetFile(p).metadata.num_rows for p in cls._expand_paths(paths_or_folder)
        )

    @classmethod
    def iter_parquet_shards(cls, paths_or_folder, columns=None):
        """Yield one DataFrame per parquet file — the streaming analog of the
        reference's HF-datasets streaming shards (data_utils.py:291-299):
        peak memory is one shard, not the corpus."""
        import pandas as pd

        for p in cls._expand_paths(paths_or_folder):
            yield pd.read_parquet(p, columns=columns)
