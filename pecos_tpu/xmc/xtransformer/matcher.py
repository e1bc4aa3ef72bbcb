"""TransformerMatcher: one fine-tuning level of XR-Transformer.

Reference: pecos/xmc/xtransformer/matcher.py (1496 LoC) — train() pipeline
(:1244-1496): tokenize + cache -> bootstrap head (linear on parent embeddings
or inherit via C) -> fine_tune_encoder (:942, AdamW + schedule + clipping,
squared-hinge on active label sets) -> predict training beam + embeddings.

TPU re-design: the whole training step (encoder forward, head gather-logits,
cost-weighted squared hinge, AdamW update) is ONE jitted function over static
(batch, seq_len, max_active) shapes; optax replaces torch AdamW; the Flax HF
encoder replaces the torch one.  Prediction batches encoder forwards and uses
the same static-shape candidate scoring as the linear stack.
"""

from __future__ import annotations

import dataclasses as dc
import json
import logging
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as smat

import pecos_tpu
from pecos_tpu.utils import smat_util
from pecos_tpu.xmc.postprocessor import PostProcessor
from . import network
from .module import MLProblemWithText, build_active_label_batches, tokenize_corpus

LOGGER = logging.getLogger(__name__)


class TransformerMatcher(pecos_tpu.BaseClass):
    @dc.dataclass
    class TrainParams(pecos_tpu.BaseParams):
        model_shortcut: str = "distilbert-base-uncased"
        model_type: str = "distilbert"
        model_config: Optional[dict] = None  # offline/random-init fallback
        negative_sampling: str = "tfn"
        loss_function: str = "squared-hinge"
        bootstrap_method: str = "inherit"  # inherit | linear | no-bootstrap
        truncate_length: int = 128
        batch_size: int = 32
        learning_rate: float = 5e-5
        weight_decay: float = 0.01
        warmup_steps: int = 0
        num_train_epochs: int = 1
        max_steps: int = 0
        max_active_matching_labels: int = 64
        max_grad_norm: float = 1.0
        gradient_accumulation_steps: int = 1
        save_steps: int = 0  # eval on val split + keep-best every N optimizer steps
        init_model_dir: str = ""  # warm start from a saved TransformerMatcher
        threshold: float = 0.1  # concat-model weight pruning
        cost_sensitive_ranker: bool = False
        Cp: float = 1.0
        Cn: float = 1.0
        seed: int = 0
        threads: int = -1  # parity only

    @dc.dataclass
    class PredParams(pecos_tpu.BaseParams):
        only_topk: int = 20
        post_processor: str = "noop"
        truncate_length: int = 128
        # transformer-only | concat-only | average | rank_average |
        # sigmoid_average | softmax_average | round_robin — any value other
        # than transformer-only trains a per-level concat MLModel on
        # [X_feat || embeddings] when X_feat is available (ref matcher.py:1420)
        ensemble_method: str = "transformer-only"

    def __init__(self, encoder, tokenizer, head: network.XMCHead, C=None, train_params=None, pred_params=None, concat_model=None):
        self.encoder = encoder
        self.tokenizer = tokenizer
        self.head = head
        self.C = C.tocsc() if C is not None else None
        self.train_params = self.TrainParams.from_dict(train_params)
        self.pred_params = self.PredParams.from_dict(pred_params)
        self.concat_model = concat_model

    @property
    def nr_labels(self):
        return self.head.nr_labels

    @property
    def hidden_size(self):
        return self.head.W.shape[1]

    # ------------------------------------------------------------------ setup
    @classmethod
    def download_model(cls, train_params: "TransformerMatcher.TrainParams"):
        """Load a pretrained Flax encoder + tokenizer, or build a random-init
        one from model_config when offline (zero-egress environments)."""
        config_cls, model_cls, tokenizer_cls = network.resolve_encoder(train_params.model_type)
        if train_params.model_config is not None:
            cfg = config_cls(**train_params.model_config)
            encoder = model_cls(cfg, seed=train_params.seed)
            vocab_file = train_params.model_config.get("vocab_file", None)
            if vocab_file:
                tokenizer = tokenizer_cls(vocab_file=vocab_file)
            else:
                raise ValueError("model_config requires 'vocab_file' for the tokenizer")
        else:
            import transformers

            try:
                encoder = model_cls.from_pretrained(train_params.model_shortcut)
            except (EnvironmentError, OSError):
                # a torch-only checkpoint directory (pytorch_model.bin, the
                # reference framework's native save format) has no flax
                # weights; retry converting the torch weights in-place
                encoder = model_cls.from_pretrained(
                    train_params.model_shortcut, from_pt=True
                )
            tokenizer = transformers.AutoTokenizer.from_pretrained(train_params.model_shortcut)
        return encoder, tokenizer

    # ------------------------------------------------------------------ train
    @classmethod
    def train(
        cls,
        prob: MLProblemWithText,
        csr_codes: Optional[smat.csr_matrix] = None,
        C: Optional[smat.spmatrix] = None,
        R: Optional[smat.spmatrix] = None,
        train_params=None,
        pred_params=None,
        parent_matcher: Optional["TransformerMatcher"] = None,
        val_prob: Optional[MLProblemWithText] = None,
        val_csr_codes: Optional[smat.csr_matrix] = None,
        mesh=None,
        **kwargs,
    ) -> Tuple["TransformerMatcher", smat.csr_matrix, np.ndarray]:
        """Fine-tune one level; returns (matcher, trn_pred, trn_embeddings).

        ``mesh``: optional jax Mesh with a "dp" axis — batches are sharded
        over it and XLA runs fully data-parallel fine-tuning with replicated
        params; AdamW moments shard over the same devices (the TPU
        replacement for the reference's DeepSpeed/NCCL + ZeRO stack,
        distributed/xmc/xtransformer, dist_trainer.py:163).

        ``val_prob`` + TrainParams.save_steps: every save_steps optimizer
        steps the validation P@1 is computed with the live parameters and the
        best snapshot is restored after training (reference checkpoint-best,
        matcher.py:1393-1398).
        """
        import optax

        train_params = cls.TrainParams.from_dict(train_params)
        train_params.override_with_kwargs(kwargs)
        pred_params = cls.PredParams.from_dict(pred_params)
        pred_params.truncate_length = train_params.truncate_length
        rng = np.random.default_rng(train_params.seed)

        if parent_matcher is None and train_params.init_model_dir:
            # warm start (reference matcher.py:104-106, :1304-1314)
            parent_matcher = cls.load(train_params.init_model_dir)
            LOGGER.info("warm start from %s", train_params.init_model_dir)
        if parent_matcher is not None:
            encoder, tokenizer = parent_matcher.encoder, parent_matcher.tokenizer
        else:
            encoder, tokenizer = cls.download_model(train_params)

        toks = tokenize_corpus(tokenizer, prob.X_text, train_params.truncate_length)
        N = toks["input_ids"].shape[0]
        L = prob.nr_labels
        hidden = encoder.config.dim if hasattr(encoder.config, "dim") else encoder.config.hidden_size

        # ---- head bootstrap (matcher.py:1360-1382) ---------------------------
        if (
            train_params.bootstrap_method == "inherit"
            and parent_matcher is not None
            and C is not None
        ):
            head = network.XMCHead.inherit(parent_matcher.head, C, seed=train_params.seed)
        elif train_params.bootstrap_method == "linear" and parent_matcher is not None:
            emb = parent_matcher._embed(toks)
            from pecos_tpu.xmc import MLModel, MLProblem

            boot_prob = MLProblem(np.asarray(emb, np.float32), prob.Y.tocsc())
            boot = MLModel.train(
                boot_prob, train_params=MLModel.TrainParams(threshold=0.0, max_newton_iter=8)
            )
            head = network.XMCHead.from_linear(np.asarray(boot.W.todense()))
        else:
            head = network.XMCHead.random(L, hidden, seed=train_params.seed)

        # ---- active label sets (tfn/man negatives in label space) -----------
        M_label = None
        if C is not None:
            # expand cluster-level negatives into label space via C
            M_cluster = (prob.Y @ C).tocsr() if csr_codes is None else csr_codes.tocsr()
            M_label = (M_cluster @ C.T.tocsr()).tocsr()
        label_ids, targets, costs = build_active_label_batches(
            prob.Y.tocsr(),
            M_label,
            R,
            max_active=min(train_params.max_active_matching_labels, L),
            pad_label=L,
            rng=rng,
            Cp=train_params.Cp,
            Cn=train_params.Cn,
        )

        # ---- optimizer + jitted step -----------------------------------------
        B = train_params.batch_size
        steps_per_epoch = max(1, N // B)
        total_steps = (
            train_params.max_steps
            if train_params.max_steps > 0
            else steps_per_epoch * train_params.num_train_epochs
        )
        warmup = max(train_params.warmup_steps, 1)
        decay = max(total_steps - warmup, 1)
        schedule = optax.join_schedules(
            [
                optax.linear_schedule(0.0, train_params.learning_rate, warmup),
                optax.linear_schedule(train_params.learning_rate, 0.0, decay),
            ],
            [warmup],
        )
        tx = optax.chain(
            optax.clip_by_global_norm(train_params.max_grad_norm),
            optax.adamw(schedule, weight_decay=train_params.weight_decay),
        )
        accum = max(1, train_params.gradient_accumulation_steps)
        if accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        params = {
            "encoder": encoder.params,
            "head": {"W": jnp.asarray(head.W), "b": jnp.asarray(head.b)},
        }
        opt_state = tx.init(params)
        if mesh is not None:
            # ZeRO-analog: shard optimizer moments across every mesh device;
            # params stay replicated (the role DeepSpeed ZeRO stage-1 plays
            # in the reference's dist_trainer.py:163)
            from pecos_tpu.parallel.mesh import shard_opt_state

            opt_state, n_sharded = shard_opt_state(opt_state, mesh)
            LOGGER.info("sharded %d optimizer-state leaves over the mesh", n_sharded)

        @jax.jit
        def train_step(params, opt_state, batch, dropout_key):
            def loss_fn(p):
                out = encoder(
                    input_ids=batch["input_ids"],
                    attention_mask=batch["attention_mask"],
                    params=p["encoder"],
                    dropout_rng=dropout_key,
                    train=True,
                )
                emb = network.pooled_embedding(out, batch["attention_mask"])
                logits = network.head_logits(
                    p["head"]["W"], p["head"]["b"], emb, batch["label_ids"]
                )
                return network.squared_hinge_loss(logits, batch["targets"], batch["costs"])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = mesh.shape["dp"] * mesh.shape.get("lp", 1)
            B = max(dp, (B // dp) * dp)  # batch divisible by the dp extent
            axes = ("dp", "lp") if "lp" in mesh.shape else ("dp",)
            batch_sharding = NamedSharding(mesh, P(axes))

        def to_dev(a):
            a = jnp.asarray(a)
            return jax.device_put(a, batch_sharding) if batch_sharding is not None else a

        # ---- optional validation scorer (checkpoint-best) --------------------
        val_toks = None
        if val_prob is not None and train_params.save_steps > 0:
            val_toks = tokenize_corpus(tokenizer, val_prob.X_text, train_params.truncate_length)
            Y_val = val_prob.Y.tocsr()

            @jax.jit
            def _val_scores(p, ii, am):
                out = encoder(
                    input_ids=ii, attention_mask=am, params=p["encoder"], train=False
                )
                emb = network.pooled_embedding(out, am)
                return jnp.dot(emb, p["head"]["W"][:L].T) + p["head"]["b"][:L][None, :]

            def val_p1(p) -> float:
                Nv = val_toks["input_ids"].shape[0]
                hits = 0
                for s in range(0, Nv, B):
                    ii = val_toks["input_ids"][s : s + B]
                    am = val_toks["attention_mask"][s : s + B]
                    pad = B - ii.shape[0]
                    if pad:
                        ii = np.vstack([ii, np.zeros((pad, ii.shape[1]), ii.dtype)])
                        am = np.vstack([am, np.zeros((pad, am.shape[1]), am.dtype)])
                    top1 = np.asarray(
                        jnp.argmax(_val_scores(p, jnp.asarray(ii), jnp.asarray(am)), axis=1)
                    )[: B - pad if pad else B]
                    rows = np.arange(s, s + len(top1))
                    hits += int(np.asarray(Y_val[rows, top1]).sum())
                return hits / max(Nv, 1)

        best_p1 = -1.0
        best_params = None
        key = jax.random.PRNGKey(train_params.seed)
        step = 0
        opt_steps = 0
        total_micro = total_steps * accum
        order = np.arange(N)
        done = False
        for epoch in range(max(1, train_params.num_train_epochs * accum)):
            rng.shuffle(order)
            for s in range(0, N - B + 1, B) if N >= B else [0]:
                idx = order[s : s + B]
                if len(idx) < B:  # static shapes: wrap-around pad
                    idx = np.concatenate(
                        [idx, np.resize(order, B - len(idx))]
                    )
                batch = {
                    "input_ids": to_dev(toks["input_ids"][idx]),
                    "attention_mask": to_dev(toks["attention_mask"][idx]),
                    "label_ids": to_dev(label_ids[idx]),
                    "targets": to_dev(targets[idx]),
                    "costs": to_dev(costs[idx]),
                }
                key, sub = jax.random.split(key)
                params, opt_state, loss = train_step(params, opt_state, batch, sub)
                step += 1
                opt_steps = step // accum
                if step % 50 == 0:
                    LOGGER.info(f"step {opt_steps}/{total_steps} loss={float(loss):.5f}")
                if (
                    val_toks is not None
                    and step % (train_params.save_steps * accum) == 0
                ):
                    p1 = val_p1(params)
                    LOGGER.info(f"val P@1 at step {opt_steps}: {p1:.4f}")
                    if p1 > best_p1:
                        best_p1 = p1
                        best_params = jax.device_get(params)
                if step >= total_micro:
                    done = True
                    break
            if done:
                break

        if best_params is not None:
            # final eval so the last steps can still win; then restore best
            p1 = val_p1(params)
            if p1 > best_p1:
                best_p1 = p1
            else:
                params = jax.tree_util.tree_map(jnp.asarray, best_params)
            LOGGER.info(f"best val P@1: {best_p1:.4f}")

        # write back trained params
        encoder.params = jax.device_get(params["encoder"])
        head = network.XMCHead(
            W=np.asarray(jax.device_get(params["head"]["W"])),
            b=np.asarray(jax.device_get(params["head"]["b"])),
        )
        matcher = cls(encoder, tokenizer, head, C=C, train_params=train_params, pred_params=pred_params)
        trn_pred, trn_emb = matcher.predict(prob.X_text, csr_codes=csr_codes)

        # ---- per-level concat model (reference matcher.py:1420-1452) ---------
        if (
            pred_params.ensemble_method != "transformer-only"
            and getattr(prob, "X_feat", None) is not None
        ):
            from pecos_tpu.xmc import MLModel, MLProblem

            X_cat = cls.concat_features(prob.X_feat, trn_emb)
            M_cluster = None
            if C is not None:
                M_cluster = csr_codes if csr_codes is not None else (prob.Y @ C).tocsr()
            R_rank = (
                smat_util.normalize(prob.Y.tocsr(), axis=1, norm="l1")
                if train_params.cost_sensitive_ranker
                else None
            )
            lprob = MLProblem(
                X_cat, prob.Y.tocsc(), C=C if M_cluster is not None else None,
                M=M_cluster, R=R_rank,
            )
            matcher.concat_model = MLModel.train(
                lprob, train_params=MLModel.TrainParams(threshold=train_params.threshold)
            )
            concat_pred = matcher.concat_model.predict(
                X_cat,
                csr_codes=csr_codes,
                only_topk=pred_params.only_topk,
                post_processor=pred_params.post_processor,
            )
            trn_pred = cls.ensemble_prediction(
                trn_pred, concat_pred, pred_params.only_topk, pred_params.ensemble_method
            )
        return matcher, trn_pred, trn_emb

    @staticmethod
    def concat_features(X_feat, emb: np.ndarray) -> smat.csr_matrix:
        """[X_feat || l2-normalized embeddings] (reference concat_features)."""
        emb_norm = smat_util.normalize(np.asarray(emb, np.float32), axis=1, norm="l2")
        if X_feat is None:
            return smat.csr_matrix(emb_norm)
        return smat_util.hstack_csr([X_feat.tocsr(), smat.csr_matrix(emb_norm)])

    # ------------------------------------------------------------------ predict
    def _embed(self, toks, batch_size: int = 64) -> np.ndarray:
        N = toks["input_ids"].shape[0]

        @jax.jit
        def fwd(ii, am):
            out = self.encoder(input_ids=ii, attention_mask=am, train=False)
            return network.pooled_embedding(out, am)

        embs = []
        for s in range(0, N, batch_size):
            ii = toks["input_ids"][s : s + batch_size]
            am = toks["attention_mask"][s : s + batch_size]
            pad = batch_size - ii.shape[0]
            if pad:
                ii = np.vstack([ii, np.zeros((pad, ii.shape[1]), ii.dtype)])
                am = np.vstack([am, np.zeros((pad, am.shape[1]), am.dtype)])
            e = np.asarray(fwd(jnp.asarray(ii), jnp.asarray(am)))
            embs.append(e[: e.shape[0] - pad] if pad else e)
        return np.vstack(embs) if embs else np.zeros((0, self.hidden_size), np.float32)

    def predict(
        self,
        corpus: Sequence[str],
        csr_codes: Optional[smat.csr_matrix] = None,
        pred_params=None,
        X_feat: Optional[smat.spmatrix] = None,
        **kwargs,
    ) -> Tuple[smat.csr_matrix, np.ndarray]:
        """Returns (pred_csr over this level's labels, pooled embeddings).

        With a trained concat_model, an X_feat argument and an ensembling
        pred_params.ensemble_method, the transformer scores are micro-ensembled
        with the concat model's (reference matcher.py:581-863)."""
        pred_params = self.get_pred_params() if pred_params is None else self.PredParams.from_dict(pred_params)
        pred_params.override_with_kwargs(kwargs)
        toks = tokenize_corpus(self.tokenizer, corpus, pred_params.truncate_length)
        emb = self._embed(toks)
        pp = PostProcessor.get(pred_params.post_processor)
        L = self.nr_labels
        scores = emb @ self.head.W[:L].T + self.head.b[:L][None, :]
        val = pp.transform_np(scores)
        if csr_codes is not None and self.C is not None:
            parents = self.C.tocsr().indices
            prior = np.asarray(csr_codes.todense())
            active = prior != 0
            val = pp.combiner_np(val, prior[:, parents])
            val = np.where(active[:, parents], val, -np.inf)
        P = smat_util.topk_csr_from_dense(
            np.where(np.isfinite(val), val, -1e30), pred_params.only_topk
        )
        if (
            self.concat_model is not None
            and pred_params.ensemble_method != "transformer-only"
        ):
            X_cat = self.concat_features(X_feat, emb)
            concat_pred = self.concat_model.predict(
                X_cat,
                csr_codes=csr_codes,
                only_topk=pred_params.only_topk,
                post_processor=pred_params.post_processor,
            )
            P = self.ensemble_prediction(
                P, concat_pred, pred_params.only_topk, pred_params.ensemble_method
            )
        return P, emb.astype(np.float32)

    def get_pred_params(self):
        import copy

        return copy.deepcopy(self.pred_params)

    @staticmethod
    def ensemble_prediction(
        transformer_pred_csr, concat_pred_csr, only_topk: int, ens_method: str
    ):
        """Micro-ensemble of transformer and concat-ranker predictions
        (reference matcher.py:535-579)."""
        if transformer_pred_csr.shape != concat_pred_csr.shape:
            raise ValueError("transformer/concat prediction shapes differ")
        if ens_method == "concat-only":
            out = concat_pred_csr
        elif ens_method == "transformer-only":
            out = transformer_pred_csr
        elif ens_method in ("average", "rank_average", "sigmoid_average", "softmax_average", "round_robin"):
            fn = getattr(smat_util.CsrEnsembler, ens_method.replace("-", "_"))
            out = fn(transformer_pred_csr.tocsr(), concat_pred_csr.tocsr())
        else:
            raise ValueError(f"unknown ens_method {ens_method!r}")
        return smat_util.sorted_csr(out.tocsr(), only_topk=only_topk)

    # ------------------------------------------------------------------ persist
    def save(self, folder: str):
        os.makedirs(folder, exist_ok=True)
        param = self.append_meta(
            {
                "model": type(self).__name__,
                "train_params": self.train_params.to_dict(),
                "pred_params": self.pred_params.to_dict(),
            }
        )
        with open(os.path.join(folder, "param.json"), "w") as f:
            json.dump(param, f, indent=True)
        self.encoder.save_pretrained(os.path.join(folder, "encoder"))
        self.tokenizer.save_pretrained(os.path.join(folder, "tokenizer"))
        np.savez(os.path.join(folder, "head.npz"), W=self.head.W, b=self.head.b)
        if self.C is not None:
            smat_util.save_matrix(os.path.join(folder, "C.npz"), self.C)
        if self.concat_model is not None:
            self.concat_model.save(os.path.join(folder, "concat_model"))

    @classmethod
    def load(cls, folder: str) -> "TransformerMatcher":
        import transformers

        with open(os.path.join(folder, "param.json")) as f:
            param = json.load(f)
        train_params = cls.TrainParams.from_dict(
            {k: v for k, v in param["train_params"].items() if k != "__meta__"}
        )
        _, model_cls, _ = network.resolve_encoder(train_params.model_type)
        try:
            encoder = model_cls.from_pretrained(os.path.join(folder, "encoder"))
        except (EnvironmentError, OSError):
            # torch-only checkpoint (e.g. saved by the reference framework):
            # convert the torch weights to flax on load
            encoder = model_cls.from_pretrained(
                os.path.join(folder, "encoder"), from_pt=True
            )
        tokenizer = transformers.AutoTokenizer.from_pretrained(os.path.join(folder, "tokenizer"))
        z = np.load(os.path.join(folder, "head.npz"))
        head = network.XMCHead(W=z["W"], b=z["b"])
        C_path = os.path.join(folder, "C.npz")
        C = smat_util.load_matrix(C_path) if os.path.exists(C_path) else None
        pred_params = {
            k: v for k, v in param["pred_params"].items() if k != "__meta__"
        }
        concat_model = None
        if os.path.isdir(os.path.join(folder, "concat_model")):
            from pecos_tpu.xmc import MLModel

            concat_model = MLModel.load(os.path.join(folder, "concat_model"))
        return cls(
            encoder, tokenizer, head, C=C, train_params=train_params,
            pred_params=pred_params, concat_model=concat_model,
        )
