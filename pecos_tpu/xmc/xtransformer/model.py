"""XTransformer: the 3-phase XR-Transformer recipe.

Reference: pecos/xmc/xtransformer/model.py:219-517 —
Phase 1: preliminary hierarchical label tree from PIFA(Y, X_feat);
Phase 2: recursive encoder fine-tuning down the tree (one TransformerMatcher
per resolution <= max_match_clusters, tfn/man negatives from the rolled Y
chain and the previous level's beam);
Phase 3: concat ranker — XLinearModel on [X_feat || l2norm(embeddings)] with a
refined clustering.

predict = encoder embeddings -> concat -> ranker beam search (:519-605);
encode returns embeddings (:606-660).
"""

from __future__ import annotations

import dataclasses as dc
import json
import logging
import os
from typing import Optional, Sequence

import numpy as np
import scipy.sparse as smat

import pecos_tpu
from pecos_tpu.utils import smat_util
from pecos_tpu.utils.cluster_util import ClusterChain
from pecos_tpu.xmc import Indexer, LabelEmbeddingFactory
from pecos_tpu.xmc.xlinear import XLinearModel
from .matcher import TransformerMatcher
from .module import MLProblemWithText

LOGGER = logging.getLogger(__name__)


class XTransformer(pecos_tpu.BaseClass):
    @dc.dataclass
    class TrainParams(pecos_tpu.BaseParams):
        do_fine_tune: bool = True
        only_encoder: bool = False
        max_match_clusters: int = 32768
        fix_clustering: bool = False
        matcher_params_chain: Optional[TransformerMatcher.TrainParams] = None
        ranker_params: Optional[XLinearModel.TrainParams] = None
        preliminary_indexer_params: Optional[dict] = None
        refined_indexer_params: Optional[dict] = None

    @dc.dataclass
    class PredParams(pecos_tpu.BaseParams):
        matcher_params_chain: Optional[TransformerMatcher.PredParams] = None
        ranker_params: Optional[XLinearModel.PredParams] = None
        ens_method: str = "transformer-only"  # parity field

    def __init__(self, text_encoder: TransformerMatcher, concat_model: Optional[XLinearModel]):
        self.text_encoder = text_encoder
        self.concat_model = concat_model

    @property
    def nr_labels(self):
        if self.concat_model is not None:
            return self.concat_model.nr_labels
        return self.text_encoder.nr_labels

    # ------------------------------------------------------------------ train
    @classmethod
    def train(
        cls,
        prob: MLProblemWithText,
        clustering: Optional[ClusterChain] = None,
        train_params=None,
        pred_params=None,
        **kwargs,
    ) -> "XTransformer":
        train_params = cls.TrainParams.from_dict(train_params)
        matcher_params = TransformerMatcher.TrainParams.from_dict(train_params.matcher_params_chain)
        Y = prob.Y.tocsc()
        X_feat = prob.X_feat

        # ---- phase 1: preliminary tree ---------------------------------------
        if clustering is None:
            if X_feat is not None:
                label_feat = LabelEmbeddingFactory.create(Y, X_feat, method="pifa")
            else:
                label_feat = LabelEmbeddingFactory.create(Y, method="pii")
            idx_kwargs = dict(train_params.preliminary_indexer_params or {})
            clustering = Indexer.gen(label_feat, **idx_kwargs)
        elif not isinstance(clustering, ClusterChain):
            clustering = ClusterChain(clustering)

        # ---- phase 2: recursive fine-tune ------------------------------------
        matcher = None
        M_pred = None
        trn_emb = None
        if train_params.do_fine_tune:
            # fine-tune at every level whose label space fits max_match_clusters
            Y_chain = [Y.tocsr()]
            for C in reversed(clustering[1:]):
                Y_chain.append((Y_chain[-1] @ C).tocsr())
            Y_chain.reverse()  # aligned with chain levels (labels at level d+1)
            levels = [
                d
                for d in range(len(clustering))
                if clustering[d].shape[0] <= train_params.max_match_clusters
            ]
            for li, d in enumerate(levels):
                Y_d = smat_util.binarized(Y_chain[d])
                C_d = clustering[d] if d > 0 else None
                LOGGER.info(
                    f"fine-tuning level {li+1}/{len(levels)} (labels={Y_d.shape[1]})"
                )
                level_prob = MLProblemWithText(prob.X_text, Y_d, X_feat=X_feat)
                matcher, M_pred, trn_emb = TransformerMatcher.train(
                    level_prob,
                    csr_codes=M_pred,
                    C=C_d,
                    train_params=matcher_params,
                    parent_matcher=matcher,
                )
        else:
            # frozen-encoder mode (reference model.py:271-303): load a saved
            # matcher (init_model_dir) or the pretrained encoder as-is — no
            # fine-tuning; its embeddings feed the phase-3 concat ranker
            mp = matcher_params if not isinstance(matcher_params, list) else matcher_params[0]
            mp = TransformerMatcher.TrainParams.from_dict(mp)
            if mp.init_model_dir:
                matcher = TransformerMatcher.load(mp.init_model_dir)
                LOGGER.info("loaded frozen encoder from %s", mp.init_model_dir)
            else:
                encoder, tokenizer = TransformerMatcher.download_model(mp)
                hidden = (
                    encoder.config.dim
                    if hasattr(encoder.config, "dim")
                    else encoder.config.hidden_size
                )
                from . import network

                head = network.XMCHead.random(Y.shape[1], hidden, seed=mp.seed)
                matcher = TransformerMatcher(
                    encoder,
                    tokenizer,
                    head,
                    train_params=mp,
                    pred_params=TransformerMatcher.PredParams(
                        truncate_length=mp.truncate_length
                    ),
                )
            if not train_params.only_encoder:
                _, trn_emb = matcher.predict(prob.X_text)

        if train_params.only_encoder:
            return cls(matcher, None)

        # ---- phase 3: concat ranker ------------------------------------------
        if trn_emb is None:
            _, trn_emb = matcher.predict(prob.X_text)
        emb_norm = smat_util.normalize(trn_emb, axis=1, norm="l2")
        if X_feat is not None:
            X_cat = smat_util.hstack_csr([X_feat, smat.csr_matrix(emb_norm)])
        else:
            X_cat = smat.csr_matrix(emb_norm)
        if train_params.fix_clustering:
            refined = clustering
        else:
            label_feat = LabelEmbeddingFactory.create(Y, X_cat, method="pifa")
            refined = Indexer.gen(label_feat, **dict(train_params.refined_indexer_params or {}))
        ranker_params = train_params.ranker_params
        ranker = XLinearModel.train(
            X_cat, Y, C=refined, train_params=ranker_params, **kwargs
        )
        return cls(matcher, ranker)

    # ------------------------------------------------------------------ predict
    def encode(self, corpus: Sequence[str], **kwargs) -> np.ndarray:
        """Text embeddings from the fine-tuned encoder (reference :606-660)."""
        _, emb = self.text_encoder.predict(corpus, **kwargs)
        return emb

    def _concat_features(self, corpus, X_feat):
        emb = self.encode(corpus)
        emb_norm = smat_util.normalize(emb, axis=1, norm="l2")
        if X_feat is not None:
            return smat_util.hstack_csr([X_feat, smat.csr_matrix(emb_norm)])
        return smat.csr_matrix(emb_norm)

    def predict(
        self,
        corpus: Sequence[str],
        X_feat: Optional[smat.spmatrix] = None,
        ens_method: str = "concat-only",
        **kwargs,
    ) -> smat.csr_matrix:
        """ens_method: concat-only (default) | transformer-only | average |
        rank_average | sigmoid_average | softmax_average | round_robin —
        micro-ensembles the encoder's own scores with the concat ranker when
        both cover the full label space (reference matcher.py:535)."""
        if self.concat_model is None:
            P, _ = self.text_encoder.predict(corpus, **kwargs)
            return P
        if ens_method == "concat-only":
            X_cat = self._concat_features(corpus, X_feat)
            return self.concat_model.predict(X_cat, **kwargs)
        tfm_pred, emb = self.text_encoder.predict(
            corpus, only_topk=kwargs.get("only_topk", 20)
        )
        if tfm_pred.shape[1] != self.concat_model.nr_labels:
            raise ValueError(
                "transformer ensemble requires the matcher's last level to cover "
                f"the full label space ({tfm_pred.shape[1]} vs {self.concat_model.nr_labels})"
            )
        emb_norm = smat_util.normalize(emb, axis=1, norm="l2")
        if X_feat is not None:
            X_cat = smat_util.hstack_csr([X_feat, smat.csr_matrix(emb_norm)])
        else:
            X_cat = smat.csr_matrix(emb_norm)
        concat_pred = self.concat_model.predict(X_cat, **kwargs)
        return TransformerMatcher.ensemble_prediction(
            tfm_pred, concat_pred, kwargs.get("only_topk", 20), ens_method
        )

    # ------------------------------------------------------------------ persist
    def save(self, folder: str):
        os.makedirs(folder, exist_ok=True)
        param = self.append_meta(
            {"model": type(self).__name__, "has_ranker": self.concat_model is not None}
        )
        with open(os.path.join(folder, "param.json"), "w") as f:
            json.dump(param, f, indent=True)
        self.text_encoder.save(os.path.join(folder, "text_encoder"))
        if self.concat_model is not None:
            self.concat_model.save(os.path.join(folder, "concat_model"))

    @classmethod
    def load(cls, folder: str) -> "XTransformer":
        with open(os.path.join(folder, "param.json")) as f:
            param = json.load(f)
        text_encoder = TransformerMatcher.load(os.path.join(folder, "text_encoder"))
        concat_model = None
        if param.get("has_ranker"):
            concat_model = XLinearModel.load(os.path.join(folder, "concat_model"))
        return cls(text_encoder, concat_model)
