"""XLinearModel: user-facing facade over HierarchicalMLModel.

API parity with the reference (pecos/xmc/xlinear/model.py:24-550): train
modes full-model / matcher / ranker, relevance modes disable / induce /
ranker-only, directory save layout ``param.json`` + ``ranker/``.
"""

from __future__ import annotations

import dataclasses as dc
import json
import os
from typing import Optional

import numpy as np
import scipy.sparse as smat

import pecos_tpu
from pecos_tpu.utils import smat_util
from pecos_tpu.utils.cluster_util import ClusterChain
from pecos_tpu.xmc import HierarchicalMLModel, MLModel, MLProblem


class XLinearModel(pecos_tpu.BaseClass):
    """Hierarchical linear model for extreme multi-label classification."""

    @dc.dataclass
    class TrainParams(pecos_tpu.BaseParams):
        mode: str = "full-model"
        ranker_level: int = 1
        nr_splits: int = 16
        min_codes: Optional[int] = None
        shallow: bool = False
        rel_mode: str = "disable"
        rel_norm: str = "no-norm"
        hlm_args: Optional[HierarchicalMLModel.TrainParams] = None

    @dc.dataclass
    class PredParams(pecos_tpu.BaseParams):
        hlm_args: Optional[HierarchicalMLModel.PredParams] = None

        def override_with_kwargs(self, pred_kwargs):
            if self.hlm_args is not None:
                self.hlm_args.override_with_kwargs(pred_kwargs)
            return self

    def __init__(self, model: Optional[HierarchicalMLModel] = None):
        self.model = model

    @property
    def nr_labels(self):
        return self.model.nr_labels

    # -- persistence ---------------------------------------------------------------
    def save(self, model_folder: str):
        os.makedirs(model_folder, exist_ok=True)
        param = self.append_meta({})
        with open(os.path.join(model_folder, "param.json"), "w", encoding="utf-8") as f:
            f.write(json.dumps(param, indent=True))
        self.model.save(os.path.join(model_folder, "ranker"))

    @classmethod
    def load(cls, model_folder: str, is_predict_only: bool = False, **kwargs) -> "XLinearModel":
        compiled_dir = os.path.join(model_folder, "compiled")
        if is_predict_only and os.path.exists(os.path.join(compiled_dir, "compiled.json")):
            from pecos_tpu.xmc.base import PredictOnlyHierModel
            from pecos_tpu.xmc.inference import load_compiled_layers

            return cls(PredictOnlyHierModel(load_compiled_layers(compiled_dir)))
        model = HierarchicalMLModel.load(
            os.path.join(model_folder, "ranker"), is_predict_only, **kwargs
        )
        return cls(model)

    @classmethod
    def compile_mmap_model(cls, npz_folder: str, mmap_folder: str):
        """Compile the saved model into the fast predict-only layout
        (reference xlinear/model.py:137: compile_mmap_model)."""
        from pecos_tpu.xmc.inference import save_compiled_layers

        model = cls.load(npz_folder)
        compiled = model.model._get_compiled()
        os.makedirs(mmap_folder, exist_ok=True)
        save_compiled_layers(
            compiled.layers,
            compiled.bias,
            compiled.nr_features,
            os.path.join(mmap_folder, "compiled"),
        )
        with open(os.path.join(mmap_folder, "param.json"), "w", encoding="utf-8") as f:
            f.write(json.dumps(cls.append_meta({}), indent=True))

    @staticmethod
    def load_feature_matrix(path: str, dtype=np.float32):
        return smat_util.load_feature_matrix(path, dtype=dtype)

    @staticmethod
    def load_label_matrix(path: str, dtype=np.float32):
        return smat_util.load_label_matrix(path, dtype=dtype)

    # -- training ------------------------------------------------------------------
    @classmethod
    def train(
        cls,
        X,
        Y,
        C=None,
        R=None,
        user_supplied_negatives=None,
        train_params: Optional["XLinearModel.TrainParams"] = None,
        pred_params: Optional["XLinearModel.PredParams"] = None,
        **kwargs,
    ) -> "XLinearModel":
        """Train modes (reference xlinear/model.py:39-68):
        full-model: whole chain; matcher: top (D - ranker_level) layers on
        rolled-up Y; ranker: bottom ranker_level layers.
        """
        if train_params is None:
            train_params = cls.TrainParams.from_dict(
                {k: v for k, v in kwargs.items() if k in {f.name for f in dc.fields(cls.TrainParams)}}
            )
            train_params.hlm_args = HierarchicalMLModel.TrainParams(
                neg_mining_chain=kwargs.get("negative_sampling_scheme", "tfn"),
                model_chain=MLModel.TrainParams.from_dict(
                    {k: v for k, v in kwargs.items() if k in {f.name for f in dc.fields(MLModel.TrainParams)}}
                ),
            )
        else:
            train_params = cls.TrainParams.from_dict(train_params)
        if pred_params is None:
            pred_params = cls.PredParams(
                hlm_args=HierarchicalMLModel.PredParams(model_chain=MLModel.PredParams())
            )
        else:
            pred_params = cls.PredParams.from_dict(pred_params)
        if kwargs.get("pred_kwargs", None) is None:
            kwargs["pred_kwargs"] = {
                kw: kwargs.get(kw, None) for kw in ("beam_size", "only_topk", "post_processor")
            }
        if not train_params.min_codes:
            train_params.min_codes = train_params.nr_splits

        if C is None or (isinstance(C, (list, tuple)) and len(C) == 0):
            clustering = None
            matching_chain = None
            relevance_chain = None
        else:
            if train_params.shallow:
                clustering = ClusterChain.from_partial_chain(C, min_codes=None)
            else:
                clustering = ClusterChain.from_partial_chain(
                    C, min_codes=train_params.min_codes, nr_splits=train_params.nr_splits
                )
            matching_chain = clustering.generate_matching_chain(user_supplied_negatives)
            if train_params.rel_mode == "disable":
                relevance_chain = [None] * len(clustering)
            elif train_params.rel_mode == "induce":
                relevance_chain = clustering.generate_relevance_chain(
                    {0: R if R is not None else smat_util.binarized(Y)},
                    norm_type=train_params.rel_norm,
                    induce=True,
                )
            elif train_params.rel_mode == "ranker-only":
                relevance_chain = clustering.generate_relevance_chain(
                    {0: R}, norm_type=train_params.rel_norm, induce=False
                )
            else:
                raise ValueError(
                    f"rel_mode must be one of disable/induce/ranker-only, got {train_params.rel_mode!r}"
                )

        if train_params.mode == "full-model":
            pass
        elif train_params.mode == "matcher":
            if clustering is None:
                raise ValueError("matcher mode needs a clustering with >= 2 levels (got none)")
            for cc in reversed(clustering[-train_params.ranker_level :]):
                Y = (Y @ cc).tocsc()
            clustering = ClusterChain(clustering[: -train_params.ranker_level])
            matching_chain = matching_chain[: -train_params.ranker_level]
            relevance_chain = relevance_chain[: -train_params.ranker_level]
        elif train_params.mode == "ranker":
            if clustering is None:
                raise ValueError("ranker mode needs a clustering with >= 2 levels (got none)")
            clustering = ClusterChain(clustering[-train_params.ranker_level :])
            matching_chain = matching_chain[-train_params.ranker_level :]
            relevance_chain = relevance_chain[-train_params.ranker_level :]
        else:
            raise ValueError(
                f"mode must be one of full-model/matcher/ranker, got {train_params.mode!r}"
            )

        prob = MLProblem(X, Y, R=R if C is None else None)
        model = HierarchicalMLModel.train(
            prob,
            clustering=clustering,
            relevance_chain=relevance_chain,
            matching_chain=matching_chain,
            train_params=train_params.hlm_args,
            pred_params=pred_params.hlm_args,
            **kwargs,
        )
        return cls(model)

    # -- prediction ----------------------------------------------------------------
    def predict(self, X, pred_params=None, **kwargs) -> smat.csr_matrix:
        """Beam-search predict; kwargs: beam_size, only_topk, post_processor."""
        return self.model.predict(
            X,
            csr_codes=kwargs.pop("csr_codes", None),
            pred_params=pred_params.hlm_args if pred_params is not None else None,
            **kwargs,
        )

    def predict_on_selected_outputs(self, X, selected_outputs_csr, **kwargs):
        return self.model.predict_on_selected_outputs(X, selected_outputs_csr, **kwargs)

    def realtime_session(self, **kwargs):
        """Open a persistent low-latency (batch-1-class) predict session.

        Compiles the beam-walk executable once; each ``predict`` call is one
        dispatch + one fetch.  See inference.RealtimeSession — the analog of
        the reference's realtime predict mode (inference.hpp:2030-2080)."""
        return self.model.realtime_session(**kwargs)

    def set_output_constraint(self, labels_to_keep):
        """Prune the tree to only output the given labels (reference :289)."""
        self.model.set_output_constraint(labels_to_keep)

    def get_submodel_rooted_at(self, given_depth, child_node_id, reindex=False):
        return self.model.get_submodel_rooted_at(given_depth, child_node_id, reindex)

    def split_model_at_depth(self, given_depth, reindex=False):
        return self.model.split_model_at_depth(given_depth, reindex)

    def get_pred_params(self) -> "XLinearModel.PredParams":
        return self.PredParams(hlm_args=self.model.get_pred_params())

    # -- model surgery --------------------------------------------------------------
    @classmethod
    def reconstruct_model(cls, meta_model: "XLinearModel", sub_models) -> "XLinearModel":
        """Merge a meta (upper-tree) model with per-subtree child models into one
        chain (used by the distributed trainer; reference xlinear/model.py:356)."""
        from pecos_tpu.xmc.base import HierarchicalMLModel as HLM

        meta = meta_model.model if isinstance(meta_model, XLinearModel) else meta_model
        subs = [m.model if isinstance(m, XLinearModel) else m for m in sub_models]
        depth_sub = subs[0].depth
        if any(s.depth != depth_sub for s in subs):
            raise ValueError("all sub models must share depth")
        # stack layer d of every sub model block-diagonally, ordered by subtree id
        new_chain = list(meta.model_chain)
        for d in range(depth_sub):
            Ws = [s.model_chain[d].W for s in subs]
            Cs = [s.model_chain[d].C for s in subs]
            W = smat_util.hstack_csc(Ws)
            C = smat_util.block_diag_csc(Cs)
            new_chain.append(
                MLModel(
                    W=W,
                    C=C,
                    bias=subs[0].model_chain[d].bias,
                    pred_params=subs[0].model_chain[d].get_pred_params(),
                )
            )
        return cls(HLM(new_chain))
