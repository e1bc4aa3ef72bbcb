"""Flax encoders + the XMC label-embedding head.

Reference: pecos/xmc/xtransformer/network.py —
- ENCODER_CLASSES registry (:225-528) of HF encoders specialized ForXMC whose
  forward returns (pooled_embedding, logits restricted to active labels);
- TransformerLinearXMCHead (:115-223): a label-embedding matmul head with an
  extra padding label row so variable-size active-label sets batch statically;
- HingeLoss (:71-113): squared hinge with cost weighting.

TPU re-design: the encoder is a stock Flax HF model; the head is a pair of
arrays (W: (L+1, H), b: (L+1,)) used through gathers — logits for a batch's
padded active-label ids are one einsum.  Loss/optimizer live in matcher.py
with optax; everything is pure-functional for jit.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp
import numpy as np

ENCODER_CLASSES: Dict[str, Dict[str, str]] = {
    "bert": dict(config="BertConfig", model="FlaxBertModel", tokenizer="BertTokenizerFast"),
    "roberta": dict(
        config="RobertaConfig", model="FlaxRobertaModel", tokenizer="RobertaTokenizerFast"
    ),
    "distilbert": dict(
        config="DistilBertConfig",
        model="FlaxDistilBertModel",
        tokenizer="DistilBertTokenizerFast",
    ),
    "xlm-roberta": dict(
        config="XLMRobertaConfig",
        model="FlaxXLMRobertaModel",
        tokenizer="XLMRobertaTokenizerFast",
    ),
    # transformers ships no Flax XLNet; this is pecos_tpu's own implementation
    # (flax_xlnet.py), covering the 5th reference encoder family
    # (reference network.py:225-528).  Torch XLNet checkpoints load through
    # from_pretrained(..., from_pt=True); numerical parity with torch's
    # XLNetModel is asserted in tests/test_flax_xlnet.py.
    "xlnet": dict(config="XLNetConfig", model="FlaxXLNetModel", tokenizer="XLNetTokenizerFast"),
}


def resolve_encoder(model_type: str):
    import transformers

    if model_type not in ENCODER_CLASSES:
        raise ValueError(
            f"unsupported encoder type {model_type!r}; supported: {sorted(ENCODER_CLASSES)}"
        )
    spec = ENCODER_CLASSES[model_type]
    if model_type == "xlnet":
        from .flax_xlnet import FlaxXLNetModel

        model_cls = FlaxXLNetModel
    else:
        model_cls = getattr(transformers, spec["model"])
    return (
        getattr(transformers, spec["config"]),
        model_cls,
        getattr(transformers, spec["tokenizer"]),
    )


@dataclasses.dataclass
class XMCHead:
    """Label-embedding head; index nr_labels is the padding label (zero row)."""

    W: np.ndarray  # (L+1, H) float32
    b: np.ndarray  # (L+1,) float32

    @classmethod
    def random(cls, nr_labels: int, hidden: int, seed: int = 0) -> "XMCHead":
        rng = np.random.default_rng(seed)
        W = (rng.standard_normal((nr_labels + 1, hidden)) * 0.02).astype(np.float32)
        W[-1] = 0.0
        return cls(W=W, b=np.zeros(nr_labels + 1, np.float32))

    @classmethod
    def inherit(cls, parent: "XMCHead", C, seed: int = 0) -> "XMCHead":
        """Bootstrap child head from parent head via the cluster matrix
        (reference 'inherit' bootstrap, matcher.py:1360-1382): child label's
        embedding starts at its parent cluster's embedding."""
        parents = C.tocsr().indices  # (L_child,)
        W = np.vstack([parent.W[parents], np.zeros((1, parent.W.shape[1]), np.float32)])
        b = np.concatenate([parent.b[parents], [0.0]]).astype(np.float32)
        return cls(W=W, b=b)

    @classmethod
    def from_linear(cls, W_linear: np.ndarray, seed: int = 0) -> "XMCHead":
        """Bootstrap from a trained linear model on embeddings ('linear' mode):
        W_linear is (H(+1 bias), L)."""
        H = W_linear.shape[0] - 1
        W = np.vstack([W_linear[:H].T, np.zeros((1, H), np.float32)]).astype(np.float32)
        b = np.concatenate([W_linear[H], [0.0]]).astype(np.float32)
        return cls(W=W, b=b)

    @property
    def nr_labels(self) -> int:
        return self.W.shape[0] - 1


def head_logits(W: jnp.ndarray, b: jnp.ndarray, emb: jnp.ndarray, label_ids: jnp.ndarray):
    """logits[b, k] = emb_b . W[label_ids[b, k]] + b[label_ids[b, k]]."""
    Wk = W[label_ids]  # (B, K, H)
    return jnp.einsum("bkh,bh->bk", Wk, emb, preferred_element_type=jnp.float32) + b[label_ids]


def squared_hinge_loss(
    logits: jnp.ndarray,  # (B, K)
    targets: jnp.ndarray,  # (B, K) in {+1, -1}
    cost: jnp.ndarray,  # (B, K) >= 0, 0 where padded
) -> jnp.ndarray:
    """Cost-weighted squared hinge (reference HingeLoss with p=2,
    network.py:71-113), averaged over real (non-padded) entries."""
    margin = jnp.maximum(1.0 - targets * logits, 0.0)
    denom = jnp.maximum(jnp.sum(cost > 0), 1.0)
    return jnp.sum(cost * margin * margin) / denom


def pooled_embedding(encoder_outputs, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Pooled text embedding: pooler output when the model has one, otherwise
    masked mean of the last hidden state (reference uses [CLS]/pooler per
    architecture, network.py:225-528)."""
    pooled = getattr(encoder_outputs, "pooler_output", None)
    if pooled is not None:
        return pooled
    h = encoder_outputs.last_hidden_state
    m = attention_mask[..., None].astype(h.dtype)
    return jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
