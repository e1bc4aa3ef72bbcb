"""Flax XLNet encoder (single-segment encoding mode) for the XMC matcher.

transformers ships no Flax XLNet, so until now the TPU stack could only offer
a documented substitution policy (network.py) for the reference's 5th encoder
family (reference: pecos/xmc/xtransformer/network.py:225-528 registers
XLNetForXMC; its forward runs transformers' torch XLNetModel and pools the
last hidden state).  This module is a from-scratch Flax implementation of
XLNet's *encoding* path — relative positional attention (Transformer-XL
style), relative segment encoding, h-stream only — which is the entirety of
what XMC fine-tuning and inference use:

- ``mems`` / ``target_mapping`` / ``perm_mask`` (the two-stream permutation-LM
  pretraining machinery) are not implemented: the reference matcher never
  passes them (its calls send only input_ids/attention_mask/token_type_ids).
- ``attn_type="bi"`` and ``bi_data=False`` only (the released XLNet
  checkpoints' fine-tuning configuration).

Parameter names and shapes mirror torch's XLNetModel exactly
(layer.{i}.rel_attn.{q,k,v,o,r,r_w_bias,r_r_bias,r_s_bias,seg_embed},
layer.{i}.ff.layer_{1,2}, word_embedding, mask_emb), so
``FlaxXLNetModel.from_pretrained(path, from_pt=True)`` converts a torch
XLNet checkpoint with transformers' stock converter.  Numerical parity with
the torch implementation is asserted in tests/test_flax_xlnet.py on a
randomly initialized model (no network access needed).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from transformers import XLNetConfig
from transformers.modeling_flax_outputs import FlaxBaseModelOutput
from transformers.modeling_flax_utils import FlaxPreTrainedModel


class FlaxXLNetRelativeAttention(nn.Module):
    """Relative positional attention, h-stream (torch: XLNetRelativeAttention,
    modeling_xlnet.py — rel_attn_core / post_attention)."""

    config: XLNetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.config
        init = jax.nn.initializers.normal(c.initializer_range)
        head = (c.d_model, c.n_head, c.d_head)
        self.q = self.param("q", init, head)
        self.k = self.param("k", init, head)
        self.v = self.param("v", init, head)
        self.o = self.param("o", init, head)
        self.r = self.param("r", init, head)
        self.r_w_bias = self.param("r_w_bias", init, (c.n_head, c.d_head))
        self.r_r_bias = self.param("r_r_bias", init, (c.n_head, c.d_head))
        self.r_s_bias = self.param("r_s_bias", init, (c.n_head, c.d_head))
        self.seg_embed = self.param("seg_embed", init, (2, c.n_head, c.d_head))
        self.layer_norm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype)
        self.dropout = nn.Dropout(c.dropout)

    @staticmethod
    def rel_shift_bnij(x: jnp.ndarray, klen: int) -> jnp.ndarray:
        """The Transformer-XL relative-shift trick on (b, n, i, j) scores."""
        b, n, i, j = x.shape
        x = x.reshape(b, n, j, i)[:, :, 1:, :]
        x = x.reshape(b, n, i, j - 1)
        return x[:, :, :, :klen]

    def __call__(
        self,
        h: jnp.ndarray,  # (qlen, bsz, d_model)
        pos_emb: jnp.ndarray,  # (plen, bsz, d_model)
        seg_mat: Optional[jnp.ndarray],  # (qlen, klen, bsz, 2) one-hot or None
        attn_mask: Optional[jnp.ndarray],  # (i, j, bsz, 1) float, 1 = masked
        deterministic: bool = True,
    ) -> jnp.ndarray:
        q_head = jnp.einsum("ibh,hnd->ibnd", h, self.q)
        k_head = jnp.einsum("ibh,hnd->ibnd", h, self.k)
        v_head = jnp.einsum("ibh,hnd->ibnd", h, self.v)
        k_head_r = jnp.einsum("ibh,hnd->ibnd", pos_emb.astype(self.dtype), self.r)

        # content / position / segment attention scores
        ac = jnp.einsum("ibnd,jbnd->bnij", q_head + self.r_w_bias, k_head)
        bd = jnp.einsum("ibnd,jbnd->bnij", q_head + self.r_r_bias, k_head_r)
        bd = self.rel_shift_bnij(bd, klen=ac.shape[3])
        if seg_mat is None:
            ef = 0.0
        else:
            ef = jnp.einsum("ibnd,snd->ibns", q_head + self.r_s_bias, self.seg_embed)
            ef = jnp.einsum("ijbs,ibns->bnij", seg_mat, ef)

        score = (ac + bd + ef) * (1.0 / np.sqrt(self.config.d_head))
        if attn_mask is not None:
            score = score - 1e30 * jnp.einsum("ijbn->bnij", attn_mask)
        prob = jax.nn.softmax(score, axis=3)
        prob = self.dropout(prob, deterministic=deterministic)

        attn_vec = jnp.einsum("bnij,jbnd->ibnd", prob, v_head)
        attn_out = jnp.einsum("ibnd,hnd->ibh", attn_vec, self.o)
        attn_out = self.dropout(attn_out, deterministic=deterministic)
        return self.layer_norm(attn_out + h)


class FlaxXLNetFeedForward(nn.Module):
    config: XLNetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.config
        init = jax.nn.initializers.normal(c.initializer_range)
        self.layer_1 = nn.Dense(c.d_inner, dtype=self.dtype, kernel_init=init)
        self.layer_2 = nn.Dense(c.d_model, dtype=self.dtype, kernel_init=init)
        self.layer_norm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype)
        self.dropout = nn.Dropout(c.dropout)
        if c.ff_activation not in ("gelu", "relu"):
            raise ValueError(f"unsupported ff_activation {c.ff_activation!r}")

    def __call__(self, inp: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = self.layer_1(inp)
        x = jax.nn.gelu(x, approximate=False) if self.config.ff_activation == "gelu" else jax.nn.relu(x)
        x = self.dropout(x, deterministic=deterministic)
        x = self.layer_2(x)
        x = self.dropout(x, deterministic=deterministic)
        return self.layer_norm(x + inp)


class FlaxXLNetLayer(nn.Module):
    config: XLNetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.rel_attn = FlaxXLNetRelativeAttention(self.config, dtype=self.dtype)
        self.ff = FlaxXLNetFeedForward(self.config, dtype=self.dtype)

    def __call__(self, h, pos_emb, seg_mat, attn_mask, deterministic=True):
        h = self.rel_attn(h, pos_emb, seg_mat, attn_mask, deterministic=deterministic)
        return self.ff(h, deterministic=deterministic)


class FlaxXLNetLayerCollection(nn.Module):
    """Named container so param paths read layer/{i}/... like the torch keys."""

    config: XLNetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            FlaxXLNetLayer(self.config, dtype=self.dtype, name=str(i))
            for i in range(self.config.n_layer)
        ]

    def __call__(self, h, pos_emb, seg_mat, attn_mask, deterministic=True):
        for layer in self.layers:
            h = layer(h, pos_emb, seg_mat, attn_mask, deterministic=deterministic)
        return h


class FlaxXLNetModule(nn.Module):
    config: XLNetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.config
        init = jax.nn.initializers.normal(c.initializer_range)
        self.word_embedding = nn.Embed(
            c.vocab_size, c.d_model, embedding_init=init, dtype=self.dtype
        )
        # kept for checkpoint-shape parity with torch (two-stream mask token);
        # unused in encoding mode
        self.mask_emb = self.param("mask_emb", init, (1, 1, c.d_model))
        self.layer = FlaxXLNetLayerCollection(c, dtype=self.dtype)
        self.dropout = nn.Dropout(c.dropout)

    def _rel_pos_emb(self, qlen: int, klen: int, bsz: int) -> jnp.ndarray:
        """Relative sinusoid positions klen..-qlen (attn_type='bi',
        bi_data=False — the released checkpoints' fine-tune configuration)."""
        c = self.config
        freq = np.arange(0, c.d_model, 2.0, dtype=np.float32)
        inv_freq = 1.0 / np.power(10000.0, freq / c.d_model)
        pos_seq = np.arange(klen, -qlen, -1.0, dtype=np.float32)
        if c.clamp_len > 0:
            pos_seq = np.clip(pos_seq, -c.clamp_len, c.clamp_len)
        sinusoid = np.einsum("i,d->id", pos_seq, inv_freq)
        pos = np.concatenate([np.sin(sinusoid), np.cos(sinusoid)], axis=-1)
        return jnp.broadcast_to(
            jnp.asarray(pos, self.dtype)[:, None, :], (pos.shape[0], bsz, c.d_model)
        )

    def __call__(
        self,
        input_ids: jnp.ndarray,  # (bsz, qlen)
        attention_mask: Optional[jnp.ndarray] = None,  # (bsz, qlen), 1 = keep
        token_type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        output_hidden_states: bool = False,
        return_dict: bool = True,
    ):
        if self.config.attn_type != "bi" or self.config.bi_data:
            raise ValueError("only attn_type='bi', bi_data=False is implemented")
        ids = input_ids.T  # internal layout is (qlen, bsz) like the original
        qlen, bsz = ids.shape

        attn_mask = None
        if attention_mask is not None:
            input_mask = (1.0 - attention_mask.T).astype(self.dtype)  # (qlen, bsz)
            attn_mask = input_mask[None][:, :, :, None]  # (1, j, b, 1)
            attn_mask = (attn_mask > 0).astype(self.dtype)
            # a padded token may still attend to itself (keeps softmax finite)
            non_tgt = -jnp.eye(qlen, dtype=self.dtype)[:, :, None, None]
            attn_mask = ((attn_mask + non_tgt) > 0).astype(self.dtype)

        seg_mat = None
        if token_type_ids is not None:
            tt = token_type_ids.T
            diff = (tt[:, None] != tt[None, :]).astype(jnp.int32)  # (q, k, b)
            seg_mat = jax.nn.one_hot(diff, 2, dtype=self.dtype)

        h = self.dropout(self.word_embedding(ids.astype("i4")), deterministic=deterministic)
        pos_emb = self.dropout(self._rel_pos_emb(qlen, qlen, bsz), deterministic=deterministic)

        hiddens: Tuple[jnp.ndarray, ...] = ()
        for layer in self.layer.layers:
            if output_hidden_states:
                hiddens = hiddens + (h.transpose(1, 0, 2),)
            h = layer(h, pos_emb, seg_mat, attn_mask, deterministic=deterministic)
        out = self.dropout(h, deterministic=deterministic).transpose(1, 0, 2)
        if output_hidden_states:
            hiddens = hiddens + (out,)
        if not return_dict:
            return (out, hiddens) if output_hidden_states else (out,)
        return FlaxBaseModelOutput(
            last_hidden_state=out, hidden_states=hiddens if output_hidden_states else None
        )


class FlaxXLNetModel(FlaxPreTrainedModel):
    config_class = XLNetConfig
    base_model_prefix = "transformer"
    module_class = FlaxXLNetModule

    def __init__(
        self,
        config: XLNetConfig,
        input_shape: tuple = (1, 8),
        seed: int = 0,
        dtype: jnp.dtype = jnp.float32,
        _do_init: bool = True,
        **kwargs,
    ):
        module = self.module_class(config=config, dtype=dtype, **kwargs)
        super().__init__(
            config, module, input_shape=input_shape, seed=seed, dtype=dtype, _do_init=_do_init
        )

    def init_weights(self, rng, input_shape, params=None):
        input_ids = jnp.zeros(input_shape, dtype="i4")
        attention_mask = jnp.ones_like(input_ids)
        params_rng, dropout_rng = jax.random.split(rng)
        random_params = self.module.init(
            {"params": params_rng, "dropout": dropout_rng},
            input_ids,
            attention_mask,
            return_dict=False,
        )["params"]
        if params is not None:
            return params
        return random_params

    def __call__(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        params: Optional[dict] = None,
        dropout_rng=None,
        train: bool = False,
        output_hidden_states: Optional[bool] = None,
        return_dict: Optional[bool] = None,
        **kwargs,
    ):
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else {}
        return self.module.apply(
            {"params": params or self.params},
            jnp.asarray(input_ids, dtype="i4"),
            jnp.asarray(attention_mask),
            jnp.asarray(token_type_ids) if token_type_ids is not None else None,
            not train,
            bool(output_hidden_states),
            return_dict if return_dict is not None else True,
            rngs=rngs,
        )
