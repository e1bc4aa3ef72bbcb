"""Numerical parity of pecos_tpu's Flax XLNet vs transformers' torch XLNetModel.

The torch implementation is the reference implementation the reference
framework fine-tunes (pecos/xmc/xtransformer/network.py:225-528 wraps
XLNetModel).  transformers ships no Flax XLNet, so pecos_tpu carries its own
(flax_xlnet.py); this test instantiates a RANDOM torch XLNet (no downloads),
loads its checkpoint into the Flax model through the stock from_pt converter,
and asserts the encoders agree — padding, segments and all.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import XLNetConfig, XLNetModel  # noqa: E402

from pecos_tpu.xmc.xtransformer.flax_xlnet import FlaxXLNetModel  # noqa: E402


def tiny_config():
    return XLNetConfig(
        vocab_size=53,
        d_model=32,
        n_layer=2,
        n_head=4,
        d_inner=64,
        ff_activation="gelu",
        untie_r=True,
        attn_type="bi",
        bi_data=False,
        clamp_len=-1,
        dropout=0.0,
    )


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    cfg = tiny_config()
    torch.manual_seed(0)
    pt = XLNetModel(cfg).eval()
    d = tmp_path_factory.mktemp("xlnet_pt")
    pt.save_pretrained(d, safe_serialization=False)
    fx = FlaxXLNetModel.from_pretrained(str(d), from_pt=True)
    return pt, fx


def _compare(pt, fx, ids, am, tt=None):
    with torch.no_grad():
        ref = pt(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(am, dtype=torch.float32),
            token_type_ids=None if tt is None else torch.tensor(tt),
        ).last_hidden_state.numpy()
    got = np.asarray(
        fx(input_ids=ids, attention_mask=am, token_type_ids=tt).last_hidden_state
    )
    # compare only non-padded positions: torch computes garbage-but-masked
    # rows for pads too, and those rows are never consumed downstream
    m = am.astype(bool)
    np.testing.assert_allclose(got[m], ref[m], atol=2e-4, rtol=2e-3)


def test_full_attention(pair):
    pt, fx = pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 53, size=(3, 12)).astype(np.int32)
    am = np.ones((3, 12), np.int32)
    _compare(pt, fx, ids, am)


def test_padding_mask(pair):
    pt, fx = pair
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 53, size=(2, 10)).astype(np.int32)
    am = np.ones((2, 10), np.int32)
    am[0, :3] = 0  # left padding (XLNet convention)
    am[1, 7:] = 0  # right padding
    _compare(pt, fx, ids, am)


def test_token_types(pair):
    pt, fx = pair
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 53, size=(2, 9)).astype(np.int32)
    am = np.ones((2, 9), np.int32)
    tt = np.zeros((2, 9), np.int32)
    tt[:, 5:] = 1
    _compare(pt, fx, ids, am, tt)


def test_registered_in_encoder_registry():
    from pecos_tpu.xmc.xtransformer import network

    config_cls, model_cls, _ = network.resolve_encoder("xlnet")
    assert config_cls is XLNetConfig
    assert model_cls is FlaxXLNetModel


def test_random_init_and_pooling():
    """Offline path: random-init construction + the matcher's mean pooling."""
    from pecos_tpu.xmc.xtransformer import network

    fx = FlaxXLNetModel(tiny_config(), seed=3)
    ids = np.arange(12, dtype=np.int32).reshape(2, 6) % 53
    am = np.ones((2, 6), np.int32)
    out = fx(input_ids=ids, attention_mask=am)
    emb = network.pooled_embedding(out, am)
    assert emb.shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(emb)))
