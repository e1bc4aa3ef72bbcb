"""FM-for-XMC example test (reference: examples/fm-for-xmc — cross-term
retrieval that inner-product models cannot fit)."""

import importlib.util
import os

import numpy as np


def _load_fm():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "fm-for-xmc", "fm.py",
    )
    spec = importlib.util.spec_from_file_location("fm_example", path)
    mod = importlib.util.module_from_spec(spec)
    import sys

    sys.modules["fm_example"] = mod  # dataclasses resolves cls.__module__
    spec.loader.exec_module(mod)
    return mod


def test_fm_learns_cross_terms(tmp_path):
    fm_mod = _load_fm()
    Xq, Y, Xp, S_true = fm_mod.synthetic_pairs(nq=256, npr=128, dq=32, dp=32, seed=1)
    n_val = 48
    model = fm_mod.FactorizationMachine.train(
        Xq[:-n_val], Y[:-n_val], Xp,
        fm_mod.FMParams(
            k=8, epochs=40, lr=0.2, batch_size=128, neg_per_pos=8, seed=0, auto_stop=False
        ),
    )
    S = model.score(Xq[-n_val:], Xp)
    truth = np.asarray(Y[-n_val:].todense())
    p1 = float(np.mean(truth[np.arange(n_val), S.argmax(axis=1)] > 0))
    assert p1 > 0.5, f"FM held-out P@1={p1}"

    # SIP embeddings reproduce the score exactly (reference fm_embgen role)
    Eq, Ep = model.to_sip_embeddings(Xq[-n_val:], Xp)
    np.testing.assert_allclose(Eq @ Ep.T, S, rtol=1e-4, atol=1e-4)

    # save/load roundtrip
    folder = str(tmp_path / "fm")
    model.save(folder)
    loaded = fm_mod.FactorizationMachine.load(folder)
    np.testing.assert_allclose(loaded.score(Xq[-n_val:], Xp), S, rtol=1e-6)
