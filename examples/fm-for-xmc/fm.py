"""Factorization Machines for XMC retrieval — TPU-native example.

Re-design of the reference FM example (reference: examples/fm-for-xmc/
fm_train_driver.cpp, fm_generate_embs.cpp, README.md): a second-order FM over
concatenated (query, product) sparse features, trained to score positive
(q, p) pairs above sampled negatives.

TPU mapping of the reference's design choices:
- HogWild! lock-free threads      -> data-parallel minibatch AdaGrad (optax):
  the lock-free race is a CPU trick; on TPU the whole batch gradient is one
  fused XLA step.
- O(dk) "factorized" gradient     -> the same algebra, expressed as dense
  matmuls over the MXU: score needs only V^T x per side (never the d x d
  cross matrix).
- --auto-stop on rising test loss -> identical early-stop logic on a held-out
  split.
- fm_embgen shifted-inner-product -> to_sip_embeddings(): appends two scalar
  lanes so plain inner product recovers the FM score (README "FM to SIP").

Run `python fm.py --demo` for a self-contained synthetic end-to-end run.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from typing import Optional

import numpy as np
import scipy.sparse as smat

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


@dataclasses.dataclass
class FMParams:
    k: int = 8  # factorized dimensions (reference -k)
    epochs: int = 10  # reference -t
    l2: float = 2e-5  # reference -l
    lr: float = 2e-2  # AdaGrad learning rate (reference -r)
    batch_size: int = 1024
    neg_per_pos: int = 4  # sampled negatives per positive pair
    auto_stop: bool = True  # stop when held-out loss rises (reference --auto-stop)
    seed: int = 0


class FactorizationMachine:
    """FM over (query, product) feature pairs.

    score(q, p) = wq . xq + wp . xp + < Vq^T xq, Vp^T xp >
    (within-side second-order terms are constants w.r.t. the retrieval
    ranking and are folded into the SIP scalar lanes, not the ranking score).
    """

    def __init__(self, wq, wp, Vq, Vp, params: FMParams):
        self.wq = wq  # (dq,)
        self.wp = wp  # (dp,)
        self.Vq = Vq  # (dq, k)
        self.Vp = Vp  # (dp, k)
        self.params = params

    # ---------------------------------------------------------------- train
    @classmethod
    def train(
        cls,
        Xq: smat.csr_matrix,  # (nq, dq) query features
        Y: smat.csr_matrix,  # (nq, np) positive pairs
        Xp: smat.csr_matrix,  # (np, dp) product features
        params: Optional[FMParams] = None,
        Xq_val: Optional[smat.csr_matrix] = None,
        Y_val: Optional[smat.csr_matrix] = None,
    ) -> "FactorizationMachine":
        import jax
        import jax.numpy as jnp
        import optax

        params = params or FMParams()
        rng = np.random.default_rng(params.seed)
        nq, dq = Xq.shape
        npr, dp = Xp.shape

        Xq_d = jnp.asarray(np.asarray(Xq.todense(), np.float32))
        Xp_d = jnp.asarray(np.asarray(Xp.todense(), np.float32))

        key = jax.random.PRNGKey(params.seed)
        kq, kp = jax.random.split(key)
        theta = {
            "wq": jnp.zeros((dq,), jnp.float32),
            "wp": jnp.zeros((dp,), jnp.float32),
            "Vq": 0.1 * jax.random.normal(kq, (dq, params.k), jnp.float32),
            "Vp": 0.1 * jax.random.normal(kp, (dp, params.k), jnp.float32),
        }
        tx = optax.adagrad(params.lr)
        opt_state = tx.init(theta)

        def pair_score(t, q_rows, p_rows):
            xq = Xq_d[q_rows]  # (B, dq)
            xp = Xp_d[p_rows]  # (B, dp)
            lin = xq @ t["wq"] + xp @ t["wp"]
            zq = xq @ t["Vq"]  # (B, k) — the O(dk) factorized form
            zp = xp @ t["Vp"]
            return lin + jnp.sum(zq * zp, axis=1)

        @jax.jit
        def step(t, opt_state, q_rows, pos_rows, neg_rows):
            def loss_fn(t):
                s_pos = pair_score(t, q_rows, pos_rows)
                # negatives: (B, neg) sampled products for the same queries
                B, G = neg_rows.shape
                s_neg = pair_score(
                    t,
                    jnp.repeat(q_rows, G),
                    neg_rows.reshape(-1),
                ).reshape(B, G)
                # logistic pairwise loss + L2 (reference AdaGrad + L2 reg)
                ll = jnp.mean(jax.nn.softplus(-(s_pos[:, None] - s_neg)))
                reg = sum(jnp.sum(v * v) for v in jax.tree_util.tree_leaves(t))
                return ll + params.l2 * reg

            loss, grads = jax.value_and_grad(loss_fn)(t)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(t, updates), opt_state, loss

        @jax.jit
        def eval_loss(t, q_rows, pos_rows, neg_rows):
            s_pos = pair_score(t, q_rows, pos_rows)
            B, G = neg_rows.shape
            s_neg = pair_score(t, jnp.repeat(q_rows, G), neg_rows.reshape(-1)).reshape(B, G)
            return jnp.mean(jax.nn.softplus(-(s_pos[:, None] - s_neg)))

        Yc = Y.tocoo()
        pairs = np.stack([Yc.row, Yc.col], axis=1)
        B = min(params.batch_size, len(pairs))
        val_pairs = None
        if Xq_val is not None and Y_val is not None:
            Yv = Y_val.tocoo()
            val_pairs = np.stack([Yv.row, Yv.col], axis=1)

        prev_val = np.inf
        for epoch in range(params.epochs):
            order = rng.permutation(len(pairs))
            tot, nb = 0.0, 0
            for s in range(0, len(order) - B + 1, B):
                sel = pairs[order[s : s + B]]
                negs = rng.integers(0, npr, size=(B, params.neg_per_pos))
                theta, opt_state, loss = step(
                    theta,
                    opt_state,
                    jnp.asarray(sel[:, 0]),
                    jnp.asarray(sel[:, 1]),
                    jnp.asarray(negs),
                )
                tot += float(loss)
                nb += 1
            msg = f"epoch {epoch + 1}/{params.epochs} train_loss={tot / max(nb, 1):.5f}"
            if val_pairs is not None:
                vsel = val_pairs[: min(4096, len(val_pairs))]
                vneg = rng.integers(0, npr, size=(len(vsel), params.neg_per_pos))
                # NOTE: validation pairs index Xq_val rows; rebuild scores host-side
                vl = float(
                    _val_loss_host(
                        theta, Xq_val, Xp, vsel, vneg
                    )
                )
                msg += f" val_loss={vl:.5f}"
                if params.auto_stop and vl > prev_val:
                    print(msg + "  (auto-stop: validation loss rose)")
                    break
                prev_val = vl
            print(msg)

        return cls(
            np.asarray(theta["wq"]),
            np.asarray(theta["wp"]),
            np.asarray(theta["Vq"]),
            np.asarray(theta["Vp"]),
            params,
        )

    # ---------------------------------------------------------------- score
    def score(self, Xq: smat.spmatrix, Xp: smat.spmatrix) -> np.ndarray:
        """Dense (nq, np) score matrix (small problems / evaluation)."""
        Xq = np.asarray(Xq.todense(), np.float32) if smat.issparse(Xq) else np.asarray(Xq)
        Xp = np.asarray(Xp.todense(), np.float32) if smat.issparse(Xp) else np.asarray(Xp)
        lin = (Xq @ self.wq)[:, None] + (Xp @ self.wp)[None, :]
        return lin + (Xq @ self.Vq) @ (Xp @ self.Vp).T

    def to_sip_embeddings(self, Xq: smat.spmatrix, Xp: smat.spmatrix):
        """Shifted-inner-product embeddings (reference fm_embgen): returns
        (Eq (nq, k+2), Ep (np, k+2)) with <Eq[i], Ep[j]> == score(i, j)."""
        Xq = np.asarray(Xq.todense(), np.float32) if smat.issparse(Xq) else np.asarray(Xq)
        Xp = np.asarray(Xp.todense(), np.float32) if smat.issparse(Xp) else np.asarray(Xp)
        zq = Xq @ self.Vq
        zp = Xp @ self.Vp
        cq = Xq @ self.wq
        cp = Xp @ self.wp
        ones_q = np.ones((Xq.shape[0], 1), np.float32)
        ones_p = np.ones((Xp.shape[0], 1), np.float32)
        Eq = np.hstack([zq, cq[:, None], ones_q]).astype(np.float32)
        Ep = np.hstack([zp, ones_p, cp[:, None]]).astype(np.float32)
        return Eq, Ep

    # ---------------------------------------------------------------- io
    def save(self, folder: str):
        os.makedirs(folder, exist_ok=True)
        np.savez(
            os.path.join(folder, "fm.npz"),
            wq=self.wq, wp=self.wp, Vq=self.Vq, Vp=self.Vp,
        )
        with open(os.path.join(folder, "params.json"), "w") as f:
            json.dump(dataclasses.asdict(self.params), f, indent=1)

    @classmethod
    def load(cls, folder: str) -> "FactorizationMachine":
        z = np.load(os.path.join(folder, "fm.npz"))
        with open(os.path.join(folder, "params.json")) as f:
            params = FMParams(**json.load(f))
        return cls(z["wq"], z["wp"], z["Vq"], z["Vp"], params)


def _val_loss_host(theta, Xq_val, Xp, vsel, vneg) -> float:
    """Held-out pairwise loss on host arrays (small validation slices)."""
    Xqv = np.asarray(Xq_val.todense(), np.float32)
    Xpd = np.asarray(Xp.todense(), np.float32)
    wq, wp = np.asarray(theta["wq"]), np.asarray(theta["wp"])
    Vq, Vp = np.asarray(theta["Vq"]), np.asarray(theta["Vp"])

    def sc(qr, pr):
        xq, xp = Xqv[qr], Xpd[pr]
        return xq @ wq + xp @ wp + np.sum((xq @ Vq) * (xp @ Vp), axis=1)

    s_pos = sc(vsel[:, 0], vsel[:, 1])
    G = vneg.shape[1]
    s_neg = sc(np.repeat(vsel[:, 0], G), vneg.reshape(-1)).reshape(-1, G)
    return float(np.mean(np.logaddexp(0.0, -(s_pos[:, None] - s_neg))))


# -------------------------------------------------------------------- demo
def synthetic_pairs(nq=512, npr=256, dq=64, dp=64, k_true=4, seed=0):
    """Pairs whose relevance is driven by CROSS-terms between query and
    product features — exactly the structure a linear/IP model cannot fit
    and an FM can (the reference README's motivating case)."""
    rng = np.random.default_rng(seed)
    Xq = rng.standard_normal((nq, dq)).astype(np.float32) * 0.5
    Xp = rng.standard_normal((npr, dp)).astype(np.float32) * 0.5
    Aq = rng.standard_normal((dq, k_true)).astype(np.float32)
    Ap = rng.standard_normal((dp, k_true)).astype(np.float32)
    S = (Xq @ Aq) @ (Xp @ Ap).T  # hidden FM structure
    top = np.argsort(-S, axis=1)[:, :3]
    rows = np.repeat(np.arange(nq), 3)
    Y = smat.csr_matrix(
        (np.ones(nq * 3, np.float32), (rows, top.ravel())), shape=(nq, npr)
    )
    return smat.csr_matrix(Xq), Y, smat.csr_matrix(Xp), S


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--q-trn", help="query features npz/npy")
    ap.add_argument("--qp-trn", help="positive pair matrix npz")
    ap.add_argument("--p-feat", help="product features npz/npy")
    ap.add_argument("--model", default="/tmp/fm_model")
    ap.add_argument("-k", type=int, default=8)
    ap.add_argument("-t", "--epochs", type=int, default=30)
    ap.add_argument("-l", "--l2", type=float, default=2e-5)
    ap.add_argument("-r", "--lr", type=float, default=0.2)
    ap.add_argument("--batch-size", type=int, default=256)
    args = ap.parse_args()

    if args.demo:
        Xq, Y, Xp, S_true = synthetic_pairs()
        n_val = 64
        fm = FactorizationMachine.train(
            Xq[:-n_val], Y[:-n_val], Xp,
            FMParams(
                k=args.k, epochs=args.epochs, l2=args.l2, lr=args.lr,
                batch_size=args.batch_size, neg_per_pos=8,
            ),
            Xq_val=Xq[-n_val:], Y_val=Y[-n_val:],
        )
        S = fm.score(Xq[-n_val:], Xp)
        truth = np.asarray(Y[-n_val:].todense())
        p1 = float(np.mean(truth[np.arange(n_val), S.argmax(axis=1)] > 0))
        print(f"held-out P@1 = {p1:.3f}")
        Eq, Ep = fm.to_sip_embeddings(Xq[-n_val:], Xp)
        sip_err = float(np.abs(Eq @ Ep.T - S).max())
        print(f"SIP embedding max |error| = {sip_err:.2e}")
        fm.save(args.model)
        print(f"model saved to {args.model}")
        return

    from pecos_tpu.utils import smat_util

    Xq = smat_util.load_matrix(args.q_trn).tocsr()
    Y = smat_util.load_matrix(args.qp_trn).tocsr()
    Xp = smat_util.load_matrix(args.p_feat).tocsr()
    t0 = time.time()
    fm = FactorizationMachine.train(
        Xq, Y, Xp,
        FMParams(
            k=args.k, epochs=args.epochs, l2=args.l2, lr=args.lr,
            batch_size=args.batch_size,
        ),
    )
    print(f"trained in {time.time() - t0:.1f}s")
    fm.save(args.model)


if __name__ == "__main__":
    main()
