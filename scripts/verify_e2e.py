"""End-to-end user-style drive of pecos_tpu on the ambient (TPU) backend.

Mimics what a PECOS user does: build label features, index, train an
XR-Linear model, save, reload, predict, evaluate.
"""

import sys
import time

import numpy as np
import scipy.sparse as smat

import jax

print("backend:", jax.default_backend(), jax.devices())

from pecos_tpu.utils import smat_util
from pecos_tpu.xmc import Indexer, LabelEmbeddingFactory
from pecos_tpu.xmc.xlinear import XLinearModel

rng = np.random.default_rng(0)
n, d, L = 512, 64, 128
centers = rng.standard_normal((L, d)).astype(np.float32) * 3
rows, cols, Xd = [], [], np.zeros((n, d), np.float32)
for i in range(n):
    l = i % L
    Xd[i] = centers[l] + rng.standard_normal(d).astype(np.float32) * 0.3
    rows.append(i); cols.append(l)
X = smat.csr_matrix(Xd)
Y = smat.csr_matrix((np.ones(len(rows), np.float32), (rows, cols)), shape=(n, L))

t0 = time.time()
label_feat = LabelEmbeddingFactory.create(Y, X, method="pifa")
chain = Indexer.gen(label_feat, max_leaf_size=8, nr_splits=4)
print(f"indexer: depth={len(chain)} shapes={[C.shape for C in chain]} ({time.time()-t0:.1f}s)")

t0 = time.time()
xlm = XLinearModel.train(X, Y, C=chain, threshold=0.0)
print(f"train: done ({time.time()-t0:.1f}s)")

import tempfile, os
folder = tempfile.mkdtemp(prefix="pecos_tpu_verify_")
xlm.save(folder)
loaded = XLinearModel.load(folder)
print("saved+loaded:", sorted(os.listdir(folder)))

t0 = time.time()
P = loaded.predict(X, beam_size=8, only_topk=5)
print(f"predict: shape={P.shape} nnz={P.nnz} ({time.time()-t0:.1f}s)")
m = smat_util.Metrics.generate(Y, P, topk=5)
print("P@1..5:", np.round(m.prec, 4))
assert m.prec[0] > 0.9, f"P@1 too low: {m.prec[0]}"

# second predict: should reuse compiled fn (fast path)
t0 = time.time()
P2 = loaded.predict(X, beam_size=8, only_topk=5)
dt = time.time() - t0
print(f"predict(warm): {dt*1000:.1f} ms -> {X.shape[0]/dt:.0f} QPS")
assert (P != P2).nnz == 0

print("E2E-OK")
