"""End-to-end user-style drive of pecos_tpu on the ambient (TPU) backend.

Mimics what a PECOS user does: build label features, index, train an
XR-Linear model, save, reload, predict, evaluate.
"""

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

# --- TF-IDF -> XLinear on raw text ------------------------------------------
from pecos_tpu.utils.featurization.text import Preprocessor

corpus = [f"document about topic {i % 16} with words w{i%16}a w{i%16}b shared" for i in range(128)]
Yt = smat.csr_matrix(
    (np.ones(128, np.float32), (np.arange(128), np.arange(128) % 16)), shape=(128, 16)
)
pre = Preprocessor.train(corpus, {"type": "tfidf", "kwargs": {"ngram_range": (1, 2)}})
Xt = pre.predict(corpus)
xlm_t = XLinearModel.train(Xt, Yt, C=Indexer.gen(LabelEmbeddingFactory.create(Yt, Xt, "pifa"), max_leaf_size=4, nr_splits=2), threshold=0.0)
Pt = xlm_t.predict(Xt, only_topk=1)
acc = np.mean([Yt[i, Pt.indices[Pt.indptr[i]]] > 0 for i in range(128) if Pt.indptr[i+1] > Pt.indptr[i]])
print(f"tfidf->xlinear: acc={acc:.3f} (D={Xt.shape[1]})")
assert acc > 0.95

# --- HNSW -------------------------------------------------------------------
from pecos_tpu.ann import HNSW

Xa = Xd / np.linalg.norm(Xd, axis=1, keepdims=True)
t0 = time.time()
hnsw = HNSW.train(Xa, M=16, efC=60, metric_type="ip")
print(f"hnsw build: {time.time()-t0:.1f}s")
ids, dists = hnsw.predict(Xa[:64], efS=50, topk=10)
exact = np.argsort(1.0 - Xa[:64] @ Xa.T, axis=1)[:, :10]
rec = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(ids.tolist(), exact.tolist())])
print(f"hnsw recall@10 vs exact: {rec:.3f}")
assert rec > 0.9

# --- PairwiseANN ------------------------------------------------------------
from pecos_tpu.ann.pairwise import PairwiseANN

pw = PairwiseANN.train(Xa, Y, metric_type="ip")
I, M, Dm, V = pw.predict(Xa[:4], np.array([0, 1, 2, 3], dtype=np.uint32))
print(f"pairwise: shapes {I.shape} mask-sum {M.sum()}")
assert M.sum() > 0

print("E2E-OK")
