"""Cross-implementation parity: train reference pecos and pecos_tpu on the
same data with the same cluster chain; compare P@k."""
import sys, types, time
import numpy as np, scipy.sparse as smat

# scipy shim for reference
import scipy.sparse as _sp
from scipy.sparse import _sputils as _priv
mod = types.ModuleType("scipy.sparse.sputils")
for name in dir(_priv): setattr(mod, name, getattr(_priv, name))
sys.modules["scipy.sparse.sputils"] = mod
_sp.sputils = mod

sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")

rng = np.random.default_rng(7)
n_trn, n_tst, d, L = 3000, 600, 256, 512
centers = smat.random(L, d, density=0.05, random_state=rng, format="csr", dtype=np.float32)
centers = centers.multiply(3.0).tocsr()
def make(n, seed):
    r = np.random.default_rng(seed)
    rows, cols, Xr = [], [], []
    for i in range(n):
        l = r.integers(0, L)
        noise = smat.random(1, d, density=0.03, random_state=r, format="csr", dtype=np.float32)
        Xr.append(centers[l] + noise.multiply(0.5))
        rows.append(i); cols.append(l)
        if r.uniform() < 0.3:
            rows.append(i); cols.append((l + 1) % L)
    X = smat.vstack(Xr, format="csr").astype(np.float32)
    Y = smat.csr_matrix((np.ones(len(rows), np.float32), (rows, cols)), shape=(n, L))
    return X, Y
X, Y = make(n_trn, 1)
Xt, Yt = make(n_tst, 2)

# ours: indexer
from pecos_tpu.xmc import Indexer, LabelEmbeddingFactory
from pecos_tpu.xmc.xlinear import XLinearModel as OurXLM
from pecos_tpu.utils import smat_util as our_smat
label_feat = LabelEmbeddingFactory.create(Y, X, method="pifa")
t0 = time.time()
chain = Indexer.gen(label_feat, max_leaf_size=32, nr_splits=4)
print(f"chain: {[C.shape for C in chain]} ({time.time()-t0:.1f}s)", flush=True)

t0 = time.time()
ours = OurXLM.train(X, Y, C=chain, shallow=True)
print(f"ours train: {time.time()-t0:.1f}s", flush=True)
P_our = ours.predict(Xt, beam_size=10, only_topk=10)
m_our = our_smat.Metrics.generate(Yt, P_our, topk=5)
print("ours  P@1..5:", np.round(m_our.prec, 4), flush=True)

# reference with the SAME chain
sys.path.insert(0, "/tmp/ref_build")
from pecos.xmc.xlinear.model import XLinearModel as RefXLM
from pecos.utils.cluster_util import ClusterChain as RefChain
from pecos.utils import smat_util as ref_smat
ref_chain = RefChain([C.tocsc() for C in chain.chain])
t0 = time.time()
ref = RefXLM.train(X, Y, C=ref_chain, shallow=True)
print(f"ref train: {time.time()-t0:.1f}s", flush=True)
P_ref = ref.predict(Xt, beam_size=10, only_topk=10)
m_ref = ref_smat.Metrics.generate(Yt, P_ref, topk=5)
print("ref   P@1..5:", np.round(m_ref.prec, 4), flush=True)

# also: ours predicting with the REFERENCE-trained weights (load compat check)
import tempfile
tmp = tempfile.mkdtemp()
ref.save(tmp)
ours_loaded = OurXLM.load(tmp)
P_cross = ours_loaded.predict(Xt, beam_size=10, only_topk=10)
m_cross = our_smat.Metrics.generate(Yt, P_cross, topk=5)
print("cross P@1..5 (ref weights, our engine):", np.round(m_cross.prec, 4), flush=True)
