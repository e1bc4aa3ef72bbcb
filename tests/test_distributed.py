"""Distributed clustering/training tests (reference idiom:
test_dist_xmc.py:39-169 / test_dist_xlinear.py:71-149 — DummyComm in-process,
distributed path must match the non-distributed result)."""

import numpy as np
import scipy.sparse as smat

from pecos_tpu.distributed.xmc import DistClusterChain, DistClustering
from pecos_tpu.distributed.xmc.xlinear import DistributedXLinearModel, XLinearLoadBalancer
from pecos_tpu.parallel.comm import DummyComm
from pecos_tpu.xmc import Indexer, LabelEmbeddingFactory
from pecos_tpu.xmc.xlinear import XLinearModel


def _synthetic(n=160, d=12, L=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((L, d)).astype(np.float32) * 3
    X = np.zeros((n, d), np.float32)
    rows, cols = [], []
    for i in range(n):
        l = i % L
        X[i] = centers[l] + rng.standard_normal(d).astype(np.float32) * 0.3
        rows.append(i)
        cols.append(l)
    Y = smat.csr_matrix((np.ones(n, np.float32), (rows, cols)), shape=(n, L))
    return smat.csr_matrix(X), Y


def test_dist_chain_resplit_and_subtree_roundtrip():
    X, Y = _synthetic()
    chain = Indexer.gen(
        LabelEmbeddingFactory.create(Y, X, "pifa"), max_leaf_size=4, nr_splits=2
    )
    dist = DistClusterChain(chain, split_depth=2)
    n_sub = dist.get_num_sub_tree()
    assert n_sub == chain[2].shape[1]
    # label assignments form a partition
    assignments = dist.get_sub_tree_assignment()
    allv = np.concatenate(assignments)
    assert sorted(allv.tolist()) == list(range(Y.shape[1]))
    # subtree chains have consistent shapes
    for t in range(n_sub):
        sub = dist.get_sub_tree_chain(t)
        assert sub[-1].shape[0] == len(assignments[t])
    # meta Y shape
    assert dist.get_meta_Y(Y).shape == (X.shape[0], n_sub)


def test_dist_clustering_dummycomm():
    X, Y = _synthetic(seed=1)
    comm = DummyComm()
    dist = DistClustering.dist_get_cluster_chain(
        X,
        Y,
        comm,
        cluster_params={"indexer_params": {"nr_splits": 2, "max_leaf_size": 4}},
        min_n_sub_tree=2,
    )
    chain = dist.get_cluster_chain()
    assert chain.nr_labels == Y.shape[1]
    # every chain level valid (one parent per child)
    for C in chain:
        assert (np.diff(C.tocsr().indptr) == 1).all()


def test_distributed_train_matches_direct():
    X, Y = _synthetic(seed=2)
    comm = DummyComm()
    dist = DistClustering.dist_get_cluster_chain(
        X,
        Y,
        comm,
        cluster_params={"indexer_params": {"nr_splits": 2, "max_leaf_size": 4}},
        min_n_sub_tree=2,
    )
    model_dist = DistributedXLinearModel.train(
        X,
        Y,
        comm,
        dist_chain=dist,
        train_params={"hlm_args": {"model_chain": {"threshold": 0.0}}},
    )
    model_direct = XLinearModel.train(
        X, Y, C=dist.get_cluster_chain(), threshold=0.0, shallow=True
    )
    assert model_dist.model.depth == model_direct.model.depth
    P1 = model_dist.predict(X, beam_size=4, only_topk=3)
    P2 = model_direct.predict(X, beam_size=4, only_topk=3)
    d1 = np.asarray(P1.todense())
    d2 = np.asarray(P2.todense())
    # identical up to top-k tie-breaks at float tolerance: >=99% of entries match
    close = np.isclose(d1, d2, rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.99, f"only {close.mean():.4f} of entries match"
    # and the top-1 label agrees everywhere
    np.testing.assert_array_equal(d1.argmax(axis=1), d2.argmax(axis=1))


def test_load_balancer_partition():
    w = np.array([5.0, 1, 1, 1, 5, 1, 1, 1])
    jobs = XLinearLoadBalancer(main_workload_factor=0.5).partition(w, 3)
    assert sum(len(j) for j in jobs) == 8
    assert sorted(x for j in jobs for x in j) == list(range(8))
    # order-preserving contiguity
    flat = [x for j in jobs for x in j]
    assert flat == sorted(flat)


def test_multirank_distributed_train_matches_direct():
    """Size-4 in-process cluster (FakeClusterComm threads): full multi-rank
    path — meta clustering on rank 0, scattered sub-tree builds, gathered
    sub-models, rank-0 reconstruction — must match the direct model
    (reference idiom: test_dist_xlinear.py:71-149)."""
    import threading

    from pecos_tpu.parallel.comm import FakeClusterComm

    X, Y = _synthetic(n=200, L=48, seed=3)
    cluster = FakeClusterComm(4)
    results = [None] * 4
    errors = []

    def run_rank(r):
        try:
            comm = cluster.rank_comm(r)
            dist = DistClustering.dist_get_cluster_chain(
                X,
                Y,
                comm,
                cluster_params={"indexer_params": {"nr_splits": 2, "max_leaf_size": 4}},
                min_n_sub_tree=4,
            )
            results[r] = (
                DistributedXLinearModel.train(
                    X,
                    Y,
                    comm,
                    dist_chain=dist,
                    train_params={"hlm_args": {"model_chain": {"threshold": 0.0}}},
                ),
                dist,
            )
        except Exception as e:  # surface thread failures in the main thread
            import traceback

            errors.append(traceback.format_exc())
            raise

    threads = [threading.Thread(target=run_rank, args=(r,)) for r in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors[0]
    assert results[0][0] is not None, "rank 0 must return the reconstructed model"
    for r in range(1, 4):
        assert results[r][0] is None, f"rank {r} must return None"

    model_dist, dist = results[0]
    model_direct = XLinearModel.train(
        X, Y, C=dist.get_cluster_chain(), threshold=0.0, shallow=True
    )
    P1 = model_dist.predict(X, beam_size=4, only_topk=3)
    P2 = model_direct.predict(X, beam_size=4, only_topk=3)
    d1 = np.asarray(P1.todense())
    d2 = np.asarray(P2.todense())
    close = np.isclose(d1, d2, rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.99, f"only {close.mean():.4f} of entries match"
    np.testing.assert_array_equal(d1.argmax(axis=1), d2.argmax(axis=1))


def test_fake_cluster_comm_primitives():
    import threading

    from pecos_tpu.parallel.comm import FakeClusterComm

    cluster = FakeClusterComm(3)
    out = {}

    def run(r):
        c = cluster.rank_comm(r)
        assert c.bcast("hello" if r == 1 else None, root=1) == "hello"
        assert c.scatter([10, 20, 30] if r == 0 else None, root=0) == 10 * (r + 1)
        g = c.gather(r * r, root=2)
        if r == 2:
            out["gather"] = g
        else:
            assert g is None
        if r == 0:
            c.send({"payload": np.arange(5)}, dest=2, tag=7)
        if r == 2:
            got = c.recv(source=0, tag=7)
            np.testing.assert_array_equal(got["payload"], np.arange(5))

    threads = [threading.Thread(target=run, args=(r,)) for r in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert out["gather"] == [0, 1, 4]


def test_zero_analog_opt_state_sharding():
    """ZeRO-1 analog: AdamW moments sharded over the full mesh must (a) cut
    per-device moment memory ~n_devices x, (b) keep that sharding through
    jitted train steps, and (c) produce updates identical to the replicated
    run.  Reference role: DeepSpeed ZeRO stage-1 in
    pecos/distributed/xmc/xtransformer/dist_trainer.py:163."""
    import jax
    import jax.numpy as jnp
    import optax

    from pecos_tpu.parallel.mesh import make_mesh, shard_opt_state

    mesh = make_mesh()
    n_dev = int(np.prod(list(mesh.shape.values())))
    assert n_dev == 8  # conftest forces the 8-device CPU mesh

    rng = np.random.default_rng(0)
    params = {
        "W": jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32)),
        "b": jnp.asarray(rng.standard_normal((32,)).astype(np.float32)),
    }
    X = jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((16, 32)).astype(np.float32))
    tx = optax.adamw(1e-2, weight_decay=0.01)

    def loss_fn(p):
        return jnp.mean((X @ p["W"] + p["b"] - Y) ** 2)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss_fn)(p)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s

    # replicated reference run
    p_ref, s_ref = params, tx.init(params)
    for _ in range(3):
        p_ref, s_ref = step(p_ref, s_ref)

    # sharded run
    p_sh, s_sh = params, tx.init(params)
    s_sh, n_sharded = shard_opt_state(s_sh, mesh)
    assert n_sharded >= 4  # mu/nu for both W and b
    for _ in range(3):
        p_sh, s_sh = step(p_sh, s_sh)

    # (c) same updates (to float tolerance: the sharded state compiles a
    # different XLA program, so fusion differences cost the last ulp)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(p_ref[k]), np.asarray(p_sh[k]), rtol=3e-6, atol=3e-6
        )

    # (a)+(b): moments still sharded after jitted steps, 1/n_dev per device
    mu_W = s_sh[0].mu["W"]
    shard_shapes = {tuple(sh.data.shape) for sh in mu_W.addressable_shards}
    assert shard_shapes == {(64 // n_dev, 32)}, shard_shapes
    assert len(mu_W.addressable_shards) == n_dev
