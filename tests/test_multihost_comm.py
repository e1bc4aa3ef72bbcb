"""MultihostComm over REAL processes: 2 subprocesses connected through
jax.distributed.initialize + the coordination-service KV store.

Round 2 shipped MultihostComm with only thread-fake coverage; this exercises
the actual uint8-codec collectives (bcast/scatter/gather) and chunked KV
point-to-point (send/recv) across process boundaries — the reference's
analogous pre-flight lives in distributed/diagnostic_tools/mpi_comm.py:60-150.
"""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, pickle, sys
import jax

jax.config.update("jax_platforms", "cpu")
rank = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank
)

import numpy as np
import scipy.sparse as smat

from pecos_tpu.parallel.comm import MultihostComm
from pecos_tpu.utils.cluster_util import ClusterChain

comm = MultihostComm()
assert comm.get_size() == 2 and comm.get_rank() == rank

# bcast: a ClusterChain of scipy matrices from rank 0
if rank == 0:
    C1 = smat.csc_matrix(np.kron(np.eye(2), np.ones((2, 1), np.float32)))
    C2 = smat.csc_matrix(np.kron(np.eye(4), np.ones((4, 1), np.float32)))
    chain = ClusterChain([C1, C2])
else:
    chain = None
chain = comm.bcast(chain, root=0)

# scatter: per-rank label ranges
parts = [("labels", list(range(0, 8))), ("labels", list(range(8, 16)))] if rank == 0 else None
mine = comm.scatter(parts, root=0)

# gather: per-rank model dicts with arrays (exercises max-len padding)
model = {"rank": rank, "W": np.full((3 + rank, 2), float(rank + 1), np.float32)}
gathered = comm.gather(model, root=0)

# p2p both directions, multiple tags, with a value larger than one KV chunk
if rank == 0:
    comm.send({"big": np.arange(600_000, dtype=np.int64)}, dest=1, tag=7)
    echo = comm.recv(source=1, tag=8)
else:
    big = comm.recv(source=0, tag=7)
    comm.send({"sum": int(big["big"].sum())}, dest=0, tag=8)

result = {
    "rank": rank,
    "chain_shapes": [tuple(C.shape) for C in chain],
    "chain_ok": bool((chain[1].toarray().sum() == 16)),
    "mine": mine,
}
if rank == 0:
    result["gathered_ranks"] = [g["rank"] for g in gathered]
    result["gathered_w1"] = gathered[1]["W"].tolist()
    result["echo_sum"] = echo["sum"]
else:
    result["gathered_is_none"] = gathered is None
with open(out_path, "wb") as f:
    pickle.dump(result, f)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_multihost_comm_two_processes(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    outs = [str(tmp_path / f"out{r}.pkl") for r in range(2)]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the coordination service is CPU-only here; make sure no TPU claim races
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(r), str(port), outs[r]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for r in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    with open(outs[0], "rb") as f:
        r0 = pickle.load(f)
    with open(outs[1], "rb") as f:
        r1 = pickle.load(f)

    # bcast reached both ranks intact
    assert r0["chain_shapes"] == r1["chain_shapes"] == [(4, 2), (16, 4)]
    assert r0["chain_ok"] and r1["chain_ok"]
    # scatter delivered per-rank slices
    assert r0["mine"] == ("labels", list(range(0, 8)))
    assert r1["mine"] == ("labels", list(range(8, 16)))
    # gather assembled both models on root only
    assert r0["gathered_ranks"] == [0, 1]
    assert np.allclose(np.asarray(r0["gathered_w1"]), 2.0)
    assert r1["gathered_is_none"]
    # p2p round trip: rank1 summed the >1-chunk payload correctly
    assert r0["echo_sum"] == sum(range(600_000))
