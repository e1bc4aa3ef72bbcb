"""Pre-flight communication self-test suite.

Reference: pecos/distributed/diagnostic_tools/mpi_comm.py:60-150 (echo /
send-recv / bcast / scatter-gather probes incl. deliberate failure paths) and
deepspeed_comm.py:72 (timeout probe).  Here the checks run against any
DistComm implementation plus a jax-collective probe for the device mesh.
"""

from __future__ import annotations

import logging
from typing import List

import numpy as np

from pecos_tpu.parallel.comm import DistComm

LOGGER = logging.getLogger(__name__)


def run_comm_self_test(comm: DistComm, verbose: bool = True) -> List[str]:
    """Exercise bcast/scatter/gather round trips; returns list of failures."""
    failures = []
    rank, size = comm.get_rank(), comm.get_size()

    def check(name, ok):
        if verbose:
            LOGGER.info(f"[rank {rank}] {name}: {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(name)

    # bcast round trip
    payload = {"msg": "hello", "arr": np.arange(5)}
    got = comm.bcast(payload if rank == 0 else None, root=0)
    check("bcast", got is not None and got["msg"] == "hello" and (got["arr"] == np.arange(5)).all())

    # scatter
    try:
        parts = [f"part{r}" for r in range(size)] if rank == 0 else None
        mine = comm.scatter(parts, root=0)
        check("scatter", mine == f"part{rank}")
    except NotImplementedError:
        check("scatter", True)  # optional on some backends

    # gather
    try:
        gathered = comm.gather(rank * 10, root=0)
        if rank == 0:
            check("gather", gathered == [r * 10 for r in range(size)])
        else:
            check("gather", gathered is None)
    except NotImplementedError:
        check("gather", True)

    return failures


def run_device_collective_probe() -> bool:
    """psum over all local devices — verifies the data-plane mesh is healthy."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, axis_names=("d",))
    x = jnp.ones((len(devices), 8), jnp.float32)
    sh = NamedSharding(mesh, P("d", None))
    x = jax.device_put(x, sh)
    total = jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(mesh, P()))(x)
    return float(total) == len(devices) * 8.0
