"""Host-level control-plane communication (DistComm-shaped).

The reference defines a DistComm ABC over mpi4py
(pecos/distributed/comm/abs_dist_comm.py:14-94) used to scatter label
subsets, gather trained sub-models, and broadcast cluster chains.  On TPU
pods the data plane is jax collectives over ICI/DCN; this layer only carries
small host objects (chains, configs, pickled sub-models) between processes.

Two implementations:
- DummyComm: single-process fake (reference diagnostic_tools/test_util.py:14-53)
  used by tests and single-host runs.
- MultihostComm: rides jax.experimental.multihost_utils when running with
  multiple JAX processes (one per host).
"""

from __future__ import annotations

import abc
from typing import Any, List, Optional


class DistComm(abc.ABC):
    """Abstract send/recv/bcast/scatter/gather of picklable host objects."""

    @abc.abstractmethod
    def get_size(self) -> int: ...

    @abc.abstractmethod
    def get_rank(self) -> int: ...

    @abc.abstractmethod
    def send(self, obj: Any, dest: int, tag: int = 0) -> None: ...

    @abc.abstractmethod
    def recv(self, source: int, tag: int = 0) -> Any: ...

    @abc.abstractmethod
    def bcast(self, obj: Any, root: int = 0) -> Any: ...

    @abc.abstractmethod
    def scatter(self, objs: Optional[List[Any]], root: int = 0) -> Any: ...

    @abc.abstractmethod
    def gather(self, obj: Any, root: int = 0) -> Optional[List[Any]]: ...


class DummyComm(DistComm):
    """In-process fake with a single rank; send/recv pairs go through a queue."""

    def __init__(self):
        self._mailbox = {}

    def get_size(self) -> int:
        return 1

    def get_rank(self) -> int:
        return 0

    def send(self, obj, dest: int, tag: int = 0) -> None:
        if dest != 0:
            raise ValueError("DummyComm only has rank 0")
        self._mailbox.setdefault(tag, []).append(obj)

    def recv(self, source: int, tag: int = 0):
        if source != 0:
            raise ValueError("DummyComm only has rank 0")
        box = self._mailbox.get(tag, [])
        if not box:
            raise RuntimeError(f"DummyComm.recv: no message with tag {tag}")
        return box.pop(0)

    def bcast(self, obj, root: int = 0):
        return obj

    def scatter(self, objs, root: int = 0):
        if objs is None or len(objs) != 1:
            raise ValueError("DummyComm.scatter expects a list of length 1")
        return objs[0]

    def gather(self, obj, root: int = 0):
        return [obj]


class MultihostComm(DistComm):
    """Multi-process comm over jax multihost utilities (DCN control plane)."""

    def __init__(self):
        import jax

        self._rank = jax.process_index()
        self._size = jax.process_count()

    def get_size(self) -> int:
        return self._size

    def get_rank(self) -> int:
        return self._rank

    def _exchange(self, obj, from_rank: int):
        from jax.experimental import multihost_utils

        return multihost_utils.broadcast_one_to_all(
            obj, is_source=(self._rank == from_rank)
        )

    def send(self, obj, dest: int, tag: int = 0) -> None:
        raise NotImplementedError(
            "point-to-point host sends ride gather(); use gather/scatter instead"
        )

    def recv(self, source: int, tag: int = 0):
        raise NotImplementedError(
            "point-to-point host recvs ride scatter(); use gather/scatter instead"
        )

    def bcast(self, obj, root: int = 0):
        from jax.experimental import multihost_utils

        return multihost_utils.broadcast_one_to_all(obj, is_source=(self._rank == root))

    def scatter(self, objs, root: int = 0):
        full = self.bcast(objs, root=root)
        return full[self._rank]

    def gather(self, obj, root: int = 0):
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(obj)
        return list(gathered) if self._rank == root else None
