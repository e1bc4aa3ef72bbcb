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
import base64
import pickle
import queue
import threading
from typing import Any, List, Optional

import numpy as np


def _obj_to_u8(obj: Any) -> np.ndarray:
    return np.frombuffer(pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL), dtype=np.uint8)


def _u8_to_obj(buf: np.ndarray, n: int) -> Any:
    return pickle.loads(np.asarray(buf[:n], dtype=np.uint8).tobytes())


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
    """Multi-process comm over jax multihost utilities (DCN control plane).

    Payloads are arbitrary picklable host objects (ClusterChains of scipy
    matrices, dicts of sub-models, ...), so every collective serializes to a
    uint8 array first: jax's broadcast_one_to_all / process_allgather only
    accept numeric array pytrees of identical shape across processes.
    Point-to-point send/recv rides the jax distributed KV store (the same
    coordination service backing multihost init), chunked for large values.
    """

    _KV_CHUNK = 1 << 20  # base64 chars per KV value

    def __init__(self, timeout_ms: int = 600_000):
        import jax

        self._rank = jax.process_index()
        self._size = jax.process_count()
        self._timeout_ms = timeout_ms
        self._send_seq: dict = {}
        self._recv_seq: dict = {}

    def get_size(self) -> int:
        return self._size

    def get_rank(self) -> int:
        return self._rank

    # -- collectives (bytes codec over multihost_utils) ------------------------
    def bcast(self, obj, root: int = 0):
        import jax.numpy as jnp
        from jax.experimental import multihost_utils

        is_src = self._rank == root
        payload = _obj_to_u8(obj) if is_src else None
        n = multihost_utils.broadcast_one_to_all(
            jnp.asarray(len(payload) if is_src else 0, jnp.int64), is_source=is_src
        )
        n = int(n)
        buf = np.zeros(max(n, 1), np.uint8)
        if is_src:
            buf[: len(payload)] = payload
        out = multihost_utils.broadcast_one_to_all(buf, is_source=is_src)
        return _u8_to_obj(np.asarray(out), n)

    def scatter(self, objs, root: int = 0):
        if self._rank == root and (objs is None or len(objs) != self._size):
            raise ValueError(f"scatter needs a list of length {self._size} on root")
        full = self.bcast(objs, root=root)
        return full[self._rank]

    def gather(self, obj, root: int = 0):
        import jax.numpy as jnp
        from jax.experimental import multihost_utils

        payload = _obj_to_u8(obj)
        lens = multihost_utils.process_allgather(jnp.asarray(len(payload), jnp.int64))
        maxlen = int(np.max(np.asarray(lens)))
        buf = np.zeros(max(maxlen, 1), np.uint8)
        buf[: len(payload)] = payload
        all_bufs = multihost_utils.process_allgather(buf)  # (size, maxlen)
        if self._rank != root:
            return None
        all_bufs = np.asarray(all_bufs)
        return [_u8_to_obj(all_bufs[r], int(lens[r])) for r in range(self._size)]

    # -- point-to-point over the jax distributed KV store ----------------------
    def _kv_client(self):
        from jax._src import distributed

        client = distributed.global_state.client
        if client is None:
            raise RuntimeError(
                "MultihostComm.send/recv needs the jax coordination service: "
                "call jax.distributed.initialize() at process start"
            )
        return client

    def send(self, obj, dest: int, tag: int = 0) -> None:
        client = self._kv_client()
        seq_key = (dest, tag)
        seq = self._send_seq.get(seq_key, 0)
        self._send_seq[seq_key] = seq + 1
        data = base64.b64encode(pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)).decode()
        prefix = f"pecos_p2p/{self._rank}/{dest}/{tag}/{seq}"
        chunks = [data[i : i + self._KV_CHUNK] for i in range(0, len(data), self._KV_CHUNK)] or [""]
        for i, c in enumerate(chunks[1:], start=1):
            client.key_value_set(f"{prefix}/c{i}", c)
        # chunk 0 carries the chunk count and is set LAST: its arrival means
        # the rest are already visible
        client.key_value_set(f"{prefix}/c0", f"{len(chunks)}:" + chunks[0])

    def recv(self, source: int, tag: int = 0):
        client = self._kv_client()
        seq_key = (source, tag)
        seq = self._recv_seq.get(seq_key, 0)
        self._recv_seq[seq_key] = seq + 1
        prefix = f"pecos_p2p/{source}/{self._rank}/{tag}/{seq}"
        head = client.blocking_key_value_get(f"{prefix}/c0", self._timeout_ms)
        n_chunks_s, _, first = head.partition(":")
        parts = [first]
        for i in range(1, int(n_chunks_s)):
            parts.append(client.blocking_key_value_get(f"{prefix}/c{i}", self._timeout_ms))
        return pickle.loads(base64.b64decode("".join(parts)))


class _FakeClusterState:
    """Shared state for FakeClusterComm ranks running as threads."""

    def __init__(self, size: int):
        self.size = size
        self.barrier = threading.Barrier(size)
        self.slot: List[Any] = [None] * size
        self.queues: dict = {}
        self.qlock = threading.Lock()

    def queue_for(self, src: int, dst: int, tag: int) -> "queue.Queue":
        with self.qlock:
            return self.queues.setdefault((src, dst, tag), queue.Queue())


class FakeClusterComm:
    """Factory for an in-process N-rank comm: each rank runs in its own
    thread, collectives synchronize on barriers (the N-rank generalization of
    the reference's single-rank DummyComm, diagnostic_tools/test_util.py)."""

    def __init__(self, size: int):
        self.state = _FakeClusterState(size)

    def rank_comm(self, rank: int) -> "FakeRankComm":
        return FakeRankComm(self.state, rank)


class FakeRankComm(DistComm):
    def __init__(self, state: _FakeClusterState, rank: int):
        self._state = state
        self._rank = rank

    def get_size(self) -> int:
        return self._state.size

    def get_rank(self) -> int:
        return self._rank

    def send(self, obj, dest: int, tag: int = 0) -> None:
        self._state.queue_for(self._rank, dest, tag).put(obj)

    def recv(self, source: int, tag: int = 0):
        return self._state.queue_for(source, self._rank, tag).get(timeout=600)

    def bcast(self, obj, root: int = 0):
        st = self._state
        if self._rank == root:
            st.slot[root] = obj
        st.barrier.wait()
        out = st.slot[root]
        st.barrier.wait()
        return out

    def scatter(self, objs, root: int = 0):
        st = self._state
        if self._rank == root:
            if objs is None or len(objs) != st.size:
                raise ValueError(f"scatter needs a list of length {st.size} on root")
            st.slot[root] = objs
        st.barrier.wait()
        out = st.slot[root][self._rank]
        st.barrier.wait()
        return out

    def gather(self, obj, root: int = 0):
        st = self._state
        st.slot[self._rank] = obj
        st.barrier.wait()
        out = list(st.slot) if self._rank == root else None
        st.barrier.wait()
        return out
