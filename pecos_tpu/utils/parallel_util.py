"""Host-side multiprocess map helper (reference: pecos/utils/parallel_util.py).

On TPU hosts, heavy parallel compute belongs on the device; this helper covers
the IO/preprocessing cases (corpus parsing, shard writing) where process
fan-out still pays.
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Callable, Iterable, List, Optional


def run_parallel(
    fn: Callable, items: Iterable, num_workers: Optional[int] = None, chunksize: int = 1
) -> List:
    """Map fn over items with a process pool; falls back to serial for <=1 worker."""
    items = list(items)
    if num_workers is None:
        num_workers = mp.cpu_count()
    if num_workers <= 1 or len(items) <= 1:
        return [fn(x) for x in items]
    with mp.get_context("spawn").Pool(num_workers) as pool:
        return pool.map(fn, items, chunksize=chunksize)
