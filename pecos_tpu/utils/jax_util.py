"""Device/runtime helpers — the JAX counterpart of the reference's torch_util
(pecos/utils/torch_util.py:20-100: device setup, seeding, grad clipping).
Gradient clipping lives in the optax chains; what remains is device selection,
seeding, and a couple of conveniences.
"""

from __future__ import annotations

import os
import random
from typing import Optional, Tuple

import numpy as np


def setup_device(use_accelerator: bool = True) -> Tuple[str, int]:
    """Returns (platform, n_devices); forces CPU when use_accelerator=False."""
    import jax

    if not use_accelerator:
        jax.config.update("jax_platforms", "cpu")
    devices = jax.devices()
    return devices[0].platform, len(devices)


def set_seed(seed: int = 0):
    """Seed python/numpy; returns a jax PRNG key (jax is stateless by design)."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def enable_compilation_cache(path: Optional[str] = None):
    """Persistent XLA compilation cache — big win for repeated TPU runs.

    Idempotent and respectful of user config: if a cache dir is already set
    (env or a prior jax.config.update), it is left alone.  Called on package
    import so library/CLI entry points always benefit (remote TPU compiles
    here cost minutes; a cache hit loads in seconds).
    """
    import jax

    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:  # very old jax; nothing to do
        return
    if current and path is None:
        return
    path = path or os.path.expanduser("~/.cache/pecos_tpu_jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_HOST_ALLOCATOR_TUNED = False


def tune_host_allocator():
    """Keep freed large malloc blocks in the process heap instead of
    returning them to the OS.

    On the VMs this framework targets, first-touch page faults cost ~250 us
    per 4 KiB page (nested-virtualization EPT faults): a fresh 400 MB numpy
    allocation pays ~15-25 s of fault time, while writing reused pages runs
    at ~6 GB/s — a >100x difference, measured.  glibc serves large requests
    with fresh mmaps and unmaps them on free, so every big temporary in the
    host-side pipelines (tokenizer vocab assembly, CSR shuffles, edge
    grouping) repays the fault cost.  mallopt(M_MMAP_MAX=0) routes large
    allocations through the (reused) heap and M_TRIM_THRESHOLD=INT_MAX stops
    the heap being shrunk.  No-op outside glibc.
    """
    global _HOST_ALLOCATOR_TUNED
    if _HOST_ALLOCATOR_TUNED or os.environ.get("PECOS_TPU_NO_MALLOC_TUNE") == "1":
        return
    _HOST_ALLOCATOR_TUNED = True
    try:
        import ctypes

        libc = ctypes.CDLL(None)
        M_TRIM_THRESHOLD, M_MMAP_MAX = -1, -4
        libc.mallopt(M_MMAP_MAX, 0)
        libc.mallopt(M_TRIM_THRESHOLD, 2**31 - 1)
    except Exception:  # non-glibc platforms: harmless to skip
        pass
