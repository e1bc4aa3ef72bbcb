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
    """Persistent XLA compilation cache — big win for repeated TPU runs."""
    import jax

    path = path or os.path.expanduser("~/.cache/pecos_tpu_jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
