"""Native (C++) runtime components: mmap stores, fast host-side paths.

The shared library auto-builds on first import when missing, mirroring the
reference's self-rebuild (pecos/core/base.py:499-524).
"""

import logging
import os
import subprocess

LOGGER = logging.getLogger(__name__)

_CORE_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_CORE_DIR, "libpecos_tpu_core.so")
_SRC = os.path.join(_CORE_DIR, "mmap_store.cpp")


def build_core(force: bool = False) -> str:
    """Compile the native core if the .so is missing or stale."""
    if (
        force
        or not os.path.exists(_SO_PATH)
        or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC)
    ):
        cmd = [
            "g++",
            "-shared",
            "-fPIC",
            "-O3",
            "-std=c++17",
            "-fopenmp",
            _SRC,
            "-o",
            _SO_PATH,
        ]
        LOGGER.info("building native core: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
    return _SO_PATH
