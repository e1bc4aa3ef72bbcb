"""Native (C++) runtime components: mmap stores, fast host-side paths.

The shared library auto-builds on first import when missing, mirroring the
reference's self-rebuild (pecos/core/base.py:499-524). Staleness is decided
by a content hash of the sources stored next to the .so (mtimes are not
preserved by git checkouts, so they cannot be trusted).
"""

import hashlib
import logging
import os
import subprocess

LOGGER = logging.getLogger(__name__)

_CORE_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_CORE_DIR, "libpecos_tpu_core.so")
_HASH_PATH = _SO_PATH + ".srchash"
_SOURCES = [
    os.path.join(_CORE_DIR, "mmap_store.cpp"),
    os.path.join(_CORE_DIR, "tokenizer.cpp"),
    os.path.join(_CORE_DIR, "spgemm.cpp"),
]
_SOURCES = [s for s in _SOURCES if os.path.exists(s)]


def _source_hash() -> str:
    h = hashlib.sha256()
    for src in _SOURCES:
        with open(src, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def build_core(force: bool = False) -> str:
    """Compile the native core if the .so is missing or its source hash changed."""
    want = _source_hash()
    have = None
    if os.path.exists(_HASH_PATH):
        with open(_HASH_PATH) as f:
            have = f.read().strip()
    if force or not os.path.exists(_SO_PATH) or have != want:
        cmd = [
            "g++",
            "-shared",
            "-fPIC",
            "-O3",
            "-std=c++17",
            "-fopenmp",
            *_SOURCES,
            "-o",
            _SO_PATH,
        ]
        LOGGER.info("building native core: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
        with open(_HASH_PATH, "w") as f:
            f.write(want)
    return _SO_PATH
