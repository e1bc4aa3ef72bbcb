"""Logging setup with verbosity levels 0-3 (reference: pecos/utils/logging_util.py:13-37)."""

from __future__ import annotations

import logging
import sys

LOGGING_LEVELS = {
    0: logging.ERROR,
    1: logging.WARNING,
    2: logging.INFO,
    3: logging.DEBUG,
}


def setup_logging_config(level: int = 1):
    """Configure root logging; ``level`` is a verbosity int 0-3 (not a logging level)."""
    log_level = LOGGING_LEVELS.get(level, logging.DEBUG)
    logging.basicConfig(
        level=log_level,
        stream=sys.stdout,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        force=True,
    )
