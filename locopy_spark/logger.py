"""Logging parity with the reference client (locopy/logger.py:all).

Same contract: ``get_logger(name, log_level)`` returns a configured
``logging.Logger`` with a single stream handler and the library's
standard format, idempotent across calls.
"""

from __future__ import annotations

import logging

DEFAULT_FORMAT = "%(asctime)s %(levelname)s - %(name)s: %(message)s"


def get_logger(
    name: str | None = None, log_level: int = logging.INFO
) -> logging.Logger:
    """Return a logger with one stream handler (no duplicates on
    repeated calls) at ``log_level``."""
    logger = logging.getLogger(name or "locopy_spark")
    if not any(
        isinstance(h, logging.StreamHandler) for h in logger.handlers
    ):
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(DEFAULT_FORMAT))
        logger.addHandler(handler)
    logger.setLevel(log_level)
    return logger
