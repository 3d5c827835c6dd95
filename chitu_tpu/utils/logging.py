"""Process-rank-prefixed logging.

Capability parity with the reference's rank-prefixed logger
(reference: chitu/chitu_main.py:23-35).
"""

from __future__ import annotations

import logging
import sys

_LOGGER_NAME = "chitu_tpu"
_initialized = False


class _RankFilter(logging.Filter):
    def __init__(self, rank: int):
        super().__init__()
        self.rank = rank

    def filter(self, record: logging.LogRecord) -> bool:
        record.rank = self.rank
        return True


def init_logger(rank: int = 0, level: int = logging.INFO) -> logging.Logger:
    global _initialized
    logger = logging.getLogger(_LOGGER_NAME)
    if _initialized:
        return logger
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        logging.Formatter(
            "[%(asctime)s][Rank %(rank)s][%(levelname)s] %(message)s",
            datefmt="%H:%M:%S",
        )
    )
    handler.addFilter(_RankFilter(rank))
    logger.addHandler(handler)
    logger.setLevel(level)
    logger.propagate = False
    _initialized = True
    return logger


def get_logger() -> logging.Logger:
    if not _initialized:
        init_logger()
    return logging.getLogger(_LOGGER_NAME)
