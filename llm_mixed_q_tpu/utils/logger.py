"""Root logger with level control (reference: src/llm_mixed_q/utils/logger.py)."""

from __future__ import annotations

import logging


def get_logger(name: str = "llm_mixed_q_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("[%(levelname)s %(name)s] %(message)s")
        )
        logger.addHandler(handler)
        logger.propagate = False
    return logger


def set_logging_verbosity(level: str = "info", name: str = "llm_mixed_q_tpu"):
    level_map = {
        "debug": logging.DEBUG,
        "info": logging.INFO,
        "warning": logging.WARNING,
        "error": logging.ERROR,
    }
    get_logger(name).setLevel(level_map[level.lower()])
