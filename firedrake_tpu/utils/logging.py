"""Logging (reference: firedrake/logging.py:57-92 — per-package loggers
with rank-aware handlers; here process-0-aware under multi-host JAX)."""
from __future__ import annotations

import logging as _logging

DEBUG = _logging.DEBUG
INFO = _logging.INFO
WARNING = _logging.WARNING
ERROR = _logging.ERROR
CRITICAL = _logging.CRITICAL

packages = ("firedrake_tpu",)

logger = _logging.getLogger("firedrake_tpu")


def _is_rank0():
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def set_log_level(level):
    """Reference: firedrake/logging.py set_log_level."""
    for p in packages:
        _logging.getLogger(p).setLevel(level)


def set_level(level):
    set_log_level(level)


def _ensure_handler():
    if not logger.handlers:
        h = _logging.StreamHandler()
        h.setFormatter(_logging.Formatter("%(name)s:%(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(WARNING if not _is_rank0() else INFO)


_ensure_handler()


def info(*args, **kwargs):
    logger.info(*args, **kwargs)


def warning(*args, **kwargs):
    logger.warning(*args, **kwargs)


def error(*args, **kwargs):
    logger.error(*args, **kwargs)


def debug(*args, **kwargs):
    logger.debug(*args, **kwargs)


def log(level, *args, **kwargs):
    logger.log(level, *args, **kwargs)


RED = "\033[1;37;31m%s\033[0m"
BLUE = "\033[1;37;34m%s\033[0m"
GREEN = "\033[1;37;32m%s\033[0m"


def info_red(message, *args, **kwargs):
    info(RED % message, *args, **kwargs)


def info_blue(message, *args, **kwargs):
    info(BLUE % message, *args, **kwargs)


def info_green(message, *args, **kwargs):
    info(GREEN % message, *args, **kwargs)
