# Copyright 2026. Apache License 2.0.
"""Leveled, process-0-gated stdout logger.

Mirrors the reference logger (medicalseg/utils/logger.py:24-48): leveled
lines with timestamps, only emitted on the primary host/process. In JAX
the gate is ``jax.process_index() == 0`` instead of Paddle's local_rank.
"""

import contextlib
import sys
import time

levels = {0: "ERROR", 1: "WARNING", 2: "INFO", 3: "DEBUG"}
log_level = 2


def _is_primary():
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def log(level=2, message=""):
    if _is_primary():
        current_time = time.time()
        time_array = time.localtime(current_time)
        current_time = time.strftime("%Y-%m-%d %H:%M:%S", time_array)
        if log_level >= level:
            print("{} [{}]\t{}".format(current_time, levels[level],
                                       message).encode("utf-8").decode(
                                           "latin1"))
            sys.stdout.flush()


def debug(message=""):
    log(level=3, message=message)


def info(message=""):
    log(level=2, message=message)


def warning(message=""):
    log(level=1, message=message)


def error(message=""):
    log(level=0, message=message)


@contextlib.contextmanager
def quiet():
    """Temporarily silence info/debug output (used by tests)."""
    global log_level
    old = log_level
    log_level = 1
    try:
        yield
    finally:
        log_level = old
