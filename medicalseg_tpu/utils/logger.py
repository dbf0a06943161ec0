# Copyright 2026. Apache License 2.0.
"""Process-0-gated console logging.

Capability parity with the reference's logger (medicalseg/utils/logger.py:
24-48): timestamped, leveled lines printed only by the primary process of a
multi-host run. Implemented on top of the stdlib :mod:`logging` machinery
with a module-level verbosity knob so tests can silence it.
"""

import contextlib
import logging
import sys

# Numeric verbosity: 0=errors only .. 3=debug. Mirrors the reference's
# level numbering so callers/tests can poke ``logger.log_level`` directly.
log_level = 2

_LEVEL_NAMES = ("ERROR", "WARNING", "INFO", "DEBUG")
_PY_LEVELS = (logging.ERROR, logging.WARNING, logging.INFO, logging.DEBUG)

_logger = logging.getLogger("medicalseg_tpu")
if not _logger.handlers:
    _handler = logging.StreamHandler(sys.stdout)
    _handler.setFormatter(
        logging.Formatter(fmt="%(asctime)s [%(levelname)s]\t%(message)s",
                          datefmt="%Y-%m-%d %H:%M:%S"))
    _logger.addHandler(_handler)
    _logger.setLevel(logging.DEBUG)
    _logger.propagate = False


def _primary_process():
    """True on single-process runs and on process 0 of multi-host runs."""
    try:
        import jax
        return jax.process_index() == 0
    except Exception:  # jax unavailable or uninitialized backend
        return True


def log(level=2, message=""):
    if level > log_level or not _primary_process():
        return
    _logger.log(_PY_LEVELS[level], message)
    for h in _logger.handlers:
        h.flush()


def error(message=""):
    log(0, message)


def warning(message=""):
    log(1, message)


def info(message=""):
    log(2, message)


def debug(message=""):
    log(3, message)


@contextlib.contextmanager
def quiet():
    """Temporarily restrict output to warnings/errors (used by tests)."""
    global log_level
    saved = log_level
    log_level = 1
    try:
        yield
    finally:
        log_level = saved
