"""Wall-clock trace logging.

The reference prefixes every log line with ``#TIME <seconds-since-start>``
by hand at each call site (``global_names.TSTART``; pattern throughout
``src/infer_breakpoint_graph.py`` etc.).  Here a logging.Formatter injects
the same prefix automatically so modules just use plain ``logging``.
"""
from __future__ import annotations

import logging
import time

_TSTART = time.time()


def reset_epoch() -> None:
    global _TSTART
    _TSTART = time.time()


def elapsed() -> float:
    return time.time() - _TSTART


class TimeTagFormatter(logging.Formatter):
    """``[name:LEVEL]\\t#TIME <t>\\t<message>`` — reference log line shape."""

    def format(self, record: logging.LogRecord) -> str:
        base = super().format(record)
        return f"[{record.name}:{record.levelname}]\t#TIME {elapsed():.4f}\t{base}"


def setup_file_logging(log_fn: str, level: int = logging.DEBUG) -> None:
    reset_epoch()
    handler = logging.FileHandler(log_fn, mode="w")
    handler.setFormatter(TimeTagFormatter("%(message)s"))
    # scope to the engine's loggers so third-party DEBUG noise (jax etc.)
    # stays out of the trace file
    pkg = logging.getLogger("coral_tpu")
    pkg.setLevel(level)
    pkg.addHandler(handler)
    pkg.propagate = False
