"""Logging setup (reference xframe/logger.py): one shared logger + xprint."""
from __future__ import annotations

import logging
import sys
import time

log = logging.getLogger("xframe_tpu")


def setup_logging(level="INFO", stream=None):
    log.setLevel(getattr(logging, str(level).upper(), logging.INFO))
    if not log.handlers:
        h = logging.StreamHandler(stream or sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s: %(message)s"))
        log.addHandler(h)
    return log


def xprint(*args, **kwargs):
    """User-facing progress output (reference pythonLibrary.xprint)."""
    print(*args, **kwargs, flush=True)


class Timer:
    """Phase timer: `with Timer('setup') as t: ...` then t.seconds."""

    def __init__(self, name="", report=None):
        self.name = name
        self.report = report
        self.seconds = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        if self.report:
            self.report(f"{self.name}: {self.seconds:.2f}s")
        return False
