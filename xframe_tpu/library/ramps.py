"""Parameter schedules (HIO-β, shrink-wrap σ/threshold ramps).

Semantics match the reference exactly (mathLibrary.py:1026-1130) — these are
evaluated on the HOST while flattening the loop schedule into per-step
parameter arrays, so the device loop sees plain numbers.
"""
from __future__ import annotations

import numpy as np


class ExponentialRamp:
    """A·e^(x·exponent)+B through (0,start) and (stop_argument,stop), clamped
    at `stop` (mathLibrary.py:1033-1053)."""

    def __init__(self, start, stop, exponent, stop_argument=1):
        self.start, self.stop, self.stop_argument = start, stop, stop_argument
        if stop < start:
            exponent = -abs(exponent)
        else:
            exponent = abs(exponent)
        self.exponent = exponent
        self.A = (start - stop) / (1 - np.exp(exponent * stop_argument))
        self.B = start - self.A

    def __call__(self, x):
        val = self.A * np.exp(np.asarray(x, dtype=float) * self.exponent) + self.B
        if self.start > self.stop:
            return np.maximum(val, self.stop)
        return np.minimum(val, self.stop)


class LinearRamp:
    """start→stop linear with optional slope/stop clamp; undefined values fall
    back to defaults (mathLibrary.py:1056-1130)."""

    def __init__(self, start, stop=False, slope=False, default_start=False,
                 default_stop=False):
        if not isinstance(start, (list, tuple)):
            start = (start, 0)
        self.undefined = False
        if not _is_number(start[0]):
            if _is_number(default_start):
                start = (default_start, 0)
            else:
                self.undefined = True
        self.start = start
        stop_valid = False
        if isinstance(stop, (list, tuple)):
            s0 = stop[0] if _is_number(stop[0]) else (
                default_stop if _is_number(default_stop) else None)
            if s0 is not None and _is_number(stop[1]) and stop[1] >= start[1]:
                stop = (s0, stop[1])
                stop_valid = True
        self.stop, self.stop_is_defined = (stop, stop_valid)
        self.slope_is_defined = _is_number(slope)
        self.slope = slope
        if not self.undefined:
            self._set_params()

    def _set_params(self):
        start, stop, slope = self.start, self.stop, self.slope
        if not self.stop_is_defined and not self.slope_is_defined:
            self.A, self.B, self.C = 0.0, start[0], np.nan
            return
        if self.stop_is_defined:
            self.C = stop[0]
            self.A = 0.0 if stop[1] == start[1] else (stop[0] - start[0]) / (stop[1] - start[1])
            if self.slope_is_defined:
                self.A = slope
        elif slope == 0:
            self.C, self.A = np.nan, 0.0
        else:
            self.C, self.A = np.sign(slope) * np.inf, slope
        self.B = start[0] - self.A * start[1]

    def __call__(self, x):
        if self.undefined:
            return np.nan
        val = self.A * x + self.B
        if self.A < 0:
            return max(val, self.C)
        if self.A > 0:
            return min(val, self.C)
        return val


def _is_number(x):
    return (not isinstance(x, bool)) and np.issubdtype(np.asarray(x).dtype, np.number)
