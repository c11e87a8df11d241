"""Hierarchical performance logging for hot paths.

Counterpart of /root/reference/base/PyNucleus_base/performanceLogger.{pxd,pyx}:
`Timer` (:22), `PLogger` (:51), `LoggingPLogger` (:58), `FakePLogger` (:42).
The reference aggregates over MPI ranks; here values aggregate over repeated
entries (min/max/mean) and, when used inside shard_map-ped code, the caller
logs per-device values explicitly.
"""
import logging
import time
from collections import defaultdict

import numpy as np

__all__ = ['Timer', 'PLogger', 'FakePLogger', 'LoggingPLogger']


class FakePLogger:
    """Null logger (ref performanceLogger.pxd:42): Timers still measure but
    nothing is recorded."""

    def addValue(self, key, value):
        pass

    def empty(self):
        pass

    def report(self, totalsOnly=True):
        return ''

    def Timer(self, key, prefix=''):
        return Timer(prefix + key, self)


class PLogger(FakePLogger):
    """Value recorder (ref performanceLogger.pxd:51): every addValue appends
    under its key; report() prints min/mean/max/count."""

    def __init__(self):
        self.values = defaultdict(list)

    def addValue(self, key, value):
        self.values[key].append(value)

    def empty(self):
        self.values.clear()

    def report(self, totalsOnly=True):
        lines = []
        for key in sorted(self.values):
            vals = self.values[key]
            if all(isinstance(v, (int, float, np.integer, np.floating))
                   for v in vals):
                arr = np.asarray(vals, dtype=np.float64)
                if totalsOnly and len(arr) > 1:
                    lines.append('{}: sum={:.6g} (n={}, mean={:.4g}, '
                                 'min={:.4g}, max={:.4g})'.format(
                                     key, arr.sum(), len(arr), arr.mean(),
                                     arr.min(), arr.max()))
                else:
                    lines.append('{}: {}'.format(
                        key, arr[0] if len(arr) == 1 else arr.tolist()))
            else:
                lines.append('{}: {}'.format(key, vals))
        return '\n'.join(lines)

    def __repr__(self):
        return self.report()


class LoggingPLogger(PLogger):
    """PLogger that also emits to python logging as values arrive
    (ref performanceLogger.pxd:58)."""

    def __init__(self, logger=None, loggerLevel=logging.INFO):
        super().__init__()
        self.logger = logger or logging.getLogger(__name__)
        self.loggerLevel = loggerLevel

    def addValue(self, key, value):
        super().addValue(key, value)
        self.logger.log(self.loggerLevel, '%s: %s', key, value)


class Timer:
    """Context timer recording elapsed seconds into a PLogger
    (ref performanceLogger.pxd:22).  Synchronizes outstanding device work on
    exit so jitted sections are charged to the right label."""

    def __init__(self, key, parent=None, forceMemRegionOff=True,
                 sync=True):
        self.key = key
        self.parent = parent if parent is not None else FakePLogger()
        self.sync = sync
        self.elapsed = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            try:
                import jax
                jax.effects_barrier()
            except Exception:
                pass
        self.elapsed = time.perf_counter() - self.start
        self.parent.addValue(self.key, self.elapsed)
        return False
