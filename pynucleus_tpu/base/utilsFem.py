"""Driver / problem / output framework.

Hardware-independent counterpart of /root/reference/base/PyNucleus_base/utilsFem.py:
  - driver (ref :891): argparse CLI with grouped flags, output groups with
    tolerance-tagged values, YAML test-cache diffing (ref :1191-1241,1337)
  - classWithComputedDependencies / @generates (ref :1552,1571): declarative
    lazy dependency DAG of computed properties
  - problem (ref :1891): base class declaring driver args + generated values
  - TimerManager (ref :34)

This layer is pure Python; it is what the regression test suite drives.
"""
from __future__ import annotations

import argparse
import inspect
import logging
import sys
import time

import numpy as np

__all__ = ['TimerManager', 'outputGroup', 'driver', 'generates',
           'classWithComputedDependencies', 'problem', 'diffDict',
           'parametrizedArg', 'runDriver']

LOGGER = logging.getLogger(__name__)


class Timer:
    def __init__(self, label, manager=None):
        self.label = label
        self.manager = manager

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        if self.manager is not None:
            self.manager.record(self.label, self.elapsed)

    @property
    def interval(self):
        return self.elapsed


class TimerManager:
    def __init__(self, logger=None):
        self.durations = {}
        self.logger = logger

    def record(self, label, elapsed):
        self.durations.setdefault(label, []).append(elapsed)
        if self.logger is not None:
            self.logger.info('%s: %.4g s', label, elapsed)

    def timer(self, label):
        return Timer(label, self)

    def __call__(self, label):
        return self.timer(label)

    def report(self):
        lines = []
        for label, ts in self.durations.items():
            lines.append('{:40} {:3} calls  total {:10.4g} s'.format(
                label, len(ts), sum(ts)))
        return '\n'.join(lines)


class outputParam:
    def __init__(self, label, value, fmt=None, aTol=None, rTol=None, tested=False):
        self.label = label
        self.value = value
        self.fmt = fmt
        self.aTol = aTol
        self.rTol = rTol
        self.tested = tested


class outputGroup:
    def __init__(self, name='', aTol=None, rTol=None, tested=False):
        self.name = name
        self.aTol = aTol
        self.rTol = rTol
        self.tested = tested
        self.entries = []

    def add(self, label, value, fmt=None, aTol=None, rTol=None, tested=None):
        aTol = aTol if aTol is not None else self.aTol
        rTol = rTol if rTol is not None else self.rTol
        tested = tested if tested is not None else self.tested
        self.entries.append(outputParam(label, value, fmt, aTol, rTol, tested))

    def toDict(self, tested=False):
        d = {}
        for p in self.entries:
            if tested and not (p.tested or self.tested):
                continue
            v = p.value
            if isinstance(v, (np.floating,)):
                v = float(v)
            elif isinstance(v, (np.integer,)):
                v = int(v)
            elif hasattr(v, 'item') and getattr(v, 'ndim', 1) == 0:
                v = v.item()
            d[p.label] = v
        return d

    def log(self, logger=None):
        out = str(self)
        (logger or LOGGER).info('\n%s', out)
        print(out)

    def __str__(self):
        lines = [self.name + ':'] if self.name else []
        width = max((len(p.label) for p in self.entries), default=0)
        for p in self.entries:
            v = p.value
            if isinstance(v, float) or isinstance(v, np.floating):
                sval = '{:.6e}'.format(v)
            else:
                sval = str(v)
            lines.append('  {:{w}} {}'.format(p.label + ':', sval, w=width + 1))
        return '\n'.join(lines)


def diffDict(d1, d2, aTol=1e-9, rTolDefault=1e-12, tols=None):
    """Compare two nested dicts of scalars; return list of mismatches.

    Mirrors ref utilsFem.py:1337 diffDict.  ``tols`` maps label -> (aTol, rTol).
    """
    diffs = []
    keys = set(d1) | set(d2)
    for k in keys:
        if k not in d1:
            diffs.append((k, 'missing in first', d2[k]))
            continue
        if k not in d2:
            diffs.append((k, d1[k], 'missing in second'))
            continue
        v1, v2 = d1[k], d2[k]
        if isinstance(v1, dict) and isinstance(v2, dict):
            diffs.extend([(f'{k}.{kk}', a, b) for kk, a, b in
                          diffDict(v1, v2, aTol, rTolDefault, tols)])
            continue
        if isinstance(v1, (int, float)) and isinstance(v2, (int, float)):
            aT, rT = (tols or {}).get(k, (aTol, rTolDefault))
            if aT is None:
                aT = aTol
            if rT is None:
                rT = rTolDefault
            if not np.isclose(v1, v2, rtol=rT, atol=aT):
                diffs.append((k, v1, v2))
        else:
            if str(v1) != str(v2):
                diffs.append((k, v1, v2))
    return diffs


class parametrizedArg:
    """Parse strings like ``const(0.75)`` or ``twoDomainNonSym(0.25,0.75)``
    (ref utilsFem.py:1444)."""

    def __init__(self, name, params=None):
        self.name = name
        self.params = params or []

    def match(self, s):
        return s.startswith(self.name + '(') and s.endswith(')')

    def interpret(self, s):
        assert self.match(s)
        inner = s[len(self.name) + 1:-1]
        if not inner:
            return []
        vals = []
        for tok, typ in zip(inner.split(','), self.params):
            tok = tok.strip()
            vals.append(typ(tok))
        return vals


class driver:
    """Declarative CLI driver (ref utilsFem.py:891)."""

    def __init__(self, comm=None, description=''):
        self.comm = comm
        self.parser = argparse.ArgumentParser(description=description)
        self.groups = {}
        self.outputGroups = {}
        self.params = {}
        self.processHooks = []
        self._processed = False
        self.timers = TimerManager()
        self.isMaster = True
        self._figures = set()
        self.parser.add_argument('--test', action='store_true',
                                 help='run in regression-test mode')
        self.parser.add_argument('--testCache', default='',
                                 help='yaml cache file for test mode')
        self.parser.add_argument('--overwriteCache', action='store_true')
        self.parser.add_argument('--skipPlots', action='store_true')

    def addGroup(self, name):
        if name not in self.groups:
            self.groups[name] = self.parser.add_argument_group(name)
        grp = self.groups[name]
        grp.group = grp
        return grp

    def add(self, name, defaultValue=None, acceptedValues=None,
            argInterpreter=None, help='', group=None):
        target = group if group is not None else self.parser
        if acceptedValues and defaultValue is None:
            defaultValue = acceptedValues[0]
        if isinstance(defaultValue, bool):
            target.add_argument('--' + name, dest=name, action='store_true',
                                default=defaultValue, help=help)
            target.add_argument('--no-' + name, dest=name, action='store_false')
        elif argInterpreter is not None:
            target.add_argument('--' + name, default=defaultValue,
                                type=argInterpreter, help=help)
        elif isinstance(defaultValue, int) and not isinstance(defaultValue, bool):
            target.add_argument('--' + name, type=int, default=defaultValue, help=help)
        elif isinstance(defaultValue, float):
            target.add_argument('--' + name, type=float, default=defaultValue, help=help)
        else:
            target.add_argument('--' + name, default=defaultValue, help=help)

    def declareFigure(self, name):
        self._figures.add(name)

    def startPlot(self, name):
        return False

    def process(self, argv=None, override=None):
        args = self.parser.parse_args(argv)
        self.params = vars(args)
        if override:
            self.params.update(override)
        for hook in self.processHooks:
            hook(self.params)
        self._processed = True
        for k, v in self.params.items():
            setattr(self, k, v)
        return self.params

    def set(self, key, value):
        self.params[key] = value
        setattr(self, key, value)

    def addOutputGroup(self, name, aTol=None, rTol=None, tested=False):
        og = outputGroup(name, aTol=aTol, rTol=rTol, tested=tested)
        self.outputGroups[name] = og
        return og

    def timer(self, label):
        return self.timers.timer(label)

    def outputToDict(self, tested=False):
        d = {}
        for name, og in self.outputGroups.items():
            d[name] = og.toDict(tested=tested)
        return d

    def getTolerances(self):
        tols = {}
        for og in self.outputGroups.values():
            for p in og.entries:
                tols[p.label] = (p.aTol, p.rTol)
        return tols

    def saveOutput(self):
        """In test mode, diff tested outputs against the YAML cache
        (ref utilsFem.py:1191-1241)."""
        import yaml
        if not getattr(self, 'testCache', ''):
            return
        current = self.outputToDict(tested=True)
        if getattr(self, 'overwriteCache', False):
            with open(self.testCache, 'w') as f:
                yaml.dump(current, f)
            return
        with open(self.testCache, 'r') as f:
            cached = yaml.safe_load(f)
        tols = self.getTolerances()
        failures = []
        for gname, gvals in current.items():
            cvals = cached.get(gname, {})
            failures.extend(diffDict(gvals, cvals, tols=tols))
        assert not failures, 'cache mismatch: {}'.format(failures)

    def finish(self):
        if getattr(self, 'test', False):
            self.saveOutput()


def generates(names):
    """Mark a method as the generator of one or more lazy attributes
    (ref utilsFem.py:1552)."""
    if isinstance(names, str):
        names = [names]

    def wrapper(fn):
        fn._generates = list(names)
        return fn

    return wrapper


class classWithComputedDependencies:
    """Lazy dependency DAG: attribute access triggers the @generates method
    whose declared products include it; the method's arguments are resolved
    recursively by name (ref utilsFem.py:1571)."""

    def __init__(self):
        self.__dict__['_generators'] = {}
        for klass in type(self).__mro__:
            for attr, fn in vars(klass).items():
                products = getattr(fn, '_generates', None)
                if products:
                    for p in products:
                        self._generators.setdefault(p, fn)

    def __getattr__(self, name):
        if name.startswith('_'):
            raise AttributeError(name)
        generators = self.__dict__.get('_generators', {})
        if name not in generators:
            return self._resolveMissing(name)
        fn = generators[name]
        sig = inspect.signature(fn)
        kwargs = {}
        for pname in list(sig.parameters)[1:]:
            kwargs[pname] = getattr(self, pname)
        fn(self, **kwargs)
        if name not in self.__dict__:
            raise RuntimeError(
                f'{fn.__name__} declared to generate {name} but did not set it')
        return self.__dict__[name]

    def _resolveMissing(self, name):
        raise AttributeError(
            f'{type(self).__name__} has no attribute or generator for {name!r}')

    def invalidate(self, *names):
        for n in names:
            self.__dict__.pop(n, None)


class problem(classWithComputedDependencies):
    """Base problem: declares driver args, exposes them as attributes, and
    adds computed properties via @generates (ref utilsFem.py:1891)."""

    def __init__(self, drv):
        super().__init__()
        self.__dict__['driver'] = drv
        self.__dict__['_driver'] = drv
        self.setDriverArgs()
        drv.processHooks.append(self.processCmdline)

    def setDriverArgs(self):
        pass

    def processCmdline(self, params):
        pass

    def setDriverFlag(self, name, defaultValue=None, acceptedValues=None,
                      argInterpreter=None, help='', group=None):
        self.driver.add(name, defaultValue=defaultValue,
                        acceptedValues=acceptedValues,
                        argInterpreter=argInterpreter, help=help, group=group)

    def _resolveMissing(self, name):
        # fall back to driver params
        drv = self.__dict__.get('driver', None)
        if drv is not None and name in drv.params:
            return drv.params[name]
        raise AttributeError(
            f'{type(self).__name__} has no attribute, generator or driver '
            f'param for {name!r}')


def runDriver(path, py, python=None, timeout=900, ranks=None, cacheDir='',
              overwriteCache=False, extra=None):
    """Launch a driver script as a subprocess in test mode and let it diff its
    tolerance-tagged outputs against a cache file (ref utilsFem.py:1371)."""
    import subprocess
    import os
    if python is None:
        python = sys.executable
    if not isinstance(py, (list, tuple)):
        py = [py]
    autotesterOutput = os.path.join(cacheDir, 'cache_' + '--'.join(
        [p.replace('(', '').replace(')', '').replace(' ', '') for p in py]))
    cmd = [python, path] + list(py) + ['--test', f'--testCache={autotesterOutput}']
    if overwriteCache:
        cmd.append('--overwriteCache')
    if extra:
        cmd += list(extra)
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        raise AssertionError(
            f'driver failed ({proc.returncode}):\n{proc.stdout}\n{proc.stderr}')
    return proc
