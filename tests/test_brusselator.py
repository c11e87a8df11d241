"""Brusselator IMEX smoke test: bounded dynamics on a coarse disc."""
from drivers.brusselator import main as brusselator


def test_brusselator_spots():
    d = brusselator(['--noRef', '1', '--T', '0.2', '--dt', '0.02'])
    r = d.outputGroups['results'].toDict()
    assert 0 < r['U max'] < 10, r
    assert 0 < r['V max'] < 100, r
