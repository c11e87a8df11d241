"""Local interfaceProblem driver tests (the reference cache files for this
driver are empty, so values are pinned to our converged results)."""
import numpy as np
import pytest

from drivers.interfaceProblem import main as interfaceProblem


def test_polynomial_exact():
    d = interfaceProblem(['--domain', 'doubleInterval',
                          '--problem', 'polynomial'])
    r = d.outputGroups['results'].toDict()
    assert r['domain1L2err'] < 1e-11, r
    assert r['domain2L2err'] < 1e-11, r


def test_sin_jumps():
    d = interfaceProblem(['--domain', 'doubleInterval',
                          '--problem', 'sin-solJump-fluxJump'])
    r = d.outputGroups['results'].toDict()
    assert r['domain1L2err'] < 2e-3, r
    assert r['domain2L2err'] < 3e-3, r


def test_alternating_schwarz():
    d = interfaceProblem(['--domain', 'doubleInterval',
                          '--problem', 'sin-solJump-fluxJump',
                          '--solver', 'alternatingSchwarz'])
    r = d.outputGroups['results'].toDict()
    assert 0 < r['iterations'] <= 100, r
    assert r['domain1L2err'] < 2e-3, r


@pytest.mark.slow
def test_double_square():
    d = interfaceProblem(['--domain', 'doubleSquare',
                          '--problem', 'sin-solJump-fluxJump',
                          '--hTarget', '0.05'])
    r = d.outputGroups['results'].toDict()
    assert r['domain1L2err'] < 1.5e-2, r
    assert r['domain2L2err'] < 4e-3, r
