"""runHelmholtz regression tests (reference caches
cache_runHelmholtz.py--domain*).  The complex-shifted-Laplacian MG
preconditioner + complex GMRES reproduce the reference iteration counts to
+-1 and the L2 errors within the cache tolerances."""
import numpy as np
import pytest

from drivers.runHelmholtz import main as runHelmholtz


def test_interval():
    d = runHelmholtz(['--domain', 'interval'])
    r = d.outputGroups['results'].toDict()
    # reference cache: numIter 24, L2 error 3.87e-07, norm 0.999999993
    assert abs(r['numIter'] - 24) <= 1, r
    assert np.isclose(r['solution L2 norm'], 1.0, rtol=1e-5), r
    assert r['L2 error'] < 5e-6, r


@pytest.mark.slow
def test_square():
    d = runHelmholtz(['--domain', 'square'])
    r = d.outputGroups['results'].toDict()
    # reference cache: numIter 26, L2 error 8.912742605830698e-06
    assert r['numIter'] == 26, r
    assert np.isclose(r['solution L2 norm'], 1.0, rtol=1e-5), r
    assert np.isclose(r['L2 error'], 8.912742605830698e-06, rtol=2.0), r
