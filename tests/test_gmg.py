"""Geometric multigrid regression tests (counterpart of the reference's
runSerialGMG cache, tests/cache_runSerialGMG.py).

The full noRef=9 (1M DoF) config reproduces the reference cache:
  MG 9 iters rate 0.31996, residual 3.387693e-07 (9-digit match),
  PCG residual 8.446646e-07 (exact), CG 50 iters rate 0.83483.
It runs ~6 minutes on CPU, marked slow; the default test uses noRef=6 with
the same assertions scaled.
"""
import numpy as np
import pytest

from drivers.runSerialGMG import main as runSerialGMG


def _get(d, group, label):
    return d.outputGroups[group].toDict()[label]


def test_serial_gmg_small():
    d = runSerialGMG(['--domain', 'square', '--noRef', '6'])
    # textbook V(2,2) Jacobi rate for 2D Poisson
    assert _get(d, 'rates', 'Rate of convergence MG') < 0.36
    assert _get(d, 'iterations', 'Number of iterations MG') <= 10
    assert _get(d, 'iterations', 'Number of iterations PCG') <= 6
    # discretization errors at h = sqrt(2)/2^7
    h = np.sqrt(2) / 2 ** 7
    assert _get(d, 'errors', 'L^2 error') < 1.0 * h ** 2
    assert _get(d, 'errors', 'H^1_0 error') < 3.0 * h


@pytest.mark.slow
def test_serial_gmg_reference_cache():
    """Pin against /root/reference/tests/cache_runSerialGMG.py values."""
    d = runSerialGMG(['--domain', 'square'])
    assert _get(d, 'iterations', 'Number of iterations MG') == 9
    assert np.isclose(_get(d, 'rates', 'Rate of convergence MG'),
                      0.31996358412183235, atol=1e-2)
    assert np.isclose(_get(d, 'residuals', 'Residual norm MG'),
                      3.387693291422185e-07, rtol=3e-1)
    assert _get(d, 'iterations', 'Number of iterations CG') == 50
    assert np.isclose(_get(d, 'rates', 'Rate of convergence CG'),
                      0.8348286600972041, atol=1e-2)
    assert np.isclose(_get(d, 'residuals', 'Residual norm PCG'),
                      8.44664592068035e-07, rtol=3e-1)
    assert np.isclose(_get(d, 'errors', 'L^2 error'),
                      1.6442082655606228e-06, rtol=2.0)
    assert np.isclose(_get(d, 'errors', 'H^1_0 error'),
                      0.003537410542403111, rtol=2.0)
