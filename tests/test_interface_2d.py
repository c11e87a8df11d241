"""doubleSquare two-domain nonlocal interface problems
(ref cache_runNonlocalInterface.py--domaindoubleSquare--*).

Reference cache values are recorded as DATA.  The reference meshes the
double square with the `triangle` library (graded, rounded collar corners,
mesh.py:463-700); we use a structured breakpoint-snapped grid, so errors
match to ~10% rather than digit-exact (the reported metric mixes the
O(delta^2) interface modeling error with mesh-dependent interpolation
error on the Dirichlet collar).  The patch test pins correctness of the
coupling itself at cut-cell quadrature accuracy.
"""
import numpy as np
import pytest

from drivers.runNonlocalInterface import main as runNonlocalInterface


def test_doubleSquare_patch():
    d = runNonlocalInterface([
        '--domain', 'doubleSquare', '--problem', 'patch-test',
        '--kernel1Type', 'indicator', '--kernel2Type', 'indicator',
        '--horizon1', '0.2', '--horizon2', '0.2', '--hTarget', '0.1'])
    got = d.outputGroups['results'].toDict()
    assert got['domain1L2err'] < 2e-3
    assert got['domain2L2err'] < 2e-3


CONFIGS = [
    (['--kernel1Type', 'indicator', '--kernel2Type', 'indicator',
      '--horizon2', '0.2'],
     {'domain1L2err': 0.10547183361570653,
      'domain2L2err': 0.03972451050493171}),
    (['--kernel1Type', 'fractional', '--kernel2Type', 'fractional',
      '--horizon2', '0.2'],
     {'domain1L2err': 0.06960528161200084,
      'domain2L2err': 0.036580441675504526}),
]

IDS = ['ind-ind-h0.2', 'frac-frac-h0.2']


@pytest.mark.slow
@pytest.mark.parametrize('argv,expected', CONFIGS, ids=IDS)
def test_doubleSquare_sin(argv, expected):
    d = runNonlocalInterface(
        ['--domain', 'doubleSquare', '--problem',
         'sin-variableSolJump-fluxJump', '--s11', '0.2', '--s12', '0.2',
         '--s21', '0.4', '--s22', '0.4', '--horizon1', '0.2'] + argv)
    got = d.outputGroups['results'].toDict()
    for label, val in expected.items():
        assert np.isclose(got[label], val, rtol=0.12), \
            (label, got[label], val)
