"""testDistOp regression tests against the reference caches
(tests/cache_testDistOp.py--*4): distributed operator cross-checks on a
4-device virtual mesh and the distributed CG solve.

Interval/square values match the reference caches (CG iteration counts
exactly, residuals/L2 to the cache tolerances rTol 2e-1 / 1e-1).  Disc values
are pinned to OUR mesh (the reference meshes the disc with meshpy/Triangle;
iteration counts differ with the mesh)."""
import numpy as np
import pytest

from drivers.testDistOp import main as distOpMain


def _run(argv):
    d = distOpMain(argv)
    out = {}
    for g in ('matvec errors', 'solve'):
        if g in d.outputGroups:
            out.update(d.outputGroups[g].toDict())
    return out


INF_FLAGS = ['--horizon', 'inf', '--problem', 'constant',
             '--buildDense', '--buildH2', '--buildH2Reduced',
             '--buildDistributedH2Bcast', '--buildDistributedH2', '--doSolve']


def test_interval_s025():
    out = _run(['--domain', 'interval', '--s', 'const(0.25)',
                '--noRef', '6'] + INF_FLAGS)
    # reference cache: CG 8 its, residual 3.2398173668907127e-06,
    # L2 0.008022633603074793
    assert out['CG iterations'] == 8
    assert np.isclose(out['residual norm'], 3.2398173668907127e-06, rtol=2e-1)
    assert np.isclose(out['L2 error'], 0.008022633603074793, rtol=1e-1)
    assert out['|(A_dense - A_h2) * x |'] < 1e-5
    assert out['|(A_h2 - A_distributed_bcast) * x|'] < 1e-12
    assert out['|(A_h2 - A_distributed_halo) * x|'] < 1e-12


@pytest.mark.slow
@pytest.mark.parametrize('s,its,res,l2', [
    ('const(0.75)', 40, 4.799642527092277e-06, 0.0010923652892912519),
    ('varconst(0.25)', 8, 3.2398173668907127e-06, 0.008022633603074668),
])
def test_interval_more(s, its, res, l2):
    out = _run(['--domain', 'interval', '--s', s, '--noRef', '6'] + INF_FLAGS)
    assert out['CG iterations'] == its
    assert np.isclose(out['residual norm'], res, rtol=2e-1)
    assert np.isclose(out['L2 error'], l2, rtol=1e-1)


@pytest.mark.slow
@pytest.mark.parametrize('s,its,res', [
    ('const(0.25)', 4, 3.984128775788769e-06),
    ('const(0.75)', 15, 3.2535730591137403e-06),
])
def test_square(s, its, res):
    out = _run(['--domain', 'square', '--s', s, '--noRef', '3'] + INF_FLAGS)
    assert out['CG iterations'] == its
    assert np.isclose(out['residual norm'], res, rtol=2e-1)


@pytest.mark.slow
def test_sparse_finite_horizon():
    out = _run(['--domain', 'interval', '--s', 'const(0.25)',
                '--horizon', '0.01', '--horizonToMeshSize', '25.0',
                '--buildSparse', '--buildH2Reduced',
                '--buildDistributedH2Bcast', '--buildDistributedH2'])
    assert out['|(A_sparse - A_distributed_bcast) * x|'] < 1e-9
    assert out['|(A_sparse - A_distributed_halo) * x|'] < 1e-9
