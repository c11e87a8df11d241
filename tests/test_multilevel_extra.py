"""Chebyshev smoother, classical relaxation, p-multigrid, Schur complement,
spectral estimation (ref smoothers.pyx, hierarchies.py:261, SchurComplement,
linalg.pyx:811-916)."""
import numpy as np
import jax.numpy as jnp
import pytest
from numpy.testing import assert_allclose

from pynucleus_tpu.base import (Dense_LinearOperator, CSR_LinearOperator,
                                solverFactory)
from pynucleus_tpu.base.linear_operators import SchurComplement
from pynucleus_tpu.base.linalg import (estimateSpectralRadius,
                                       lanczosSpectralBounds, arnoldi)
from pynucleus_tpu.fem import (meshFactory, dofmapFactory, assembleStiffness,
                               assembleRHS, functionFactory)
from pynucleus_tpu.multilevel import pCoarsenHierarchy, multigrid
from pynucleus_tpu.multilevel.gmg import buildMeshHierarchy, buildProlongation


def _lap1d(n):
    h = 1.0 / (n + 1)
    A = (np.diag(2 * np.ones(n)) - np.diag(np.ones(n - 1), 1)
         - np.diag(np.ones(n - 1), -1)) / h ** 2
    return Dense_LinearOperator(jnp.asarray(A))


def test_spectral_radius():
    n = 50
    A = _lap1d(n)
    rho = estimateSpectralRadius(A, maxiter=500, tol=1e-8)
    h = 1.0 / (n + 1)
    exact = 4.0 / h ** 2 * np.sin(np.pi * n / (n + 1) / 2) ** 2
    assert_allclose(rho, exact, rtol=1e-3)
    lmin, lmax = lanczosSpectralBounds(A, k=n)
    assert lmax >= exact >= lmin


def test_arnoldi_shapes():
    A = _lap1d(30)
    H, V = arnoldi(A, k=10)
    assert H.shape == (11, 10) and V.shape == (30, 11)
    # Arnoldi relation A V_k = V_{k+1} H
    AV = np.stack([np.asarray(A @ V[:, j]) for j in range(10)], axis=1)
    assert np.abs(AV - np.asarray(V) @ H).max() < 1e-8


def _gmgLevels(noRef=6, smoother=None):
    mesh = meshFactory('interval', a=0, b=1)
    meshes = buildMeshHierarchy(mesh, noRef)
    meshes = meshes[2:]
    levels = []
    dmPrev = None
    for m in meshes:
        dm = dofmapFactory('P1', m)
        entry = {'A': assembleStiffness(dm), 'dm': dm}
        if dmPrev is not None:
            entry['P'] = buildProlongation(dmPrev, dm)
        levels.append(entry)
        dmPrev = dm
    return levels


def test_chebyshev_mg():
    levels = _gmgLevels()
    b = np.asarray(assembleRHS(levels[-1]['dm'],
                               functionFactory('constant', value=1.)).data)
    mgJ = multigrid(hierarchy=levels)
    mgJ.setup()
    mgJ.tolerance = 1e-10
    xj = mgJ.solve(b)
    mgC = multigrid(hierarchy=levels, smoother=('chebyshev', {}))
    mgC.setup()
    mgC.tolerance = 1e-10
    xc = mgC.solve(b)
    assert mgC.iterations <= mgJ.iterations, \
        (mgC.iterations, mgJ.iterations)
    assert np.abs(np.asarray(xc) - np.asarray(xj)).max() < 1e-8


def test_p_multigrid():
    mesh = meshFactory('interval', a=0, b=1)
    for _ in range(6):
        mesh = mesh.refine()
    levels = pCoarsenHierarchy(mesh, orders=('P1', 'P2', 'P3'))
    mg = multigrid(hierarchy=levels)
    mg.setup()
    mg.tolerance = 1e-10
    dm = levels[-1]['dm']
    b = np.asarray(assembleRHS(dm, functionFactory('constant',
                                                   value=1.)).data)
    x = mg.solve(b)
    # -u'' = 1, u = x(1-x)/2: P3 resolves it exactly
    coords = dm.getDoFCoordinates()[:, 0]
    exact = 0.5 * coords * (1 - coords)
    assert np.abs(np.asarray(x) - exact).max() < 1e-8
    assert mg.iterations < 30


@pytest.mark.parametrize('name,omega', [('gs', 1.0), ('sor', 1.5),
                                        ('ssor', 1.2)])
def test_relaxation_solvers(name, omega):
    """One sweep matches the classical splitting formulas."""
    n = 20
    A = _lap1d(n)
    Ad = np.asarray(A.toarray())
    D = np.diag(np.diag(Ad))
    L = np.tril(Ad, -1)
    U = np.triu(Ad, 1)
    kwargs = {} if name == 'gs' else {'omega': omega}
    s = solverFactory.build(name, A=A, setup=True, **kwargs)
    b = np.random.RandomState(5).rand(n)
    got = s.solve(b)   # sweep from x0 = 0
    if name == 'gs':
        exp = np.linalg.solve(L + D, b)
    elif name == 'sor':
        exp = np.linalg.solve(L + D / omega, b)
    else:
        x1 = np.linalg.solve(L + D / omega, b)
        exp = np.linalg.solve(U + D / omega,
                              b - (L + (1 - 1 / omega) * D) @ x1)
    np.testing.assert_allclose(got, exp, rtol=1e-12)
    # and the stationary iteration contracts toward the solution
    exact = np.linalg.solve(Ad, b)
    x = np.zeros(n)
    errs = []
    for _ in range(30):
        x = x + s.solve(b - Ad @ x)
        errs.append(np.abs(x - exact).max())
    assert errs[-1] < 0.7 * errs[0]


def test_gs_preconditioned_cg():
    A = _lap1d(60)
    b = np.random.RandomState(0).rand(60)
    s = solverFactory.build('cg-ssor', A=A, setup=True)
    s.maxIter = 200
    s.tolerance = 1e-10
    x = s(b, np.zeros(60))
    assert np.linalg.norm(np.asarray(A @ x) - b) < 1e-7


def test_schur_complement():
    rng = np.random.RandomState(3)
    M = rng.rand(12, 12)
    M = M @ M.T + 12 * np.eye(12)
    A = Dense_LinearOperator(jnp.asarray(M))
    idx = np.array([0, 2, 5, 7])
    S = SchurComplement(A, idx)
    comp = np.setdiff1d(np.arange(12), idx)
    exact = M[np.ix_(idx, idx)] - M[np.ix_(idx, comp)] @ np.linalg.solve(
        M[np.ix_(comp, comp)], M[np.ix_(comp, idx)])
    x = rng.rand(4)
    assert_allclose(np.asarray(S @ x), exact @ x, rtol=1e-10)
    assert_allclose(S.toarray(), exact, rtol=1e-10)


def test_hierarchy_manager():
    """hierarchyManager-built levels solve identically to the inline
    construction (ref hierarchies.py:286)."""
    from pynucleus_tpu.multilevel import (hierarchyManager, paramsForMG,
                                          multigrid)
    mesh0 = meshFactory('square', N=2, ax=0, ay=0, bx=1, by=1)
    hM = hierarchyManager(mesh0, paramsForMG(4, dim=2)).setup()
    levels = hM.getLevelList()
    assert len(hM) == 5 and 'P' in levels[-1] and 'P' not in levels[0]
    mg = multigrid(hierarchy=levels)
    mg.setup()
    mg.tolerance = 1e-10
    dm = levels[-1]['dm']
    b = np.asarray(assembleRHS(dm, functionFactory('constant',
                                                   value=1.)).data)
    u = np.asarray(mg.solve(b))
    assert abs(u.max() - 0.07367) < 2e-3
    assert mg.iterations < 35
