"""Drift/gradient assembly, nonlinearity projection, matrix-free operators,
point lookup (ref tests/drift.py, femCy.pyx:2961-3403, lookupFunction.pyx)."""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pynucleus_tpu.fem import (meshFactory, dofmapFactory, functionFactory,
                               assembleMass, assembleStiffness, assembleDrift,
                               assembleRHSgrad, assembleNonlinearity,
                               matrixFreeOperator, lookupFunction, Lambda)
from pynucleus_tpu.fem.nonlinearities import (grayScott, brusselator,
                                              CahnHilliard_F_prime,
                                              FitzHughNagumo, power)


@pytest.fixture(scope='module')
def squareMeshDm():
    mesh = meshFactory('square', N=2, ax=0, ay=0, bx=1, by=1)
    for _ in range(5):
        mesh = mesh.refine()
    dm = dofmapFactory('P1', mesh, tag=-1)   # all dofs interior
    return mesh, dm


def test_integrals_drift(squareMeshDm):
    """int_unitsquare u (c . grad v) for monomials (ref tests/drift.py:26)."""
    mesh, dm = squareMeshDm
    c1 = functionFactory('vector', [functionFactory('constant', value=1.),
                                    functionFactory('constant', value=0.)])
    c2 = functionFactory('vector', [functionFactory('constant', value=0.),
                                    functionFactory('constant', value=1.)])
    D1 = np.asarray(assembleDrift(dm, c1).toarray())
    D2 = np.asarray(assembleDrift(dm, c2).toarray())
    coords = dm.getDoFCoordinates()
    x, y = coords[:, 0], coords[:, 1]
    for i in range(3):
        for j in range(3):
            u = x ** i * y ** j
            for l in range(3):
                for m in range(3):
                    v = x ** l * y ** m
                    got1 = u @ (D1 @ v)
                    got2 = u @ (D2 @ v)
                    exp1 = l / (i + l) / (j + m + 1) if i + l > 0 else 0.0
                    exp2 = m / (i + l + 1) / (j + m) if j + m > 0 else 0.0
                    assert_allclose(got1, exp1, rtol=2e-3, atol=1e-10)
                    assert_allclose(got2, exp2, rtol=2e-3, atol=1e-10)


def test_rhs_grad(squareMeshDm):
    """b_i = int f (c.grad phi_i): sum_i b_i u_i = int f (c.grad u_h)."""
    mesh, dm = squareMeshDm
    c1 = functionFactory('vector', [functionFactory('constant', value=1.),
                                    functionFactory('constant', value=0.)])
    b = np.asarray(assembleRHSgrad(dm, Lambda(lambda x: x[0]), c1).data)
    coords = dm.getDoFCoordinates()
    u = coords[:, 0] ** 2          # du/dx = 2x ;  int x * 2x = 2/3
    assert_allclose(u @ b, 2.0 / 3.0, rtol=2e-3)


def test_nonlinearity_projection(squareMeshDm):
    """M^{-1} b with b = assembleNonlinearity reproduces f(u) pointwise for
    polynomials resolved by the space."""
    mesh, dm = squareMeshDm
    coords = dm.getDoFCoordinates()
    u = dm.interpolate(Lambda(lambda x: x[0]))
    b = assembleNonlinearity(dm, power(2.0), u, qOrder=6)
    M = np.asarray(assembleMass(dm).toarray())
    proj = np.linalg.solve(M, np.asarray(b.data))
    # x^2 is not in P1, but the L2 projection at interior dofs is close
    assert np.abs(proj - coords[:, 0] ** 2).max() < 5e-4


def test_nonlinearity_systems():
    x = np.random.RandomState(0).rand(7, 2)
    gs = grayScott(F=0.03, k=0.05)
    out = gs(x)
    u, v = x[..., 0], x[..., 1]
    assert_allclose(out[..., 0], -u * v ** 2 + 0.03 * (1 - u))
    assert_allclose(out[..., 1], u * v ** 2 - 0.08 * v)
    fh = FitzHughNagumo(tau=5., delta=0.1, beta=2.0)
    out = fh(x)
    assert_allclose(out[..., 0], (u - u ** 3 - v) / 5.0)
    assert_allclose(out[..., 1], 2.0 * u + 0.1)
    assert_allclose(CahnHilliard_F_prime()(x[..., :1]),
                    x[..., :1] ** 3 - x[..., :1])
    br = brusselator(B=0.5, Q=0.2)
    z = 0.5 * u + 0.04 * v + 2.5 * u ** 2 + 0.4 * u * v + u ** 2 * v
    assert_allclose(br(x)[..., 0], -u + z)
    assert_allclose(br(x)[..., 1], -z)


@pytest.mark.parametrize('kind', ['mass', 'stiffness'])
def test_matrix_free(squareMeshDm, kind):
    mesh, dm = squareMeshDm
    A = (assembleMass(dm) if kind == 'mass' else assembleStiffness(dm))
    Amf = matrixFreeOperator(dm, kind=kind)
    x = np.random.RandomState(1).rand(dm.num_dofs)
    ya = np.asarray(A @ x)
    ym = np.asarray(Amf @ x)
    assert np.abs(ya - ym).max() < 1e-12 * max(1.0, np.abs(ya).max())
    assert_allclose(np.asarray(Amf.diagonal),
                    np.asarray(A.diagonal), rtol=1e-12)


def test_lookup_function(squareMeshDm):
    mesh, dm = squareMeshDm
    u = dm.interpolate(Lambda(lambda x: 2 * x[0] - 3 * x[1]))
    f = lookupFunction(mesh, dm, u)
    pts = np.random.RandomState(2).rand(20, 2) * 0.9 + 0.05
    vals = f(pts)
    exact = 2 * pts[:, 0] - 3 * pts[:, 1]
    assert np.abs(vals - exact).max() < 1e-12
