"""FEM layer tests: meshes, dofmaps, local assembly (counterpart of the
reference's tests/drift.py and local-FEM parts of tests/test_base.py)."""
import numpy as np
import pytest
import jax.numpy as jnp

from pynucleus_tpu.fem import (
    simpleInterval, uniformSquare, circle, simplexMesh,
    P0_DoFMap, P1_DoFMap, P2_DoFMap, P3_DoFMap,
    assembleMass, assembleStiffness, assembleRHS,
    constant, Lambda, NO_BOUNDARY, simplexDuffy, gaussJacobi01)
from pynucleus_tpu.base import solverFactory


def test_interval_refine():
    m = simpleInterval(-1.0, 1.0)
    for _ in range(6):
        m = m.refine()
    assert m.num_cells == 64
    assert m.num_vertices == 65
    assert np.isclose(m.h, 2.0 / 64)
    assert np.isclose(m.volume, 2.0)
    assert set(m.boundaryVertices.tolist()) == {0, 1}


def test_square_refine():
    m = uniformSquare(N=2, ax=0, ay=0, bx=1, by=1)
    v0 = m.volume
    for _ in range(3):
        m = m.refine()
    assert np.isclose(m.volume, v0)
    assert np.isclose(m.volume, 1.0)
    # boundary edges form the unit square boundary
    be = m.boundaryEdges
    lens = np.linalg.norm(m.vertices[be[:, 0]] - m.vertices[be[:, 1]], axis=1)
    assert np.isclose(lens.sum(), 4.0)


def test_circle_refine_projects():
    m = circle(n=8)
    for _ in range(3):
        m = m.refine()
    bv = m.boundaryVertices
    r = np.linalg.norm(m.vertices[bv], axis=1)
    assert np.allclose(r, 1.0)


def test_gauss_jacobi():
    # rule integrates f(x) x^{-0.5}; with f = x^2: int x^{1.5} dx = 0.4
    x, w = gaussJacobi01(5, -0.5, 0.0)
    assert np.isclose(np.sum(w * x ** 2), 1.0 / 2.5)
    # weight x^{1.3} (1-x)^{0.7}, f = x: Beta(2+1.3, 1+0.7)
    from scipy.special import beta
    x, w = gaussJacobi01(5, 1.3, 0.7)
    assert np.isclose(np.sum(w), beta(2.3, 1.7))
    assert np.isclose(np.sum(w * x), beta(3.3, 1.7))


@pytest.mark.parametrize('order', [2, 3, 5, 7])
def test_simplex_duffy_2d(order):
    bary, w = simplexDuffy(order, 2)
    assert np.isclose(w.sum(), 1.0)
    # integral of lambda0^order over simplex = 2/((order+1)(order+2)) * vol
    val = np.sum(w * bary[:, 0] ** order)
    exact = 2.0 / ((order + 1) * (order + 2))
    assert np.isclose(val, exact), (val, exact)


@pytest.mark.parametrize('DM', [P1_DoFMap, P2_DoFMap, P3_DoFMap])
def test_dof_counts_1d(DM):
    m = simpleInterval(-1.0, 1.0)
    for _ in range(3):
        m = m.refine()
    dm = DM(m)          # physical boundary excluded
    p = DM.polynomialOrder
    assert dm.num_dofs == p * m.num_cells - 1
    assert dm.num_boundary_dofs == 2
    dmFull = DM(m, tag=NO_BOUNDARY)
    assert dmFull.num_dofs == p * m.num_cells + 1


@pytest.mark.parametrize('DM', [P0_DoFMap, P1_DoFMap, P2_DoFMap, P3_DoFMap])
def test_mass_total_1d(DM):
    m = simpleInterval(0.0, 1.0)
    for _ in range(4):
        m = m.refine()
    dm = DM(m, tag=NO_BOUNDARY)
    M = assembleMass(dm)
    ones = jnp.ones(dm.num_dofs)
    total = float(ones @ (M @ ones))
    assert np.isclose(total, 1.0), total  # sum_ij M_ij = |domain|


@pytest.mark.parametrize('DM', [P1_DoFMap, P2_DoFMap])
def test_mass_total_2d(DM):
    m = uniformSquare(N=3, ax=0, ay=0, bx=1, by=1)
    m = m.refine()
    dm = DM(m, tag=NO_BOUNDARY)
    M = assembleMass(dm)
    ones = jnp.ones(dm.num_dofs)
    total = float(ones @ (M @ ones))
    assert np.isclose(total, 1.0), total


@pytest.mark.parametrize('DM,expected_rate', [(P1_DoFMap, 2.0),
                                              (P2_DoFMap, 3.0)])
def test_poisson_convergence_1d(DM, expected_rate):
    # -u'' = pi^2 sin(pi x), u = sin(pi x) on (0,1), u(0)=u(1)=0
    errs = []
    for nref in [3, 4, 5]:
        m = simpleInterval(0.0, 1.0)
        for _ in range(nref):
            m = m.refine()
        dm = DM(m)
        A = assembleStiffness(dm)
        b = assembleRHS(dm, Lambda(lambda x: np.pi ** 2 * np.sin(np.pi * x[0])))
        s = solverFactory.build('lu', A=A, setup=True)
        u = s.solve(b.data)
        uex = dm.interpolate(Lambda(lambda x: np.sin(np.pi * x[0])))
        errs.append(np.abs(np.asarray(u) - uex.toarray()).max())
    rate = np.log2(errs[0] / errs[1])
    assert rate > expected_rate - 0.3, (errs, rate)


def test_poisson_2d():
    # -Lap u = 2 pi^2 sin(pi x) sin(pi y) on unit square
    m = uniformSquare(N=3, ax=0, ay=0, bx=1, by=1)
    for _ in range(3):
        m = m.refine()
    dm = P1_DoFMap(m)
    A = assembleStiffness(dm)
    b = assembleRHS(dm, Lambda(
        lambda x: 2 * np.pi ** 2 * np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])))
    s = solverFactory.build('cg', A=A, setup=True)
    s.tolerance = 1e-10
    s.maxIter = 2000
    u = s.solve(b.data)
    uex = dm.interpolate(Lambda(lambda x: np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])))
    err = np.abs(np.asarray(u) - uex.toarray()).max()
    assert err < 1.2e-2, err  # ~C h^2 with h=1/16


def test_interpolate_and_rhs():
    m = simpleInterval(0.0, 1.0)
    for _ in range(5):
        m = m.refine()
    dm = P1_DoFMap(m, tag=NO_BOUNDARY)
    f = Lambda(lambda x: x[0] ** 2)
    v = dm.interpolate(f)
    M = assembleMass(dm)
    # int_0^1 x^2 dx = 1/3 via ones^T M interp(x^2) (approx, P1 interp error h^2)
    val = float(jnp.ones(dm.num_dofs) @ (M @ v.data))
    assert abs(val - 1.0 / 3.0) < 1e-3
    b = assembleRHS(dm, f)
    # b . 1 = int f
    assert np.isclose(float(b.data.sum()), 1.0 / 3.0, atol=1e-12)
