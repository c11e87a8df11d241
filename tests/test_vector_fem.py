"""Vector P1 elasticity/div-div and N1e edge elements
(ref DoFMaps.pyx:904 assembleElasticity, femCy.pyx:1318-1560,
DoFMaps.pyx:2219 N1e_DoFMap)."""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pynucleus_tpu.fem import meshFactory, dofmapFactory
from pynucleus_tpu.fem.vector_fem import (
    Product_DoFMap, assembleElasticity, assembleDivDiv,
    N1e_DoFMap, assembleCurlCurl, assembleN1eMass)


@pytest.fixture(scope='module')
def squareP1():
    mesh = meshFactory('square', N=2, ax=0, ay=0, bx=1, by=1)
    for _ in range(4):
        mesh = mesh.refine()
    return mesh, dofmapFactory('P1', mesh, tag=-1)


def test_elasticity_energy(squareP1):
    """u = (x, 0): eps = diag(1, 0), sigma:eps = lam + 2 mu; energy over the
    unit square = lam + 2 mu.  u = (y, x): eps = offdiag(1), eps:eps = 2,
    energy = 4 mu (div u = 0)."""
    mesh, sdm = squareP1
    dm = Product_DoFMap(sdm)
    lam, mu = 1.3, 0.7
    K = assembleElasticity(dm, lam=lam, mu=mu)
    u1 = dm.interpolate(lambda X: np.stack([X[:, 0], 0 * X[:, 1]], axis=-1))
    e1 = float(np.asarray(u1.data) @ np.asarray(K @ u1.data))
    assert_allclose(e1, lam + 2 * mu, rtol=1e-12)
    u2 = dm.interpolate(lambda X: np.stack([X[:, 1], X[:, 0]], axis=-1))
    e2 = float(np.asarray(u2.data) @ np.asarray(K @ u2.data))
    assert_allclose(e2, 4 * mu, rtol=1e-12)
    # rigid rotation (y, -x): eps = 0 -> zero energy
    u3 = dm.interpolate(lambda X: np.stack([X[:, 1], -X[:, 0]], axis=-1))
    e3 = float(np.asarray(u3.data) @ np.asarray(K @ u3.data))
    assert abs(e3) < 1e-12


def test_divdiv(squareP1):
    mesh, sdm = squareP1
    dm = Product_DoFMap(sdm)
    K = assembleDivDiv(dm)
    # div (x, y) = 2 -> energy 4 over unit square
    u = dm.interpolate(lambda X: np.stack([X[:, 0], X[:, 1]], axis=-1))
    assert_allclose(float(np.asarray(u.data) @ np.asarray(K @ u.data)),
                    4.0, rtol=1e-12)
    # div (y, -x) = 0
    u2 = dm.interpolate(lambda X: np.stack([X[:, 1], -X[:, 0]], axis=-1))
    assert abs(float(np.asarray(u2.data) @ np.asarray(K @ u2.data))) < 1e-12


def test_n1e_mass_and_curl():
    mesh = meshFactory('square', N=2, ax=0, ay=0, bx=1, by=1)
    for _ in range(4):
        mesh = mesh.refine()
    dm = N1e_DoFMap(mesh, tag=-1)   # no boundary conditions
    M = assembleN1eMass(dm)
    K = assembleCurlCurl(dm)
    # constant field c = (2, -1): in the N1e space; curl = 0;
    # int |c|^2 = 5 over the unit square
    u = dm.interpolate(lambda X: np.tile([2.0, -1.0], (X.shape[0], 1)))
    uM = float(np.asarray(u.data) @ np.asarray(M @ u.data))
    assert_allclose(uM, 5.0, rtol=1e-12)
    uK = float(np.asarray(u.data) @ np.asarray(K @ u.data))
    assert abs(uK) < 1e-12
    # rotational field (−y, x): curl = 2, int curl^2 = 4; in N1e space
    u2 = dm.interpolate(lambda X: np.stack([-X[:, 1], X[:, 0]], axis=-1))
    assert_allclose(float(np.asarray(u2.data) @ np.asarray(K @ u2.data)),
                    4.0, rtol=1e-12)
    # mass of (−y, x): int (x^2+y^2) = 2/3
    assert_allclose(float(np.asarray(u2.data) @ np.asarray(M @ u2.data)),
                    2.0 / 3.0, rtol=1e-12)


def test_n1e_boundary_dofs():
    mesh = meshFactory('square', N=2, ax=0, ay=0, bx=1, by=1)
    mesh = mesh.refine()
    dmAll = N1e_DoFMap(mesh, tag=-1)
    dmBC = N1e_DoFMap(mesh)
    assert dmBC.num_boundary_dofs == len(mesh.boundaryEdges)
    assert dmAll.num_dofs == dmBC.num_dofs + dmBC.num_boundary_dofs
