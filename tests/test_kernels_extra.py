"""Extended kernel layer: ball1/ellipse interactions, extra fractional
orders, two-point weight functions (ref interactionDomains.pyx,
fractionalOrders.pyx:447-896, twoPointFunctions.pyx)."""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pynucleus_tpu.fem import meshFactory, dofmapFactory, Lambda
from pynucleus_tpu.nl.kernels import (
    interactionFactory, fractionalOrderFactory, twoPointFunctionFactory,
    getIntegrableKernel, getFractionalKernel, INDICATOR,
    ball1, ball2, ballInf, ellipse, feFractionalOrder, layersFractionalOrder,
    temperedTwoPoint)
from pynucleus_tpu.nl.assembly import nonlocalBuilder


def _patchTest(interaction, horizon=0.2, h=0.05, expect=-4.0):
    """Second-moment normalization check: on interior dofs, A u for
    u = x^2 + y^2 approximates expect * (lumped mass).  ball2's constant is
    Laplacian-consistent (expect = -Delta u = -4); the reference's ballInf
    constant (kernelNormalization.pyx:243 '3/4/horizon^4/2') is half of the
    Laplacian-consistent value, giving -2 -- we reproduce the reference's
    convention, and use the same convention for ball1."""
    from pynucleus_tpu.fem.meshes import squareWithInteractions
    mesh = squareWithInteractions(ax=0, ay=0, bx=1, by=1, horizon=horizon,
                                  h=h)
    dm = dofmapFactory('P1', mesh, tag=-1)
    kernel = getIntegrableKernel(2, INDICATOR, horizon,
                                 interaction=interaction)
    A = np.asarray(nonlocalBuilder(dm, kernel,
                                   zeroExterior=False).getDense().toarray())
    coords = dm.getDoFCoordinates()
    u = coords[:, 0] ** 2 + coords[:, 1] ** 2
    r = A @ u
    # interior dofs (at least horizon away from the physical boundary):
    # L u = -Delta u * (normalization) = -4 ... with the 1/2-in-scaling
    # convention A u approximates (-Delta u) * mass = -4 * lumped mass.
    inner = ((coords[:, 0] > horizon + 2 * h)
             & (coords[:, 0] < 1 - horizon - 2 * h)
             & (coords[:, 1] > horizon + 2 * h)
             & (coords[:, 1] < 1 - horizon - 2 * h))
    assert inner.sum() > 0
    lumped = np.asarray(
        __import__('pynucleus_tpu.fem', fromlist=['assembleMass'])
        .assembleMass(dm).toarray()).sum(axis=1)
    ratio = r[inner] / lumped[inner]
    # the cut-cell band is widest for the diamond (ball1), where the
    # indicator quadrature carries the largest per-dof error
    assert_allclose(ratio, expect, rtol=15e-2)
    assert abs(ratio.mean() - expect) < 5e-2 * abs(expect)


@pytest.mark.parametrize('interName,expect', [
    # ball2/ballInf: 13-20 s patch sweeps -> slow tier; ball1 (~6 s) keeps
    # the all-balls indicator path in the fast tier
    pytest.param('ball2', -4.0, marks=pytest.mark.slow),
    pytest.param('ballInf', -2.0, marks=pytest.mark.slow),
    ('ball1', -2.0),
])
def test_indicator_patch_all_balls(interName, expect):
    _patchTest(interactionFactory(interName), expect=expect)


def test_ellipse_indicator_runs():
    e = interactionFactory('ellipse', aFac=1.0, bFac=0.5)
    mesh = meshFactory('square', ax=0, ay=0, bx=1, by=1)
    for _ in range(3):
        mesh = mesh.refine()
    dm = dofmapFactory('P1', mesh, tag=-1)
    kernel = getIntegrableKernel(2, INDICATOR, 0.3, interaction=e,
                                 normalized=False)
    A = np.asarray(nonlocalBuilder(dm, kernel,
                                   zeroExterior=False).getDense().toarray())
    # operator is symmetric, nonzero, and rows sum to ~0 in the interior
    # (translation invariance of the weight on interior dofs)
    assert np.abs(A - A.T).max() < 1e-10
    assert np.abs(A).max() > 0
    # narrower ellipse interacts less than the full ball
    kernel2 = getIntegrableKernel(2, INDICATOR, 0.3, interaction=ball2(),
                                  normalized=False)
    A2 = np.asarray(nonlocalBuilder(dm, kernel2,
                                    zeroExterior=False).getDense().toarray())
    assert np.abs(A).sum() < np.abs(A2).sum()


def test_extra_orders_eval():
    f = fractionalOrderFactory
    X = np.array([[-0.5], [0.0], [0.5]])
    Y = np.array([[0.5], [0.0], [-0.5]])
    lin = f('linearLeftRightNonSym', 0.25, 0.75, r=0.5)
    v = lin(X, Y)
    assert_allclose(v, [0.25, 0.5, 0.75])
    isl = f('islands', 0.3, 0.7, r=0.1, r2=0.6)
    Xi = np.array([[0.3, 0.3], [0.0, 0.0]])
    assert_allclose(isl(Xi, Xi), [0.3, 0.7])
    lay = layersFractionalOrder(2, [0.0, 0.5, 1.0],
                                [[0.2, 0.3], [0.3, 0.4]])
    Xl = np.array([[0.1, 0.25], [0.1, 0.75]])
    assert_allclose(lay(Xl, Xl), [0.2, 0.4])
    assert_allclose(lay(Xl[:1], Xl[1:]), [0.3])
    io = f('innerOuterNonSym', 0.3, 0.6, r=0.1, radius=0.5)
    assert_allclose(io(np.array([[0.0, 0.0]]), np.array([[0.0, 0.0]])),
                    [0.3])
    assert_allclose(io(np.array([[0.9, 0.0]]), np.array([[0.0, 0.0]])),
                    [0.6])


def test_fe_order_assembly():
    """feFractionalOrder: dense assembly with a discretized order field
    matches varconst when the field is constant."""
    mesh = meshFactory('interval', a=-1, b=1)
    for _ in range(4):
        mesh = mesh.refine()
    dm = dofmapFactory('P1', mesh, tag=-1)
    sVec = dm.interpolate(Lambda(lambda x: 0.75))
    sFe = feFractionalOrder(sVec, smin=0.75, smax=0.75)
    # interior assembly dm
    dmI = dofmapFactory('P1', mesh)
    Afe = np.asarray(nonlocalBuilder(
        dmI, getFractionalKernel(1, sFe)).getDense().toarray())
    Ac = np.asarray(nonlocalBuilder(
        dmI, getFractionalKernel(
            1, fractionalOrderFactory('varconst', 0.75))).getDense()
        .toarray())
    assert np.abs(Afe - Ac).max() < 1e-8 * np.abs(Ac).max()


def test_two_point_functions():
    tp = twoPointFunctionFactory
    x = np.array([[0.1, 0.2], [0.5, 0.5]])
    y = np.array([[0.4, 0.6], [0.5, 0.5]])
    c = tp('constant', value=2.0)
    assert_allclose(c.evalPairs(x, y), [2.0, 2.0])
    t = tp('tempered', lambdaCoeff=3.0)
    r = np.linalg.norm(x - y, axis=1)
    assert_allclose(t.evalPairs(x, y), np.exp(-3 * r))
    assert t.smooth
    lr = tp('leftRight', 1.0, 2.0, interface=0.3)
    assert_allclose(lr.evalPairs(x, y), [1.5, 2.0])
    lam = tp('lambda', fun=lambda a, b: a[0] + b[0])
    assert_allclose(lam.evalPairs(x, y), [0.5, 1.0])


def test_tempered_twopoint_kernel():
    """A fractional kernel with a smooth tempered phi evaluates phi per
    quadrature point (phiJax path)."""
    mesh = meshFactory('interval', a=-1, b=1)
    for _ in range(4):
        mesh = mesh.refine()
    dm = dofmapFactory('P1', mesh)
    phi = temperedTwoPoint(2.0, dim=1)
    k = getFractionalKernel(1, 0.4, phi=phi)
    assert k.phiJax is not None and k.phi is None
    A = np.asarray(nonlocalBuilder(dm, k,
                                   zeroExterior=False).getDense().toarray())
    A0 = np.asarray(nonlocalBuilder(
        dm, getFractionalKernel(1, 0.4),
        zeroExterior=False).getDense().toarray())
    assert np.abs(A - A0).max() > 1e-3
    # far-apart dofs: the pure cross entry scales by ~exp(-lambda |xi - xj|)
    coords = dm.getDoFCoordinates()[:, 0]
    i, j = 0, dm.num_dofs - 1
    expected = np.exp(-2.0 * abs(coords[i] - coords[j]))
    assert_allclose(A[i, j] / A0[i, j], expected, rtol=5e-2)
