"""Exact polar clipping of horizon-cut cells for ALL interaction norm
balls (ball2 / ballInf / ball1 / ellipse), vs the reference's
retriangulation modes (interactionDomains.pyx ball2:1069, ballInf:1210,
ball1:1632, ellipse:1579).

Ground truth: brute-force subdivision of the y-cell into k^2 subtriangles
with centroid in/out classification (error O(1/k^2)).  The polar path must
land within the subdivision error; the same-order indicator quadrature is
expected to be an order of magnitude worse on at least one entry.
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pynucleus_tpu.nl.kernels import (interactionFactory,
                                      getIntegrableKernel, INDICATOR)


def _subdivReference(kernel, V1, V2, k=512, oX=6, xRule=None):
    """[2 dpe, 2 dpe] local pair matrix by y-subdivision (P1, dpe=3).

    The x -> (y-integral) map has kinks (the ball boundary sweeping the
    y-cell corners), so comparisons against the polar path must use the
    SAME x-rule (pass xRule) -- otherwise the comparison measures the two
    x-rules' kink errors, not the y-clipping accuracy."""
    from pynucleus_tpu.fem.quadrature import simplexCompact
    if xRule is not None:
        bx, wx = xRule
    else:
        bx, wx = simplexCompact(oX, 2)
    Xq = bx @ V1                                       # [Qx, 2]
    vol1 = 0.5 * abs(np.linalg.det(np.stack([V1[1] - V1[0],
                                             V1[2] - V1[0]])))
    vol2 = 0.5 * abs(np.linalg.det(np.stack([V2[1] - V2[0],
                                             V2[2] - V2[0]])))
    # subdivide V2 into k^2 congruent subtriangles; centroids + areas
    cent = []
    ii, jj = np.meshgrid(np.arange(k), np.arange(k), indexing='ij')
    sel = (ii + jj) < k
    a = ii[sel] / k
    b = jj[sel] / k
    up = np.stack([a + 1.0 / (3 * k), b + 1.0 / (3 * k)], axis=1)
    sel2 = (ii + jj) < k - 1
    a2 = ii[sel2] / k
    b2 = jj[sel2] / k
    dn = np.stack([a2 + 2.0 / (3 * k), b2 + 2.0 / (3 * k)], axis=1)
    ab = np.concatenate([up, dn])                      # barycentric (xi, eta)
    Yc = V2[0] + ab @ np.stack([V2[1] - V2[0], V2[2] - V2[0]])
    areas = np.full(len(Yc), vol2 / k ** 2)
    baryY = np.stack([1 - ab.sum(1), ab[:, 0], ab[:, 1]], axis=1)
    phiY = baryY                                       # P1: phi = bary
    phiX = bx                                          # [Qx, 3]
    hv2 = kernel.horizonValue ** 2
    M = np.zeros((6, 6))
    gam = np.asarray(kernel.jaxEval(Xq[:, None, :], Yc[None, :, :]))
    ind = np.asarray(kernel.interaction.jaxIndicator(
        Xq[:, None, :], Yc[None, :, :], hv2))
    W = gam * ind * areas[None, :] * (2.0 * vol1 * wx[:, None])
    s11 = np.einsum('qy,qi,qj->ij', W, phiX, phiX)
    s12 = -np.einsum('qy,qi,yj->ij', W, phiX, phiY)
    s22 = np.einsum('qy,yi,yj->ij', W, phiY, phiY)
    M[:3, :3] = s11
    M[:3, 3:] = s12
    M[3:, :3] = s12.T
    M[3:, 3:] = s22
    return M


def _polarPair(kernel, V1, V2, order=16):
    import jax.numpy as jnp
    from pynucleus_tpu.nl.assembly import _bucket_cut2d_polar
    from pynucleus_tpu.fem.quadrature import simplexDuffy, gauss01
    verts = jnp.asarray(np.concatenate([V1, V2], axis=0))
    vi1 = jnp.asarray([[0, 1, 2]])
    vi2 = jnp.asarray([[3, 4, 5]])
    vol1 = 0.5 * abs(np.linalg.det(np.stack([V1[1] - V1[0],
                                             V1[2] - V1[0]])))
    bary_x, wx = simplexDuffy(order, 2)
    thetas, wtheta = gauss01(order + 2)
    rq, wr = gauss01(order)
    M = _bucket_cut2d_polar(
        verts, vi1, vi2, jnp.asarray([vol1]),
        jnp.asarray(bary_x.T.copy()), jnp.asarray(wx),
        jnp.asarray(thetas), jnp.asarray(wtheta),
        jnp.asarray(rq), jnp.asarray(wr),
        jnp.eye(3), jnp.eye(3),             # P1: phi_i = bary_i
        kernel.horizonValue, kernel=kernel, dpe=3)
    return np.asarray(M).reshape(6, 6)


V1 = np.array([[0.0, 0.0], [0.1, 0.0], [0.0, 0.1]])
V2 = np.array([[0.22, 0.0], [0.32, 0.02], [0.2, 0.12]])


@pytest.mark.parametrize('interName', ['ball2', 'ballInf', 'ball1',
                                       'ellipse'])
def test_polar_clip_matches_subdivision(interName):
    if interName == 'ellipse':
        inter = interactionFactory('ellipse', aFac=1.0, bFac=0.7)
    else:
        inter = interactionFactory(interName)
    kernel = getIntegrableKernel(2, INDICATOR, 0.25, interaction=inter,
                                 normalized=False)
    # the pair must actually be CUT by the ball boundary
    D = V1[None, :, None, :] - V2[None, None, :, :]
    d2 = inter.dist2(D.reshape(-1, 2))
    assert d2.min() < 0.25 ** 2 < d2.max(), 'pair must straddle the horizon'
    from pynucleus_tpu.fem.quadrature import simplexDuffy
    ref = _subdivReference(kernel, V1, V2,
                           xRule=simplexDuffy(16, 2))
    got = _polarPair(kernel, V1, V2)
    scale = np.abs(ref).max()
    err = np.abs(got - ref).max() / scale
    # the centroid-classified subdivision reference itself carries ~1/k
    # boundary error (~1e-3); the polar path must land within it
    assert err < 2.5e-3, (interName, err)


def test_polar_beats_indicator_quadrature():
    """Same-order indicator quadrature vs exact clipping on the Linf ball."""
    from pynucleus_tpu.fem.quadrature import simplexCompact
    inter = interactionFactory('ballInf')
    kernel = getIntegrableKernel(2, INDICATOR, 0.25, interaction=inter,
                                 normalized=False)
    from pynucleus_tpu.fem.quadrature import simplexDuffy
    ref = _subdivReference(kernel, V1, V2, xRule=simplexDuffy(16, 2))
    got = _polarPair(kernel, V1, V2)
    # indicator quadrature at a comparable total point count
    bx, wx = simplexCompact(8, 2)
    by, wy = simplexCompact(8, 2)
    Xq = bx @ V1
    Yq = by @ V2
    vol1 = 0.5 * abs(np.linalg.det(np.stack([V1[1] - V1[0],
                                             V1[2] - V1[0]])))
    vol2 = 0.5 * abs(np.linalg.det(np.stack([V2[1] - V2[0],
                                             V2[2] - V2[0]])))
    gam = np.asarray(kernel.jaxEval(Xq[:, None, :], Yq[None, :, :]))
    ind = np.asarray(kernel.interaction.jaxIndicator(
        Xq[:, None, :], Yq[None, :, :], kernel.horizonValue ** 2))
    W = gam * ind * (2.0 * vol1 * wx[:, None]) * (vol2 * wy[None, :])
    s12 = -np.einsum('qy,qi,yj->ij', W, bx, by)
    scale = np.abs(ref).max()
    errExact = np.abs(got[:3, 3:] - ref[:3, 3:]).max() / scale
    errInd = np.abs(s12 - ref[:3, 3:]).max() / scale
    assert errExact < 2.5e-3
    assert errInd > 3 * errExact, (errInd, errExact)


def test_assembled_dense_all_balls_symmetric():
    """End-to-end: dense assembly with each interaction stays symmetric and
    the exact-clip path agrees with a refined indicator assembly."""
    from pynucleus_tpu.fem import meshFactory, dofmapFactory
    from pynucleus_tpu.nl.assembly import nonlocalBuilder
    mesh = meshFactory('square', ax=0, ay=0, bx=1, by=1)
    for _ in range(3):
        mesh = mesh.refine()
    dm = dofmapFactory('P1', mesh, tag=-1)
    for interName in ['ballInf', 'ball1']:
        inter = interactionFactory(interName)
        kernel = getIntegrableKernel(2, INDICATOR, 0.3, interaction=inter,
                                     normalized=False)
        A = np.asarray(nonlocalBuilder(
            dm, kernel, zeroExterior=False).getDense().toarray())
        assert np.abs(A - A.T).max() < 1e-10, interName
        assert np.abs(A).max() > 0
