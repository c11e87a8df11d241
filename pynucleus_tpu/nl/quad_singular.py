"""Singularity-cancelling quadrature rules for element pairs (host build).

Counterpart of /root/reference/nl/PyNucleus_nl/fractionalLaplacian1D.pyx:35-180
(singularityCancelationQuadRule1D[_boundary]) and fractionalLaplacian2D.pyx:36-401,
plus the distant-panel tensor rules of nonlocalOperator_{SCALAR}.pxi:549-720.

Each rule is reduced to STATIC tables for the batched device kernel:
    bary_x [nv1, Q], bary_y [nv2, Q], w [Q], PSI [nPSI, Q]
with the convention that the pair contribution is
    contrib[I, J] = vol1 * vol2 * sum_q w_q * gamma(x_q, y_q) * PSI[I,q] * PSI[J,q]
where x_q = sum_v bary_x[v, q] * simplex1[perm1[v]], etc.  Shared vertices
come FIRST in the permuted simplices (perm handled host-side in panels.py).

PSI row order: [cell1 local dofs (permuted element order), cell2 extra dofs],
where dofs supported on the shared interface appear once (phi_x - phi_y) and
the cell2 duplicate row is identically zero; scattering uses per-pair global
dof ids so no reference-style dof-permutation tables are needed.

The Gauss-Jacobi weights absorb the singular factor analytically:
e.g. for the 1D same-cell panel, |x-y| = eta0*eta1*h and the integrand
(kernel * PSI^2) behaves like (eta0*eta1)^{2+singularity}, so the rule uses
weights eta0^{1+sigma} eta1^{sigma} and compensates by (eta0*eta1)^{-sigma},
sigma = 2 + singularity.
"""
from __future__ import annotations

import numpy as np

from ..fem.quadrature import (gauss01, gaussJacobi01, tensorRule,
                              simplexDuffy, simplexCompact)

__all__ = ['PanelRule', 'sameCellRule1D', 'vertexRule1D', 'distantRule',
           'boundaryVertexRule1D', 'boundaryDistantRule',
           'sameCellRule2D', 'edgeRule2D', 'vertexRule2D', 'boundaryEdgeRule2D']


class PanelRule:
    """Static tables for one panel class."""

    def __init__(self, bary_x, bary_y, w, name=''):
        self.bary_x = np.ascontiguousarray(bary_x)   # [nv1, Q]
        self.bary_y = np.ascontiguousarray(bary_y)   # [nv2, Q]
        self.w = np.ascontiguousarray(w)             # [Q]
        self.name = name

    @property
    def num_nodes(self):
        return self.w.shape[0]

    @staticmethod
    def sharedDofMask(dm, nSharedVertices):
        """Boolean mask over the permuted element's local dofs whose
        interpolation node lies ON the shared sub-simplex spanned by the first
        ``nSharedVertices`` permuted vertices (those dofs are identical global
        dofs in both cells)."""
        nodes = dm.localNodes
        if nSharedVertices == 0:
            return np.zeros(nodes.shape[0], dtype=bool)
        return np.abs(nodes[:, nSharedVertices:]).max(axis=1) < 1e-12 \
            if nSharedVertices < nodes.shape[1] else \
            np.ones(nodes.shape[0], dtype=bool)

    def buildPSI(self, dm, nSharedVertices=0, boundary=False):
        """PSI [nPSI, Q] for a DoFMap's element.  ``nSharedVertices`` =
        number of leading permuted vertices shared between the two cells
        (0 distant, 1 vertex panel, 2 edge panel 2D, m+1 identical)."""
        phi_x = dm.evalPhi(self.bary_x.T)   # [dpe, Q]
        if boundary:
            return phi_x
        phi_y = dm.evalPhi(self.bary_y.T)   # [dpe, Q]
        dpe = phi_x.shape[0]
        mask = self.sharedDofMask(dm, nSharedVertices)
        if mask.all():
            # identical cells: every dof shared
            return phi_x - phi_y
        nPSI = 2 * dpe
        PSI = np.zeros((nPSI, self.num_nodes))
        PSI[:dpe] = phi_x
        PSI[dpe:] = -phi_y
        if mask.any():
            PSI[:dpe][mask] = phi_x[mask] - phi_y[mask]
            PSI[dpe:][mask] = 0.0
        return PSI


# --------------------------------------------------------------------- 1D --

def sameCellRule1D(singularity, order):
    """Identical-cell panel, 1D (ref fractionalLaplacian1D.pyx:48-82).
    ``singularity`` is the kernel exponent (-1-2s); the integrand cancels 2
    orders, sigma = 2 + singularity."""
    sigma = 2.0 + singularity
    x0, w0 = gaussJacobi01(order, 1.0 + sigma, 0.0)
    x1, w1 = gaussJacobi01(order, sigma, 0.0)
    nodes, w = tensorRule((x0, w0), (x1, w1))
    eta0, eta1 = nodes[:, 0], nodes[:, 1]
    x = eta0 * (1 - eta1)
    y = eta0
    bary_x = np.stack([1 - x, x], axis=0)
    bary_y = np.stack([1 - y, y], axis=0)
    weights = 2.0 * w * (eta0 * eta1) ** (-sigma)
    return PanelRule(bary_x, bary_y, weights, 'sameCell1D')


def vertexRule1D(singularity, order_sing, order_reg, continuous=True):
    """Common-vertex panel, 1D (ref fractionalLaplacian1D.pyx:83-141).
    Shared vertex is local 0 of BOTH permuted simplices.  sigma = 2+sing for
    continuous elements, 0+sing for P0."""
    sigma = (2.0 if continuous else 0.0) + singularity
    x0, w0 = gaussJacobi01(order_reg, 1.0 + sigma, 0.0)
    x1, w1 = gauss01(order_sing)
    nodes, w = tensorRule((x0, w0), (x1, w1))
    eta0, eta1 = nodes[:, 0], nodes[:, 1]
    xs, ys, ws = [], [], []
    # subdomain 1: x = eta0*eta1, y = eta0;  subdomain 2: swapped
    for (x, y) in ((eta0 * eta1, eta0), (eta0, eta0 * eta1)):
        xs.append(np.stack([1 - x, x], axis=0))
        ys.append(np.stack([1 - y, y], axis=0))
        ws.append(w * eta0 ** (-sigma))
    bary_x = np.concatenate(xs, axis=1)
    bary_y = np.concatenate(ys, axis=1)
    weights = np.concatenate(ws)
    return PanelRule(bary_x, bary_y, weights, 'vertex1D')


def distantRule(order, mdim1, mdim2=None, compact=True):
    """Tensor product of two simplex rules (ref nonlocalOperator pxi:549-600:
    Xiao-Gimbutas x Xiao-Gimbutas; we use Duffy-transform rules of the same
    polynomial exactness — the distant panels only need accuracy, not node
    parity).  Compact symmetric (Dunavant/Keast) rules where tabulated:
    the point count enters the pair cost as Q1*Q2.  Pass compact=False for
    DISCONTINUOUS integrands (horizon-cut indicator sampling): there the
    dense Duffy tensor grid's point count, not polynomial exactness, sets
    the accuracy."""
    if mdim2 is None:
        mdim2 = mdim1
    rule = simplexCompact if compact else simplexDuffy
    b1, w1 = rule(order, mdim1)
    b2, w2 = rule(order, mdim2)
    Q1, Q2 = w1.shape[0], w2.shape[0]
    bary_x = np.repeat(b1.T, Q2, axis=1)                  # [nv1, Q1*Q2]
    bary_y = np.tile(b2.T, (1, Q1))                       # [nv2, Q1*Q2]
    w = (w1[:, None] * w2[None, :]).ravel()
    return PanelRule(bary_x, bary_y, w, f'distant{order}')


def boundaryVertexRule1D(singularity, order):
    """Cell x touching-boundary-vertex panel (ref
    fractionalLaplacian1D.pyx:144-179,671-709).  singularity here is the
    BOUNDARY kernel exponent (1-d-2s = -2s in 1D)."""
    if singularity > -1.0 + 1e-3:
        sigma = singularity
    else:
        sigma = 2.0 + singularity
    eta, w = gaussJacobi01(order, sigma, 0.0)
    bary_x = np.stack([1 - eta, eta], axis=0)
    bary_y = np.ones((1, len(eta)))
    weights = w * eta ** (-sigma)
    return PanelRule(bary_x, bary_y, weights, 'bndVertex1D')


def boundaryDistantRule(order, mdim1, mdim2):
    """Cell x distant-surface-simplex rule."""
    b1, w1 = simplexCompact(order, mdim1)
    if mdim2 == 0:
        b2, w2 = np.ones((1, 1)), np.ones(1)
    else:
        b2, w2 = simplexCompact(order, mdim2)
    Q1, Q2 = w1.shape[0], w2.shape[0]
    bary_x = np.repeat(b1.T, Q2, axis=1)
    bary_y = np.tile(b2.T, (1, Q1))
    w = (w1[:, None] * w2[None, :]).ravel()
    return PanelRule(bary_x, bary_y, w, f'bndDistant{order}')


# --------------------------------------------------------------------- 2D --
# The 2D singular rules (COMMON_FACE 3 subdomains, COMMON_EDGE 5,
# COMMON_VERTEX 2; ref fractionalLaplacian2D.pyx:36-401) follow the classical
# Duffy-type decomposition of the 4D product domain.  Derivations follow
# Sauter-Schwab-type singular quadrature specialized to gamma ~ r^{sing}.

def sameCellRule2D(singularity, order):
    """Identical-triangle panel: the 4D integral over T x T reduces to 3
    symmetric subdomains with Jacobian eta0^3 eta1^2 eta2 and singular factor
    (eta0*eta1*eta2)^{sing+2} (2 orders cancelled by the integrand)."""
    sigma = 2.0 + singularity
    # variables: eta0 ~ radial (power 3 + sigma), eta1 (power 2 + sigma),
    # eta2 (power 1 + sigma), eta3 regular
    x0, w0 = gaussJacobi01(order, 3.0 + sigma, 0.0)
    x1, w1 = gaussJacobi01(order, 2.0 + sigma, 0.0)
    x2, w2 = gaussJacobi01(order, 1.0 + sigma, 0.0)
    x3, w3 = gauss01(order)
    nodes, w = tensorRule((x0, w0), (x1, w1), (x2, w2), (x3, w3))
    eta0, eta1, eta2, eta3 = nodes.T
    bxs, bys, ws = [], [], []
    # Subdomain decomposition for int_T int_T with x = X, y = X - z where the
    # difference z is collapsed: the three cyclic subdomains
    for perm in range(3):
        # reference-element coordinates (lam1, lam2) for x and y
        if perm == 0:
            x1c = eta0 * (1 - eta1 + eta1 * eta2)
            x2c = eta0 * eta1 * (1 - eta2)
            y1c = eta0 * (1 - eta1)
            y2c = eta0 * eta1 * (1 - eta2 * eta3)
        elif perm == 1:
            x1c = eta0 * (1 - eta1)
            x2c = eta0 * eta1 * (1 - eta2 + eta2 * eta3)
            y1c = eta0 * (1 - eta1 + eta1 * eta2)
            y2c = eta0 * eta1 * (1 - eta2 * eta3)
        else:
            x1c = eta0 * (1 - eta1 * eta2)
            x2c = eta0 * eta1 * (1 - eta2)
            y1c = eta0 * (1 - eta1 * eta2 * eta3)
            y2c = eta0 * eta1
        for (a1, a2, b1, b2) in ((x1c, x2c, y1c, y2c), (y1c, y2c, x1c, x2c)):
            bxs.append(np.stack([1 - a1 - a2, a1, a2], axis=0))
            bys.append(np.stack([1 - b1 - b2, b1, b2], axis=0))
            ws.append(w * eta0 ** (-sigma) * 0.5)
    raise NotImplementedError(
        '2D same-cell singular rule: use sauterSchwabIdentical2D instead')


def edgeRule2D(*a, **kw):
    raise NotImplementedError('lands with the 2D milestone')


def vertexRule2D(*a, **kw):
    raise NotImplementedError('lands with the 2D milestone')


def boundaryEdgeRule2D(*a, **kw):
    raise NotImplementedError('lands with the 2D milestone')


def _buildPHI(rule, dm, nSharedVertices=0):
    """(PHIx, PHIy) [nPSI, Q] for the NONSYMMETRIC local matrix
    (ref nonlocalOperator addQuadRule_nonSym pxi:602-665 and the 1D/2D
    _nonsym getNearQuadRule PHI3 tables):
      contrib[I,J] = sum_q w [g1(q) PHIx[I,q] - g2(q) PHIy[I,q]]
                             * (PHIx[J,q] - PHIy[J,q])
    Row convention matches buildPSI (cell1 dofs, then cell2 dofs; shared dofs
    live on the cell1 row, cell2 duplicates zero)."""
    import numpy as np
    phi_x = dm.evalPhi(rule.bary_x.T)
    phi_y = dm.evalPhi(rule.bary_y.T)
    dpe = phi_x.shape[0]
    mask = rule.sharedDofMask(dm, nSharedVertices)
    if mask.all():
        return phi_x, phi_y
    PHIx = np.zeros((2 * dpe, rule.num_nodes))
    PHIy = np.zeros((2 * dpe, rule.num_nodes))
    PHIx[:dpe] = phi_x
    PHIy[dpe:] = phi_y
    if mask.any():
        PHIy[:dpe][mask] = phi_y[mask]
        PHIy[dpe:][mask] = 0.0
    return PHIx, PHIy


PanelRule.buildPHI = _buildPHI
