"""Host-side quadrature rule construction.

Counterpart of /root/reference/fem/PyNucleus_fem/quadrature.pyx (Gauss,
GaussJacobi, simplexDuffyTransformation, doubleSimplexQuadratureRule).  Rules
are built once with scipy and baked into static device tables.

Conventions:
  - 1D rules: nodes/weights on [0,1].
  - Gauss-Jacobi(k, alpha, beta): integrates f(x) x^alpha (1-x)^beta on [0,1].
  - simplex rules: barycentric nodes [Q, m+1]; weights sum to 1, so
    integral ~= vol(simplex) * sum_q w_q f(x_q).
"""
from __future__ import annotations

import numpy as np
from scipy.special import roots_jacobi, roots_legendre

__all__ = ['gauss01', 'gaussJacobi01', 'simplexDuffy', 'tensorRule',
           'simplexGaussCollection']


def gauss01(order):
    """Gauss-Legendre with polynomial exactness >= order, mapped to [0,1]."""
    k = max((order + 1) // 2 + ((order + 1) % 2 != 0), 1)
    x, w = roots_legendre(k)
    return (x + 1.0) / 2.0, w / 2.0


def gaussJacobi01(order, alpha, beta):
    """Nodes/weights integrating f(x) * x^alpha * (1-x)^beta dx on [0,1]."""
    k = max((order + 1) // 2 + ((order + 1) % 2 != 0), 1)
    # scipy roots_jacobi(n, a, b): weight (1-x)^a (1+x)^b on [-1,1]
    t, w = roots_jacobi(k, beta, alpha)
    x = (t + 1.0) / 2.0
    w = w * 0.5 ** (alpha + beta + 1.0)
    return x, w


def tensorRule(*rules):
    """Tensor product of 1D (nodes, weights) pairs.
    Returns nodes [Q, d] and weights [Q]."""
    grids = np.meshgrid(*[r[0] for r in rules], indexing='ij')
    nodes = np.stack([g.ravel() for g in grids], axis=1)
    w = np.ones(nodes.shape[0])
    wgrids = np.meshgrid(*[r[1] for r in rules], indexing='ij')
    for wg in wgrids:
        w = w * wg.ravel()
    return nodes, w


def simplexDuffy(order, mdim):
    """Simplex quadrature via the Duffy (collapsed-coordinate) transform:
    tensor Gauss-Jacobi absorbing the Jacobian powers (1-x)^{m-d-1}
    (ref quadrature.pyx simplexDuffyTransformation).  Exact for polynomials of
    total degree <= order.  Barycentric nodes [Q, m+1]; weights sum to 1."""
    if mdim == 0:
        return np.ones((1, 1)), np.ones(1)
    rules = [gaussJacobi01(order + mdim - d - 1, 0.0, mdim - d - 1)
             for d in range(mdim)]
    nodes, w = tensorRule(*rules)
    Q = nodes.shape[0]
    bary = np.zeros((Q, mdim + 1))
    for j in range(mdim - 1, -1, -1):
        b = nodes[:, j].copy()
        for k in range(j):
            b *= (1.0 - nodes[:, k])
        bary[:, j + 1] = b
    bary[:, 0] = 1.0 - bary[:, 1:].sum(axis=1)
    # weights already integrate over the Duffy cube with Jacobian; normalize
    # so that sum = 1 (reference multiplies by m! instead)
    fac = {1: 1.0, 2: 2.0, 3: 6.0}[mdim]
    w = w * fac
    return bary, w


def simplexGaussCollection(maxOrder, mdim):
    """Dict order -> (bary, weights) for orders 2..maxOrder."""
    return {o: simplexDuffy(o, mdim) for o in range(2, maxOrder + 1)}
