"""Function objects used for RHS/BC/coefficients/analytic solutions.

Counterpart of /root/reference/fem/PyNucleus_fem/functions.pyx.  Host-side:
functions are only ever evaluated at setup time (interpolation nodes, quad
points); the results ship to device as arrays.  All functions support
vectorized evaluation over X [N, dim].
"""
from __future__ import annotations

import numpy as np
from scipy.special import gamma as Gamma

from ..base.factory import factory

__all__ = ['function', 'constant', 'Lambda', 'monomial', 'affineFunction',
           'squareIndicator', 'radialIndicator', 'solFractional',
           'solFractional1D', 'rhsFractional1D', 'rhsFractional2D',
           'functionFactory', 'sumFunction', 'mulFunction', 'prodFunction']


class function:
    def __call__(self, X):
        X = np.atleast_2d(np.asarray(X, dtype=np.float64))
        return self.eval(X)

    def eval(self, X):
        raise NotImplementedError()

    def __add__(self, other):
        return sumFunction(self, asFunction(other))

    def __radd__(self, other):
        return sumFunction(asFunction(other), self)

    def __sub__(self, other):
        return sumFunction(self, mulFunction(asFunction(other), -1.0))

    def __rsub__(self, other):
        return sumFunction(asFunction(other), mulFunction(self, -1.0))

    def __mul__(self, other):
        if isinstance(other, function):
            return prodFunction(self, other)
        return mulFunction(self, other)

    def __rmul__(self, other):
        return mulFunction(self, other)

    def __neg__(self):
        return mulFunction(self, -1.0)


class sumFunction(function):
    def __init__(self, f, g):
        self.f, self.g = f, g

    def eval(self, X):
        return self.f.eval(X) + self.g.eval(X)


class mulFunction(function):
    def __init__(self, f, fac):
        self.f, self.fac = f, fac

    def eval(self, X):
        return self.fac * self.f.eval(X)


class prodFunction(function):
    def __init__(self, f, g):
        self.f, self.g = f, g

    def eval(self, X):
        return self.f.eval(X) * self.g.eval(X)


class constant(function):
    def __init__(self, value):
        self.value = value

    def eval(self, X):
        return np.full(X.shape[0], self.value, dtype=np.float64)

    def __repr__(self):
        return f'constant({self.value})'


class Lambda(function):
    """Wrap a per-point python callable f(x) with x [dim]."""

    def __init__(self, fun):
        self.fun = fun

    def eval(self, X):
        vals = np.array([self.fun(x) for x in X])
        if np.iscomplexobj(vals):
            return vals.astype(np.complex128)
        return vals.astype(np.float64)


class monomial(function):
    def __init__(self, exponents, factor=1.0):
        self.exponents = np.asarray(exponents, dtype=np.float64)
        self.factor = factor

    def eval(self, X):
        return self.factor * np.prod(X ** self.exponents[None, :], axis=1)


class affineFunction(function):
    def __init__(self, w, c):
        self.w = np.asarray(w, dtype=np.float64)
        self.c = c

    def eval(self, X):
        return X @ self.w + self.c


class squareIndicator(function):
    def __init__(self, a, b):
        self.a = np.asarray(a, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)

    def eval(self, X):
        inside = np.all((X >= self.a[None, :]) & (X <= self.b[None, :]), axis=1)
        return inside.astype(np.float64)


class radialIndicator(function):
    def __init__(self, radius, center=None):
        self.radius = radius
        self.center = center

    def eval(self, X):
        c = self.center if self.center is not None else np.zeros(X.shape[1])
        r = np.linalg.norm(X - c[None, :], axis=1)
        return (r <= self.radius).astype(np.float64)


class solFractional(function):
    """Analytic solution of (-Delta)^s u = 1 on the unit ball, u=0 outside:
    u(x) = 2^{-2s} Gamma(d/2)/Gamma((d+2s)/2)/Gamma(1+s) (1-|x|^2)_+^s
    (ref nl/nonlocalProblems.py:651-663)."""

    def __init__(self, s, dim, radius=1.0):
        self.s = s
        self.dim = dim
        self.radius = radius
        self.C = 2.0 ** (-2.0 * s) * Gamma(dim / 2.0) \
            / Gamma((dim + 2.0 * s) / 2.0) / Gamma(1.0 + s)

    def eval(self, X):
        r2 = np.sum(X ** 2, axis=1) / self.radius ** 2
        val = np.maximum(1.0 - r2, 0.0) ** self.s
        return self.C * self.radius ** (2.0 * self.s) * val


class solFractional1D(function):
    """Family of 1D eigen-like solutions u_n(x) = (1-x^2)_+^{s+n} * P_n
    via Jacobi polynomials (ref nl/nonlocalProblems.py solFractional1D)."""

    def __init__(self, s, n):
        from scipy.special import jacobi
        self.s = s
        self.n = n
        self.poly = jacobi(n, s, -0.5)

    def eval(self, X):
        x = X[:, 0]
        val = np.maximum(1.0 - x ** 2, 0.0) ** self.s
        return val * self.poly(2 * x ** 2 - 1)


class rhsFractional1D(function):
    """RHS generating solFractional1D (ref nl/nonlocalProblems.py rhsFractional1D)."""

    def __init__(self, s, n):
        from scipy.special import binom, jacobi
        self.s = s
        self.n = n
        self.fac = (2.0 ** (2.0 * s) * Gamma(0.5 + s + n) * Gamma(1.0 + s + n)
                    / Gamma(1.0 + n) / Gamma(0.5 + n))
        self.poly = jacobi(n, s, -0.5)

    def eval(self, X):
        x = X[:, 0]
        from scipy.special import eval_jacobi
        return self.fac * eval_jacobi(self.n, self.s, -0.5, 2 * x ** 2 - 1)


class rhsFractional2D(function):
    def __init__(self, s, n=1, l=2):
        raise NotImplementedError('2D eigen rhs lands with the 2D problem zoo')


def asFunction(f):
    if isinstance(f, function):
        return f
    if np.isscalar(f):
        return constant(f)
    if callable(f):
        return Lambda(f)
    raise TypeError(f)


functionFactory = factory()
class vectorFunction:
    """Vector-valued function from scalar components
    (ref fem/PyNucleus_fem/functions.pyx vectorFunction:41)."""

    def __init__(self, components):
        self.components = list(components)
        self.rows = len(self.components)

    def __call__(self, X):
        return np.stack([np.asarray(c(X)) for c in self.components], axis=-1)

    def __repr__(self):
        return 'vector({})'.format(self.components)


functionFactory.register('constant', constant)
functionFactory.register('Lambda', Lambda)
functionFactory.register('monomial', monomial)
functionFactory.register('affine', affineFunction)
functionFactory.register('squareIndicator', squareIndicator)
functionFactory.register('radialIndicator', radialIndicator)
functionFactory.register('solFractional', solFractional)
functionFactory.register('solFractional1D', solFractional1D)
functionFactory.register('rhsFractional1D', rhsFractional1D)
functionFactory.register('x0', affineFunction,
                         params={'w': [1.0], 'c': 0.0})
functionFactory.register('vector', vectorFunction)
functionFactory.register(
    'sin1d', Lambda, params={'fun': lambda x: np.sin(np.pi * x[0])})
functionFactory.register(
    'cos1d', Lambda, params={'fun': lambda x: np.cos(np.pi * x[0])})
functionFactory.register(
    'sin2d', Lambda,
    params={'fun': lambda x: np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])})
functionFactory.register(
    'cos2d', Lambda,
    params={'fun': lambda x: np.cos(np.pi * x[0]) * np.cos(np.pi * x[1])})
functionFactory.register(
    'sin3d', Lambda,
    params={'fun': lambda x: np.sin(np.pi * x[0]) * np.sin(np.pi * x[1])
            * np.sin(np.pi * x[2])})
