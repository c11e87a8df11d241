"""Pointwise reaction nonlinearities for reaction-diffusion systems.

Counterpart of /root/reference/fem/PyNucleus_fem/femCy.pyx:2961-3086
(multi_function, power, gray_scott, brusselator, CahnHilliard_F/_prime,
FitzHughNagumo).  Each is a vectorized callable [..., numInputs] ->
[..., numOutputs] fed to fem.assembly.assembleNonlinearity.
"""
import numpy as np

__all__ = ['multiFunction', 'power', 'grayScott', 'grayScottGradient',
           'brusselator', 'CahnHilliard_F', 'CahnHilliard_F_prime',
           'FitzHughNagumo']


class multiFunction:
    numInputs = 1
    numOutputs = 1

    def __call__(self, x):
        raise NotImplementedError()


class power(multiFunction):
    """u -> u^k (ref femCy.pyx:2973)."""

    def __init__(self, k=2.0):
        self.k = k

    def __call__(self, x):
        return x[..., :1] ** self.k


class grayScott(multiFunction):
    """Gray-Scott reaction terms (ref femCy.pyx:2988):
    f_u = -u v^2 + F (1-u),  f_v = u v^2 - (F+k) v."""
    numInputs = numOutputs = 2

    def __init__(self, F=0.025, k=0.06):
        self.F, self.k = F, k

    def __call__(self, x):
        u, v = x[..., 0], x[..., 1]
        return np.stack([-u * v ** 2 + self.F * (1.0 - u),
                         u * v ** 2 - (self.F + self.k) * v], axis=-1)


class grayScottGradient(multiFunction):
    """Directional derivative of the Gray-Scott terms at (u, v) in direction
    (du, dv) (ref femCy.pyx:3006)."""
    numInputs, numOutputs = 4, 2

    def __init__(self, F=0.025, k=0.06):
        self.F, self.k = F, k

    def __call__(self, x):
        u, v, du, dv = (x[..., i] for i in range(4))
        return np.stack([
            (-v ** 2 - self.F) * du + (-2 * u * v) * dv,
            v ** 2 * du + (2 * u * v - (self.F + self.k)) * dv], axis=-1)


class brusselator(multiFunction):
    """Brusselator reaction terms around the linearization point
    (ref femCy.pyx:3025):
    z = B u + Q^2 v + (B/Q) u^2 + 2 Q u v + u^2 v;
    f_u = -u + z, f_v = -z."""
    numInputs = numOutputs = 2

    def __init__(self, B=0.025, Q=0.06):
        self.B, self.Q = B, Q

    def __call__(self, x):
        u, v = x[..., 0], x[..., 1]
        z = (self.B * u + self.Q ** 2 * v + self.B / self.Q * u ** 2
             + 2.0 * self.Q * u * v + u ** 2 * v)
        return np.stack([-u + z, -z], axis=-1)


class CahnHilliard_F(multiFunction):
    """Double-well potential F(u) = (1-u^2)^2 / 4 (ref femCy.pyx:3055)."""

    def __call__(self, x):
        return 0.25 * (1.0 - x[..., :1] ** 2) ** 2


class CahnHilliard_F_prime(multiFunction):
    """F'(u) = u^3 - u (ref femCy.pyx:3044)."""

    def __call__(self, x):
        u = x[..., :1]
        return u ** 3 - u


class FitzHughNagumo(multiFunction):
    """FitzHugh-Nagumo reaction terms (ref femCy.pyx:3065):
    f_u = (u - u^3 - v)/tau,  f_v = beta u + delta."""
    numInputs = numOutputs = 2

    def __init__(self, tau=10.0, delta=0.2, beta=1.0):
        self.invTau = 1.0 / tau
        self.delta, self.beta = delta, beta

    def __call__(self, x):
        u, v = x[..., 0], x[..., 1]
        return np.stack([self.invTau * (u - u ** 3 - v),
                         self.beta * u + self.delta], axis=-1)
