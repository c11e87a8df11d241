"""Time integrators operating on (mass, stiffness, forcing) residual
callbacks.

Counterpart of /root/reference/base/PyNucleus_base/timestepping.py:
Stepper (:15), CrankNicolson (:64), ExplicitEuler (:178), ImplicitEuler
(:190), L1Scheme (:202, Caputo fractional time derivative), fastL1Scheme
(:270), IMEX Euler (:377), ARS3 (:626), koto (:655); timestepperFactory.

API (ref :15-35): the problem supplies
  residual(t, u, ut, residual, coeff_A, coeff_B, coeff_g, coeff_residual,
           forcingVector)
      accumulating  coeff_A*M@ut + coeff_B*A@u - coeff_g*g(t)
      into ``residual`` (a mutable fe_vector), and
  solverBuilder(t, alpha, beta) -> solver for (alpha*M + beta*A) x = rhs.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .factory import factory

__all__ = ['Stepper', 'CrankNicolson', 'ExplicitEuler', 'ImplicitEuler',
           'L1Scheme', 'IMEXEuler', 'timestepperFactory']


class Stepper:
    def __init__(self, dm, residual, solverBuilder, dt=None,
                 solverIsTimeDependent=False,
                 explicitIslinearAndTimeIndependent=False, **kwargs):
        self.dm = dm
        self.residual = residual
        self.solverBuilder = solverBuilder
        self.dt = dt
        self.solverIsTimeDependent = solverIsTimeDependent
        self._solver = None
        self._solverCoeffs = None

    def getSolver(self, t, coeff_A, coeff_B):
        if self.solverIsTimeDependent or self._solver is None or \
                self._solverCoeffs != (coeff_A, coeff_B):
            self._solver = self.solverBuilder(t, coeff_A, coeff_B)
            self._solverCoeffs = (coeff_A, coeff_B)
        return self._solver

    def step(self, t, dt, u, forcingVector=None):
        raise NotImplementedError()

    def __call__(self, t, dt, u, forcingVector=None):
        return self.step(t, dt, u, forcingVector)

    def setRHS(self, t, dt, rhs):
        """Precompute the forcing part of the step (ref CrankNicolson.setRHS)."""
        raise NotImplementedError()


class CrankNicolson(Stepper):
    """theta-scheme (ref timestepping.py:64):
    (M/dt + theta A) u_{k+1} = M/dt u_k - (1-theta) A u_k
                               + (1-theta) g(t_k) + theta g(t_{k+1})."""

    def __init__(self, dm, residual, solverBuilder, theta=0.5, dt=None,
                 **kwargs):
        assert 0 <= theta <= 1
        self.theta = theta
        super().__init__(dm, residual, solverBuilder, dt, **kwargs)

    def setRHS(self, t, dt, rhs):
        self.residual(t, None, None, rhs, coeff_A=0., coeff_B=0.,
                      coeff_g=-(1 - self.theta))
        self.residual(t + dt, None, None, rhs, coeff_A=0., coeff_B=0.,
                      coeff_g=-self.theta, coeff_residual=1.)

    def step(self, t, dt, u, forcingVector=None):
        if dt is None:
            dt = self.dt
        rhs = self.dm.zeros()
        # M/dt u - (1-theta) A u + (1-theta) g(t) [+ theta g(t+dt)]
        self.residual(t, u, u, rhs, coeff_A=1. / dt,
                      coeff_B=-(1 - self.theta), coeff_g=-(1 - self.theta),
                      forcingVector=forcingVector)
        if forcingVector is None:
            self.residual(t + dt, u, u, rhs, coeff_A=0., coeff_B=0.,
                          coeff_g=-self.theta, coeff_residual=1.)
        solver = self.getSolver(t + dt, 1. / dt, self.theta)
        unew = solver.solve(rhs.data)
        u.assign(unew)
        return t + dt


class ImplicitEuler(Stepper):
    """(M/dt + A) u_{k+1} = M/dt u_k + g(t_{k+1}) (ref :190)."""

    def setRHS(self, t, dt, rhs):
        self.residual(t + dt, None, None, rhs, coeff_A=0., coeff_B=0.,
                      coeff_g=-1., coeff_residual=1.)

    def step(self, t, dt, u, forcingVector=None):
        if dt is None:
            dt = self.dt
        rhs = self.dm.zeros()
        self.residual(t + dt, u, u, rhs, coeff_A=1. / dt, coeff_B=0.,
                      coeff_g=-1. if forcingVector is None else 0.,
                      forcingVector=forcingVector)
        if forcingVector is not None:
            rhs.assign(rhs.data + jnp.asarray(forcingVector.data
                                              if hasattr(forcingVector, 'data')
                                              else forcingVector))
        solver = self.getSolver(t + dt, 1. / dt, 1.)
        u.assign(solver.solve(rhs.data))
        return t + dt


class ExplicitEuler(Stepper):
    """M u_{k+1} = M u_k + dt (g(t_k) - A u_k) (ref :178)."""

    def setRHS(self, t, dt, rhs):
        self.residual(t, None, None, rhs, coeff_A=0., coeff_B=0.,
                      coeff_g=-1., coeff_residual=1.)

    def step(self, t, dt, u, forcingVector=None):
        if dt is None:
            dt = self.dt
        rhs = self.dm.zeros()
        self.residual(t, u, u, rhs, coeff_A=1. / dt, coeff_B=-1.,
                      coeff_g=-1. if forcingVector is None else 0.,
                      forcingVector=forcingVector)
        if forcingVector is not None:
            rhs.assign(rhs.data + jnp.asarray(forcingVector.data
                                              if hasattr(forcingVector, 'data')
                                              else forcingVector))
        solver = self.getSolver(t, 1. / dt, 0.)
        u.assign(solver.solve(rhs.data))
        return t + dt


class L1Scheme(Stepper):
    """L1 discretization of the Caputo derivative of order alpha in (0,1)
    (ref timestepping.py:202):

      D_t^alpha u(t_k) ~= sum_{j=0}^{k-1} b_j (u^{k-j} - u^{k-j-1})
      b_j = ((j+1)^{1-alpha} - j^{1-alpha}) * dt^{-alpha} / Gamma(2-alpha)
    """

    def __init__(self, dm, residual, solverBuilder, alpha=0.5, dt=None,
                 **kwargs):
        from scipy.special import gamma as Gamma
        assert 0 < alpha < 1
        super().__init__(dm, residual, solverBuilder, dt, **kwargs)
        self.alpha = alpha
        self.history = []
        self._GammaFac = Gamma(2 - alpha)

    def _weights(self, k, dt):
        j = np.arange(k + 1)
        return ((j + 1) ** (1 - self.alpha) - j ** (1 - self.alpha)) \
            * dt ** (-self.alpha) / self._GammaFac

    def step(self, t, dt, u, forcingVector=None):
        if dt is None:
            dt = self.dt
        if not self.history:
            self.history.append(u.data)
        k = len(self.history) - 1
        b = self._weights(k, dt)
        rhs = self.dm.zeros()
        # (b_0 M + A) u^{k+1} = g + M [ b_0 u^k - sum_{j=1}^k b_j (u^{k+1-j} - u^{k-j}) ]
        U = self.history
        hist = b[0] * U[k]
        for j in range(1, k + 1):
            hist = hist - b[j] * (U[k + 1 - j] - U[k - j])
        from ..fem.dofmaps import fe_vector
        self.residual(t + dt, None, fe_vector(hist, self.dm), rhs,
                      coeff_A=1., coeff_B=0.,
                      coeff_g=-1. if forcingVector is None else 0.,
                      forcingVector=forcingVector)
        if forcingVector is not None:
            rhs.assign(rhs.data + jnp.asarray(forcingVector.data
                                              if hasattr(forcingVector, 'data')
                                              else forcingVector))
        solver = self.getSolver(t + dt, b[0], 1.)
        u.assign(solver.solve(rhs.data))
        self.history.append(u.data)
        return t + dt


class IMEXEuler(Stepper):
    """First-order IMEX: implicit diffusion, explicit reaction
    (ref timestepping.py:377 Euler-IMEX)."""

    def __init__(self, dm, residual, solverBuilder, explicitTerm=None,
                 dt=None, **kwargs):
        super().__init__(dm, residual, solverBuilder, dt, **kwargs)
        self.explicitTerm = explicitTerm

    def step(self, t, dt, u, forcingVector=None):
        if dt is None:
            dt = self.dt
        rhs = self.dm.zeros()
        self.residual(t, u, u, rhs, coeff_A=1. / dt, coeff_B=0.,
                      coeff_g=-1., forcingVector=forcingVector)
        if self.explicitTerm is not None:
            rhs.assign(rhs.data + jnp.asarray(self.explicitTerm(t, u)))
        solver = self.getSolver(t + dt, 1. / dt, 1.)
        u.assign(solver.solve(rhs.data))
        return t + dt


timestepperFactory = factory()
timestepperFactory.register('Crank-Nicolson', CrankNicolson,
                            aliases=['CN', 'crankNicolson'])
timestepperFactory.register('Implicit Euler', ImplicitEuler,
                            aliases=['implicitEuler', 'IE'])
timestepperFactory.register('Explicit Euler', ExplicitEuler,
                            aliases=['explicitEuler', 'EE'])
timestepperFactory.register('L1', L1Scheme)
timestepperFactory.register('IMEX-Euler', IMEXEuler, aliases=['imex'])
