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
           'L1Scheme', 'fastL1Scheme', 'IMEXEuler', 'IMEX', 'EulerIMEX',
           'ARS3', 'koto', 'timestepperFactory']


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


class fastL1Scheme(Stepper):
    """Fast L1 scheme for the Caputo derivative via sum-of-exponentials
    approximation of the history kernel (ref timestepping.py:270-375).

    Instead of O(k) history per step, the memory integral
    int_0^{t-dt} (t-tau)^{-alpha-1} u(tau) dtau is approximated by
    sum_i w_i exp(-s_i (t-tau)) with Gauss-Jacobi/Legendre nodes s_i on a
    dyadic decomposition; the memory state is a [Nexp+1, N] device array
    updated by one fused elementwise kernel per step.
    """

    def __init__(self, dm, residual, solverBuilder, alpha=0.5,
                 maxTimeSteps=None, dt=None, eps=1e-4, **kwargs):
        from scipy.special import gamma as Gamma
        super().__init__(dm, residual, solverBuilder, dt, **kwargs)
        assert self.dt is not None, 'fastL1 needs a fixed dt'
        assert 0 < alpha < 1
        self.alpha = alpha
        self.maxTimeSteps = maxTimeSteps if maxTimeSteps is not None else 10000
        self.eps = eps
        s, w = self._soeWeights()
        self.s = jnp.asarray(s)
        self.w = np.asarray(w)
        self.Nexp = w.shape[0] - 1
        self.memory = jnp.zeros((self.Nexp + 1, dm.num_dofs))
        self._GammaFac = Gamma(2 - alpha) * self.dt ** alpha
        self.uoldM = None   # M @ u at previous step
        self.k = 1

    def _soeWeights(self):
        """Dyadic Gauss quadrature of the power-law kernel
        (ref timestepping.py:292-321 getWeights)."""
        from scipy.special import roots_sh_jacobi, roots_sh_legendre
        from scipy.special import gamma as Gamma
        alpha, dt = self.alpha, self.dt
        M = int(np.ceil(np.log2(self.maxTimeSteps * dt)))
        N = int(np.ceil(np.log2(1 / dt) + np.log2(np.log(1 / self.eps))))
        no = int(np.ceil(np.log(1 / self.eps)) / 2)
        nl = int(np.ceil(np.log(1 / dt) + np.log(1 / self.eps)) / 2)
        s, w = [np.array([0.])], [np.array([1.])]
        so, wo = roots_sh_jacobi(no, alpha + 1, alpha + 1)
        s.append(so * 2 ** M)
        w.append(wo * (2 ** M) ** (alpha + 1))
        sl0, wl0 = roots_sh_legendre(nl)
        for j in range(max(M, 0), N + 1):
            sl = (2 ** (j + 1) - 2 ** j) * sl0 + 2 ** j
            s.append(sl)
            w.append(wl0 * (2 ** (j + 1) - 2 ** j) * sl ** alpha)
        s = np.concatenate(s)
        w = alpha * (1 - alpha) * dt ** alpha * np.concatenate(w) \
            / Gamma(1 + alpha)
        return s, w

    def step(self, t, dt, u, forcingVector=None):
        if dt is None:
            dt = self.dt
        assert dt == self.dt, 'fastL1 uses a fixed dt'
        # Mu := M @ u^k
        r = self.dm.zeros()
        self.residual(t, None, u, r, coeff_A=1., coeff_B=0., coeff_g=0.)
        Mu = jnp.asarray(r.data)
        if self.k == 1:
            self.memory = self.memory.at[0].set(Mu)
        else:
            expDtS = jnp.exp(-dt * self.s)
            temp = jnp.where(self.s > 0, expDtS / (self.s ** 2 * dt), 0.)
            cNew = temp * (expDtS - 1 + self.s * dt)
            cOld = temp * (1 - expDtS - expDtS * self.s * dt)
            self.memory = (expDtS[:, None] * self.memory
                           + cNew[:, None] * Mu[None, :]
                           + cOld[:, None] * self.uoldM[None, :])
        self.uoldM = Mu
        # rhs = dt^alpha Gamma(2-alpha) g(t+dt) + alpha M u^k + w @ memory
        r2 = self.dm.zeros()
        self.residual(t + dt, None, None, r2, coeff_A=0., coeff_B=0.,
                      coeff_g=-1. if forcingVector is None else 0.,
                      forcingVector=forcingVector)
        rhs = self._GammaFac * jnp.asarray(r2.data)
        if forcingVector is not None:
            rhs = rhs + self._GammaFac * jnp.asarray(
                forcingVector.data if hasattr(forcingVector, 'data')
                else forcingVector)
        w = self.w.copy()
        w[0] = (1 - self.alpha) * (dt / (t + dt)) ** self.alpha
        rhs = rhs + self.alpha * Mu + jnp.asarray(w) @ self.memory
        # (M + dt^alpha Gamma(2-alpha) A) u^{k+1} = rhs
        solver = self.getSolver(t + dt, 1., self._GammaFac)
        u.assign(solver.solve(rhs))
        self.k += 1
        return t + dt


class IMEX(Stepper):
    """General IMEX Runge-Kutta scheme with Butcher tableaux (AImpl, bImpl)
    implicit / (AExpl, bExpl) explicit (ref timestepping.py:377-577).

    Solves M u_t + I(u) + E(u) = g with I handled implicitly (the stiffness
    part supplied by `residual` through coeff_B) and E = `explicitTerm(t, u)`
    handled explicitly (e.g. a nonlinearity).

    Stage k:  (M + AImpl[k,k] dt A) U_k = M u
              - dt sum_{j<k} (AImpl[k,j] I_j + AExpl[k,j] E_j)
              + dt sum_{j<=k} AImpl[k,j] g_j
    Update:   M u_new = M u - dt sum_k (bImpl[k] I_k + bExpl[k] E_k)
              + dt sum_k bImpl[k] g_k
    """

    c = None
    bExpl = None
    bImpl = None
    AExpl = None
    AImpl = None

    def __init__(self, dm, residual, solverBuilder, explicitTerm=None,
                 dt=None, **kwargs):
        super().__init__(dm, residual, solverBuilder, dt, **kwargs)
        self.explicitTerm = explicitTerm
        self.numStages = self.AExpl.shape[0]
        self._massSolver = None
        self._stageSolvers = {}

    def _applyResidual(self, t, u=None, ut=None, coeff_A=0., coeff_B=0.,
                       coeff_g=0., forcingVector=None):
        from ..fem.dofmaps import fe_vector
        r = self.dm.zeros()
        wrap = (lambda x: fe_vector(jnp.asarray(x), self.dm)
                if x is not None and not hasattr(x, 'data') else x)
        self.residual(t, wrap(u), wrap(ut), r, coeff_A=coeff_A,
                      coeff_B=coeff_B, coeff_g=coeff_g,
                      forcingVector=forcingVector)
        return jnp.asarray(r.data)

    def _getStageSolver(self, t, beta):
        if self.solverIsTimeDependent:
            return self.solverBuilder(t, 1., beta)
        if beta not in self._stageSolvers:
            self._stageSolvers[beta] = self.solverBuilder(t, 1., beta)
        return self._stageSolvers[beta]

    def step(self, t, dt, u, forcingVector=None):
        if dt is None:
            dt = self.dt
        s = self.numStages
        uArr = jnp.asarray(u.data)
        Mu = self._applyResidual(t + dt, ut=uArr, coeff_A=1.)
        force = [None] * s
        for k in range(s):
            if np.abs(self.AImpl[:, k]).sum() != 0. or self.bImpl[k] != 0.:
                fv = None if forcingVector is None else forcingVector[k]
                force[k] = self._applyResidual(
                    t + self.c[k] * dt, coeff_g=-1. if fv is None else 0.,
                    forcingVector=fv)
                if fv is not None:
                    force[k] = force[k] + jnp.asarray(
                        fv.data if hasattr(fv, 'data') else fv)
        U = [None] * s
        Ik = [None] * s
        Ek = [None] * s
        for k in range(s):
            if np.abs(self.AExpl[k, :]).max() == 0.:
                U[k] = uArr
            else:
                rhs = Mu
                for j in range(k):
                    if self.AExpl[k, j] != 0. and Ek[j] is not None:
                        rhs = rhs - dt * self.AExpl[k, j] * Ek[j]
                    if self.AImpl[k, j] != 0.:
                        rhs = rhs - dt * self.AImpl[k, j] * Ik[j]
                for j in range(k + 1):
                    if self.AImpl[k, j] != 0. and force[j] is not None:
                        rhs = rhs + dt * self.AImpl[k, j] * force[j]
                solver = self._getStageSolver(t + self.c[k] * dt,
                                              self.AImpl[k, k] * dt)
                U[k] = jnp.asarray(solver.solve(rhs))
            if np.abs(self.AExpl[:, k]).sum() != 0. or self.bExpl[k] != 0.:
                Ek[k] = (jnp.asarray(self.explicitTerm(t + self.c[k] * dt,
                                                       U[k]))
                         if self.explicitTerm is not None
                         else jnp.zeros_like(uArr))
            if np.abs(self.AImpl[:, k]).sum() != 0. or self.bImpl[k] != 0.:
                Ik[k] = self._applyResidual(t + self.c[k] * dt, u=U[k],
                                            coeff_B=1.)
        rhs = Mu
        for k in range(s):
            if self.bExpl[k] != 0. and Ek[k] is not None:
                rhs = rhs - dt * self.bExpl[k] * Ek[k]
            if self.bImpl[k] != 0.:
                rhs = rhs - dt * self.bImpl[k] * Ik[k]
                if force[k] is not None:
                    rhs = rhs + dt * self.bImpl[k] * force[k]
        if self._massSolver is None or self.solverIsTimeDependent:
            self._massSolver = self.solverBuilder(t, 1., 0.)
        u.assign(self._massSolver.solve(rhs))
        return t + dt


class EulerIMEX(IMEX):
    """First-order IMEX Euler tableau (ref timestepping.py:600-625)."""
    gamma = 1.
    AExpl = np.array([[0., 0.], [1., 0.]])
    AImpl = np.array([[0., 0.], [0., 1.]])
    bExpl = np.array([1., 0.])
    bImpl = np.array([0., 1.])
    c = np.array([0., 1.])


class ARS3(IMEX):
    """Third-order ARS(2,2,3)-type scheme (ref timestepping.py:626-654)."""
    gamma = (3 + np.sqrt(3)) / 6

    def __init__(self, *args, **kwargs):
        g = self.gamma
        self.AExpl = np.array([[0., 0., 0.],
                               [g, 0., 0.],
                               [g - 1., 2. * (1. - g), 0.]])
        self.AImpl = np.array([[0., 0., 0.],
                               [0., g, 0.],
                               [0., 1. - 2. * g, g]])
        self.bExpl = np.array([0., 0.5, 0.5])
        self.bImpl = np.array([0., 0.5, 0.5])
        self.c = np.array([0., g, 1. - g])
        super().__init__(*args, **kwargs)


class koto(IMEX):
    """Koto's IMEX scheme (ref timestepping.py:655-692)."""
    gamma = 1.
    AImpl = np.array([[0., 0., 0., 0.],
                      [0., 1., 0., 0.],
                      [0., -0.5, 1., 0.],
                      [0., -1., 1., 1.]])
    AExpl = np.array([[0., 0., 0., 0.],
                      [1., 0., 0., 0.],
                      [0.5, 0., 0., 0.],
                      [0., 0., 1., 0.]])
    bExpl = np.array([0., 0., 1., 0.])
    bImpl = np.array([0., -1., 1., 1.])
    c = np.array([0., 1., 0.5, 1.])


timestepperFactory = factory()
timestepperFactory.register('Crank-Nicolson', CrankNicolson,
                            aliases=['CN', 'crankNicolson'])
timestepperFactory.register('Implicit Euler', ImplicitEuler,
                            aliases=['implicitEuler', 'IE'])
timestepperFactory.register('Explicit Euler', ExplicitEuler,
                            aliases=['explicitEuler', 'EE'])
timestepperFactory.register('L1', L1Scheme)
timestepperFactory.register('fast L1', fastL1Scheme, aliases=['fastL1'])
timestepperFactory.register('IMEX-Euler', IMEXEuler, aliases=['imex'])
timestepperFactory.register('Euler IMEX', EulerIMEX, aliases=['euler_imex'])
timestepperFactory.register('ARS3 IMEX', ARS3, aliases=['ars3'])
timestepperFactory.register('Koto IMEX', koto, aliases=['koto'])
