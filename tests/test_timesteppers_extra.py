"""fastL1 and IMEX tableau steppers (ref base/timestepping.py:270-692)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pynucleus_tpu.base.timestepping import timestepperFactory
from pynucleus_tpu.base.linear_operators import Diagonal_LinearOperator
from pynucleus_tpu.base.solvers import solverFactory
from pynucleus_tpu.fem import simpleInterval, P1_DoFMap


def _setup():
    m = simpleInterval(0., 1.)
    m = m.refine().refine()
    dm = P1_DoFMap(m, tag=-1234)
    n = dm.num_dofs

    def residual(t, u, ut, res, coeff_A=1., coeff_B=1., coeff_g=1.,
                 coeff_residual=0., forcingVector=None):
        out = res.data * coeff_residual
        if coeff_A and ut is not None:
            out = out + coeff_A * ut.data
        if coeff_B and u is not None:
            out = out + coeff_B * u.data
        res.assign(out)

    def solverBuilder(t, alpha, beta):
        return solverFactory.build(
            'lu', A=Diagonal_LinearOperator((alpha + beta) * jnp.ones(n)),
            setup=True)

    return dm, residual, solverBuilder


@pytest.mark.parametrize('name,order', [('Euler IMEX', 1), ('ars3', 2),
                                        ('koto', 2)])
def test_imex_order(name, order):
    """du/dt = -u with implicit I(u)=0.5u and explicit E(u)=0.5u;
    exact solution exp(-t)."""
    dm, residual, solverBuilder = _setup()

    def residualHalf(t, u, ut, res, coeff_A=1., coeff_B=1., coeff_g=1.,
                     coeff_residual=0., forcingVector=None):
        residual(t, u, ut, res, coeff_A=coeff_A, coeff_B=0.5 * coeff_B,
                 coeff_g=coeff_g, coeff_residual=coeff_residual,
                 forcingVector=forcingVector)

    def explicitTerm(t, u):
        return 0.5 * jnp.asarray(u)

    n = dm.num_dofs

    def solverBuilderHalf(t, alpha, beta):
        # alpha*M + beta*I_op with M = Id, I_op = 0.5*Id
        return solverFactory.build(
            'lu', A=Diagonal_LinearOperator((alpha + 0.5 * beta)
                                            * jnp.ones(n)),
            setup=True)

    errs = []
    for nT in (20, 40):
        stepper = timestepperFactory(name, dm=dm, residual=residualHalf,
                                     solverBuilder=solverBuilderHalf,
                                     explicitTerm=explicitTerm, dt=1.0 / nT)
        u = dm.ones()
        t = 0.0
        for _ in range(nT):
            t = stepper(t, 1.0 / nT, u)
        errs.append(abs(float(u.data[0]) - np.exp(-1.0)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.3, (name, errs, rate)


def _mittagLeffler(alpha, z, K=200):
    from scipy.special import gamma as Gamma
    ks = np.arange(K)
    return float(np.sum(z ** ks / Gamma(alpha * ks + 1)))


@pytest.mark.parametrize('alpha', [0.3, 0.7])
def test_fastL1_matches_L1(alpha):
    """Caputo D^alpha u = -u, u(0)=1: fastL1 (sum-of-exponentials memory)
    agrees with the exact L1 scheme and with E_alpha(-t^alpha)."""
    dm, residual, solverBuilder = _setup()
    nT = 64
    dt = 1.0 / nT
    finals = {}
    for name in ('L1', 'fastL1'):
        stepper = timestepperFactory(name, dm=dm, residual=residual,
                                     solverBuilder=solverBuilder,
                                     alpha=alpha, dt=dt, maxTimeSteps=nT)
        u = dm.ones()
        t = 0.0
        for _ in range(nT):
            t = stepper(t, dt, u)
        finals[name] = float(u.data[0])
    exact = _mittagLeffler(alpha, -1.0)
    assert abs(finals['L1'] - exact) < 2e-2, (finals['L1'], exact)
    assert abs(finals['fastL1'] - finals['L1']) < 5e-3, finals
