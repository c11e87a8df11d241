"""Transient fractional heat regression tests (counterpart of the
reference's cache_runFractionalHeat.py--* files; expected values are DATA
from those caches)."""
import numpy as np
import pytest

from drivers.runFractionalHeat import main as runFractionalHeat


CONFIGS = [
    (['--domain', 'interval', '--s', 'const(0.75)', '--problem', 'constant',
      '--element', 'P1', '--solverType', 'lu', '--matrixFormat', 'dense'],
     {'L^2(0,T; L^2(Omega)) error': 0.001373383240555988,
      'L^2(0,T; L^2(Omega)) norm': 0.9834423668513136,
      'L^2(Omega) error at t=finalTime': 0.0006827318330338746}),
    (['--domain', 'interval', '--s', 'const(0.25)', '--problem', 'constant',
      '--element', 'P1', '--solverType', 'cg-mg', '--matrixFormat', 'dense'],
     {'L^2(0,T; L^2(Omega)) error': 0.03218338586612875,
      'L^2(0,T; L^2(Omega)) norm': 1.7018299503210628,
      'L^2(Omega) error at t=finalTime': 0.01455872345929613}),
]

IDS = ['s0.75-lu', 's0.25-cgmg']


@pytest.mark.parametrize('argv,expected', CONFIGS, ids=IDS)
def test_runFractionalHeat(argv, expected):
    d, mS = runFractionalHeat(argv)
    got = d.outputGroups['errors'].toDict()
    for label, val in expected.items():
        assert np.isclose(got[label], val, rtol=3e-2, atol=1e-8), \
            (label, got[label], val)


def test_steppers_ode():
    """Steppers integrate du/dt + u = 0 at the right orders."""
    import jax.numpy as jnp
    from pynucleus_tpu.base.timestepping import timestepperFactory
    from pynucleus_tpu.base.linear_operators import Diagonal_LinearOperator
    from pynucleus_tpu.base.solvers import solverFactory
    from pynucleus_tpu.fem import simpleInterval, P1_DoFMap

    m = simpleInterval(0., 1.)
    m = m.refine().refine()
    dm = P1_DoFMap(m, tag=-1234)
    n = dm.num_dofs
    I = Diagonal_LinearOperator(jnp.ones(n))

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

    errs = {}
    for name, order in [('Crank-Nicolson', 2), ('Implicit Euler', 1)]:
        errs[name] = []
        for nT in (20, 40):
            stepper = timestepperFactory(name, dm=dm, residual=residual,
                                         solverBuilder=solverBuilder,
                                         dt=1.0 / nT)
            u = dm.ones()
            t = 0.0
            for _ in range(nT):
                t = stepper(t, 1.0 / nT, u)
            errs[name].append(abs(float(u.data[0]) - np.exp(-1.0)))
        rate = np.log2(errs[name][0] / errs[name][1])
        assert rate > order - 0.25, (name, errs[name], rate)


HEAT_H2_CONFIGS = [
    (['--domain', 'interval', '--s', 'const(0.75)', '--problem', 'constant',
      '--element', 'P2', '--solverType', 'cg-mg', '--matrixFormat', 'H2'],
     {'L^2(0,T; L^2(Omega)) error': 0.0009194744825301727}),
    (['--domain', 'interval', '--s', 'varconst(0.75)', '--problem', 'constant',
      '--element', 'P1', '--solverType', 'cg-jacobi', '--matrixFormat', 'H2'],
     {'L^2(0,T; L^2(Omega)) error': 0.0013735058079687849}),
]


@pytest.mark.slow
@pytest.mark.parametrize('argv,expected', HEAT_H2_CONFIGS,
                         ids=['P2-H2', 'varconst-H2'])
def test_runFractionalHeat_H2(argv, expected):
    d, mS = runFractionalHeat(argv)
    got = d.outputGroups['errors'].toDict()
    for label, val in expected.items():
        assert np.isclose(got[label], val, rtol=3e-2, atol=1e-8), \
            (label, got[label], val)
