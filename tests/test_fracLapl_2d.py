"""2D fractional Laplacian tests: singular-rule validation and convergence.

Counterpart of the reference's tests/test_fracLapl.py (dense assembly 2D,
energy-norm error vs analytic) with rule-level validations replacing the
Cython unit tests.  MC reference values below were computed with 3e7-sample
Monte Carlo (sigma ~ 3e-5); rules match to ~1 sigma.
"""
import numpy as np
import pytest

from pynucleus_tpu.nl.quad_singular_2d import (sameCellRule2DSS, edgeRule2DSS,
                                               vertexRule2DSS)


S = 0.4
SING = -2 - 2 * S


def test_samecell_rule_2d():
    rule = sameCellRule2DSS(SING, 2, 12, radialOrder=6)
    V = np.array([[0., 0.], [1., 0.], [0., 1.]])
    x = rule.bary_x.T @ V
    y = rule.bary_y.T @ V
    r2 = ((x - y) ** 2).sum(1)
    PSI = rule.bary_x[0] - rule.bary_y[0]
    val = np.sum(rule.w * PSI ** 2 * r2 ** (0.5 * SING))  # det norm: (2A)^2=1
    assert np.isclose(val, 0.5918806, rtol=1e-3), val  # MC 0.59188 +- 0.00024


def test_edge_rule_2d():
    rule = edgeRule2DSS(SING, 2, 16, radialOrder=4)
    V1 = np.array([[0., 0.], [1., 0.], [0., 1.]])
    V2 = np.array([[0., 0.], [1., 0.], [0.3, -0.8]])
    x = rule.bary_x.T @ V1
    y = rule.bary_y.T @ V2
    r2 = ((x - y) ** 2).sum(1)
    PSI = rule.bary_x[0] - rule.bary_y[0]
    val = np.sum(rule.w * PSI ** 2 * r2 ** (0.5 * SING)) * (2 * 0.5) * (2 * 0.4)
    assert np.isclose(val, 0.1152625, rtol=1e-3), val  # MC +- 3.4e-5


def test_vertex_rule_2d():
    rule = vertexRule2DSS(SING, 2, 16, radialOrder=4)
    V1 = np.array([[0., 0.], [1., 0.], [0., 1.]])
    V2 = np.array([[0., 0.], [-1., 0.], [-0.3, -0.8]])
    x = rule.bary_x.T @ V1
    y = rule.bary_y.T @ V2
    r2 = ((x - y) ** 2).sum(1)
    PSI = rule.bary_x[0] - rule.bary_y[0]
    A2 = 0.4
    val = np.sum(rule.w * PSI ** 2 * r2 ** (0.5 * SING)) * (2 * 0.5) * (2 * A2)
    assert np.isclose(val, 0.0363468, rtol=1e-3), val  # MC +- 1.2e-5


@pytest.mark.slow
def test_disc_constant_convergence():
    """Errors vs the analytic solution on the disc decrease at the expected
    rate under refinement (rates: L2 ~ h^{s+1/2})."""
    from drivers.runFractional import main
    errs = []
    for noRef in (2, 3):
        d, mS = main(['--domain', 'disc', '--s', 'const(0.75)', '--problem',
                      'constant', '--element', 'P1', '--solverType', 'lu',
                      '--matrixFormat', 'dense', '--noRef', str(noRef)])
        errs.append(mS.L2_error)
    rate = np.log2(errs[0] / errs[1])
    assert rate > 0.8, (errs, rate)


def test_square_exterior_term():
    """zeroExterior surface term on the unit square against a direct contour
    integral of w(x) = 2 int_{Omega^c} gamma (validated to 0.2%)."""
    import jax.numpy as jnp
    from pynucleus_tpu.fem import uniformSquare, P1_DoFMap
    from pynucleus_tpu.nl import getFractionalKernel
    from pynucleus_tpu.nl.assembly import nonlocalBuilder, DenseAccumulator

    s = 0.6
    m = uniformSquare(N=3, ax=0, ay=0, bx=1, by=1).refine()
    dm = P1_DoFMap(m)
    kernel = getFractionalKernel(2, s)
    b = nonlocalBuilder(dm, kernel)
    N = dm.num_dofs
    acc = DenseAccumulator(N)
    b._addZeroExterior(acc)
    Aext = acc.A[:N, :N]
    u = np.ones(N)
    quadform = float(u @ Aext @ u)
    assert np.isclose(quadform, 1.3408, rtol=5e-3), quadform
