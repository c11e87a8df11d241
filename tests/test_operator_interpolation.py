"""Operator interpolation over the fractional order s
(ref nl/PyNucleus_nl/operatorInterpolation.py,
examples/example_operator_interpolation.py)."""
import numpy as np
import pytest

from pynucleus_tpu.fem import meshFactory, dofmapFactory, functionFactory
from pynucleus_tpu.nl.kernels import kernelFactory, getFractionalKernel
from pynucleus_tpu.nl.assembly import assembleNonlocal
from pynucleus_tpu.nl.operator_interpolation import (
    admissibleSet, RangedFractionalKernel, getChebyIntervalsAndNodes,
    lagrangeWeights, chebyshevNodesOnInterval)
from pynucleus_tpu.base import solverFactory


def test_cheby_intervals_cover_range():
    intervals, nodes = getChebyIntervalsAndNodes(0.1, 0.9, 2.0, 0.5, 1e-3,
                                                 variableOrder=True)
    assert abs(intervals[0][0] - 0.1) < 1e-14
    assert intervals[-1][1] >= 0.9 - 1e-14
    for (a, b), nds in zip(intervals, nodes):
        assert b > a
        assert np.all(nds >= a - 1e-14) and np.all(nds <= b + 1e-14)
    # intervals are contiguous
    for (a1, b1), (a2, b2) in zip(intervals[:-1], intervals[1:]):
        assert abs(b1 - a2) < 1e-12


def test_lagrange_weights_reproduce_polynomial():
    nodes = chebyshevNodesOnInterval(5, 0.2, 0.6)
    f = lambda s: 3.0 * s ** 4 - s ** 2 + 0.5  # degree 4, exactly interpolated
    for s in [0.25, 0.4, 0.55]:
        w = lagrangeWeights(nodes, s)
        assert abs(w @ f(nodes) - f(s)) < 1e-12
    # at a node: delta weights
    w = lagrangeWeights(nodes, nodes[2])
    assert abs(w[2] - 1.0) < 1e-12 and abs(w).sum() < 1.0 + 1e-12


def test_ranged_kernel_factory():
    s = admissibleSet([0.3, 0.7])
    kernel = kernelFactory('fractional', s=s, dim=1)
    assert isinstance(kernel, RangedFractionalKernel)
    frozen = kernel.getFrozenKernel(0.5)
    assert abs(frozen.s.value - 0.5) < 1e-14


@pytest.mark.parametrize('sVal', [
    # ~8 s per s-value: one representative stays fast, the ends go slow
    pytest.param(0.35, marks=pytest.mark.slow),
    0.5,
    pytest.param(0.65, marks=pytest.mark.slow),
])
def test_interpolated_operator_matches_direct(sVal):
    mesh = meshFactory('interval', a=-1, b=1)
    for _ in range(4):
        mesh = mesh.refine()
    dm = dofmapFactory('P1', mesh)
    kernel = RangedFractionalKernel(1, admissibleSet([0.3, 0.7]))
    A = assembleNonlocal(dm, kernel, matrixFormat='dense')
    A.set(sVal)
    direct = assembleNonlocal(dm, getFractionalKernel(1, sVal),
                              matrixFormat='dense')
    x = np.cos(np.arange(dm.num_dofs, dtype=np.float64))
    yI = np.asarray(A @ x)
    yD = np.asarray(direct @ x)
    errorBound = 0.1 * float(mesh.h) ** 0.5
    relErr = np.linalg.norm(yI - yD) / np.linalg.norm(yD)
    assert relErr < errorBound, (relErr, errorBound)
    # toarray path agrees with matvec path
    assert np.linalg.norm(np.asarray(A.toarray()) @ x - yI) < 1e-10


def test_interpolated_solve():
    mesh = meshFactory('interval', a=-1, b=1)
    for _ in range(5):
        mesh = mesh.refine()
    dm = dofmapFactory('P1', mesh)
    kernel = kernelFactory('fractional', s=admissibleSet([0.25, 0.75]), dim=1)
    A = assembleNonlocal(dm, kernel, matrixFormat='dense')
    f = functionFactory('constant', value=1.)
    b = np.asarray(dm.assembleRHS(f))
    A.set(0.75)
    solver = solverFactory('cg-jacobi', A=A, setup=True)
    solver.maxIter = 1000
    x = np.zeros(dm.num_dofs)
    x = solver(b, x)
    res = np.linalg.norm(np.asarray(A @ x) - b)
    assert res < 1e-5 * np.linalg.norm(b)
    # second s in the same interval reuses assembled node operators
    nAssembled = sum(d.assembled for ops in A.ops for d in ops)
    A.set(0.74)
    assert sum(d.assembled for ops in A.ops for d in ops) == nAssembled
