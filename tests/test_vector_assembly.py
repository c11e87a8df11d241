"""True multi-component vector-valued assembly (valueSize > 1).

Reference behavior: a derivative kernel of a multi-parameter fractional
order is VECTOR-valued with valueSize = s.numParameters (derivative=1) or
numParameters**2 (derivative=2) (kernelsCy.pyx:1580-1584); the assembly
scatters all components per element pair (IndexManagerVector paths,
nonlocalAssembly_{SCALAR}.pxi).  Here the one-pass vector assembly is pinned
against (a) per-component scalar assemblies and (b) finite differences of
the plain operator in parameter space.
"""
import numpy as np
import pytest

import pynucleus_tpu  # noqa: F401
from pynucleus_tpu.fem import simpleInterval, P1_DoFMap
from pynucleus_tpu.nl import getFractionalKernel
from pynucleus_tpu.nl.kernels import (leftRightFractionalOrder,
                                      feFractionalOrder,
                                      VectorFractionalKernel)
from pynucleus_tpu.nl.assembly import nonlocalBuilder


def _mesh(noRef=4):
    m = simpleInterval(-1.0, 1.0)
    for _ in range(noRef):
        m = m.refine()
    return m


def test_valueSize_bookkeeping():
    s = leftRightFractionalOrder(0.25, 0.75)
    assert s.numParameters == 2
    s4 = leftRightFractionalOrder(0.25, 0.75, slr=0.4, srl=0.6)
    assert s4.numParameters == 4
    k1 = getFractionalKernel(1, s, derivative=1)
    assert isinstance(k1, VectorFractionalKernel)
    assert k1.valueSize == 2
    k2 = getFractionalKernel(1, s, derivative=2)
    assert k2.valueSize == 4


def test_vector_vs_component_scalar_assembly():
    """One-pass vector dense assembly == per-component scalar assembly
    (identical panel rules -> agreement to fp roundoff)."""
    m = _mesh(4)
    dm = P1_DoFMap(m)
    s = leftRightFractionalOrder(0.25, 0.75)
    k = getFractionalKernel(1, s, derivative=1)
    A = nonlocalBuilder(dm, k, zeroExterior=True).getDenseVector()
    arr = np.asarray(A.toarray())
    assert arr.shape == (dm.num_dofs, dm.num_dofs, 2)
    for q, kq in enumerate(k.componentKernels()):
        Aq = np.asarray(nonlocalBuilder(dm, kq,
                                        zeroExterior=True).getDense()
                        .toarray())
        err = np.abs(arr[:, :, q] - Aq).max() / max(np.abs(Aq).max(), 1e-30)
        assert err < 1e-10, (q, err)


def test_vector_assembly_vs_finite_difference():
    """Component q == d/dp_q of the PLAIN operator: central finite
    difference in (sll, srr) of leftRight."""
    m = _mesh(4)
    dm = P1_DoFMap(m)
    sll, srr = 0.3, 0.6
    k = getFractionalKernel(
        1, leftRightFractionalOrder(sll, srr), derivative=1)
    arr = np.asarray(nonlocalBuilder(dm, k,
                                     zeroExterior=True).getDenseVector()
                     .toarray())
    eps = 1e-5

    def plain(a, b):
        kk = getFractionalKernel(1, leftRightFractionalOrder(a, b))
        return np.asarray(nonlocalBuilder(dm, kk,
                                          zeroExterior=True).getDense()
                          .toarray())

    fd0 = (plain(sll + eps, srr) - plain(sll - eps, srr)) / (2 * eps)
    fd1 = (plain(sll, srr + eps) - plain(sll, srr - eps)) / (2 * eps)
    for q, fd in enumerate((fd0, fd1)):
        scale = max(np.abs(fd).max(), 1e-30)
        err = np.abs(arr[:, :, q] - fd).max() / scale
        assert err < 5e-4, (q, err)


def test_second_derivative_shape_and_symmetry():
    m = _mesh(3)
    dm = P1_DoFMap(m)
    s = leftRightFractionalOrder(0.3, 0.6)
    k2 = getFractionalKernel(1, s, derivative=2)
    arr = np.asarray(nonlocalBuilder(dm, k2,
                                     zeroExterior=True).getDenseVector()
                     .toarray())
    N = dm.num_dofs
    assert arr.shape == (N, N, 4)
    # d2/dp_i dp_j symmetric in (i, j): components [1] (0,1) and [2] (1,0)
    H = arr.reshape(N, N, 2, 2)
    assert np.abs(H[:, :, 0, 1] - H[:, :, 1, 0]).max() \
        <= 1e-10 * max(np.abs(H).max(), 1e-30)


def test_fe_order_gradient_partition_of_unity():
    """feFractionalOrder: numParameters = num_dofs of the order space and
    the parameter gradient is a partition of unity over interior points
    (plus boundary dofs outside the parameter set)."""
    import jax.numpy as jnp
    from pynucleus_tpu.fem.functions import constant
    m = _mesh(3)
    dmS = P1_DoFMap(m, 'everywhere')  # order space with ALL dofs free
    vec = dmS.interpolate(constant(0.5))
    s = feFractionalOrder(vec, smin=0.2, smax=0.8)
    assert s.numParameters == dmS.num_dofs
    x = jnp.asarray(np.linspace(-0.9, 0.9, 7)[:, None])
    g = np.asarray(s.evalGradJax(x, x))
    assert g.shape == (7, dmS.num_dofs)
    assert np.abs(g.sum(axis=1) - 1.0).max() < 1e-6


if __name__ == '__main__':
    pytest.main([__file__, '-v'])
