"""s-derivative fractional kernels and vector-valued assembly (ref
kernelsCy.pyx FractionalKernel derivative=1/2 :1576-1598, tests/
test_kernels.py:233-350 FD checks, nonlocalAssembly pxi:1354
Dense_VectorLinearOperator, clusterMethodCy.pyx:2670 VectorH2Matrix)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pynucleus_tpu.fem import simpleInterval, P1_DoFMap
from pynucleus_tpu.nl import getFractionalKernel
from pynucleus_tpu.nl.assembly import nonlocalBuilder


@pytest.mark.parametrize('dim,s,horizon,normalized', [
    (1, 0.25, np.inf, True), (1, 0.75, np.inf, True),
    (1, 0.25, 0.5, True), (1, 0.25, np.inf, False),
    (2, 0.75, np.inf, True), (2, 0.25, 0.5, True),
])
def test_derivative_kernel_fd(dim, s, horizon, normalized):
    """First and second s-derivatives match central finite differences of
    the base kernel (the reference's test_kernels.py strategy)."""
    eps = 1e-6
    x = np.zeros(dim)
    y = np.full(dim, 0.3 / np.sqrt(dim))
    base = {h: getFractionalKernel(dim, s + h, horizon,
                                   normalized=normalized)
            for h in (-eps, 0.0, eps)}
    d1 = getFractionalKernel(dim, s, horizon, normalized=normalized,
                             derivative=1)
    fd1 = (base[eps](x, y) - base[-eps](x, y)) / (2 * eps)
    assert np.isclose(d1(x, y), fd1, rtol=1e-4), (d1(x, y), fd1)
    d2 = getFractionalKernel(dim, s, horizon, normalized=normalized,
                             derivative=2)
    fd2 = (base[eps](x, y) - 2 * base[0.0](x, y)
           + base[-eps](x, y)) / eps ** 2
    assert np.isclose(d2(x, y), fd2, rtol=1e-3), (d2(x, y), fd2)


def test_vector_assembly_fd():
    """Dense vector assembly of dA/ds matches the finite difference of the
    assembled operators."""
    m = simpleInterval(-1.0, 1.0)
    for _ in range(4):
        m = m.refine()
    dm = P1_DoFMap(m)
    s, eps = 0.4, 1e-5
    Ap = nonlocalBuilder(dm, getFractionalKernel(1, s + eps)).getDense()
    Am = nonlocalBuilder(dm, getFractionalKernel(1, s - eps)).getDense()
    fd = (np.asarray(Ap.toarray()) - np.asarray(Am.toarray())) / (2 * eps)
    kD = getFractionalKernel(1, s, derivative=1)
    V = nonlocalBuilder(dm, kD).getDenseVector()
    assert V.vectorSize == 1
    got = np.asarray(V.toarray())[:, :, 0]
    rel = np.abs(got - fd).max() / np.abs(fd).max()
    assert rel < 1e-3, rel
    # vector matvec shape + consistency
    x = jnp.asarray(np.random.RandomState(0).rand(dm.num_dofs))
    y = V.matvec(x)
    assert y.shape == (dm.num_dofs, 1)
    assert np.allclose(np.asarray(y)[:, 0], got @ np.asarray(x))


def test_vector_h2():
    m = simpleInterval(-1.0, 1.0)
    for _ in range(6):
        m = m.refine()
    dm = P1_DoFMap(m)
    kD = getFractionalKernel(1, 0.6, derivative=1)
    V = nonlocalBuilder(dm, kD).getDenseVector()
    H = nonlocalBuilder(dm, kD).getH2Vector()
    x = jnp.asarray(np.sin(np.linspace(-1, 1, dm.num_dofs)))
    yD = np.asarray(V.matvec(x))
    yH = np.asarray(H.matvec(x))
    assert yH.shape == yD.shape
    rel = np.linalg.norm(yH - yD) / np.linalg.norm(yD)
    assert rel < 1e-4, rel
