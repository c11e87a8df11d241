"""Complex Greens-function kernels (ref kernelsCy.pyx:1224-1322 ComplexKernel,
greens2Dcomplex/greens3Dcomplex :519-537) and the complex assembly path
(ref ComplexnonlocalBuilder, the {SCALAR} template for COMPLEX)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pynucleus_tpu.nl.kernels import (_bessel_j0y0, ComplexKernel,
                                      getComplexKernel, kernelFactory,
                                      GREENS_2D, GREENS_3D, ball2)
from pynucleus_tpu.fem import meshFactory, dofmapFactory


def test_bessel_j0y0():
    from scipy.special import j0, y0
    x = np.concatenate([np.linspace(1e-3, 3, 200),
                        np.linspace(3, 60, 300)])
    J, Y = _bessel_j0y0(jnp.asarray(x))
    # A&S 9.4.1-9.4.3: abs error < 5e-8 (J0 small), 1.5e-8 (Y0 small),
    # ~1e-7 on the modulus/phase branch
    assert np.abs(np.asarray(J) - j0(x)).max() < 2e-7
    assert np.abs(np.asarray(Y) - y0(x)).max() < 2e-7


def test_greens_kernel_values():
    from scipy.special import hankel1
    lam = 0.0 - 7.0j   # ref stores -Im(greensLambda) as the real wavenumber
    k2 = getComplexKernel(2, kernel=GREENS_2D, greensLambda=lam, scaling=0.25)
    x = np.array([0.1, 0.2])
    y = np.array([0.6, 0.9])
    r = np.linalg.norm(x - y)
    # host eval (scipy) against the reference formula C*i*H0^(1)(lam*r)
    np.testing.assert_allclose(k2(x, y), 0.25 * 1j * hankel1(0.0, 7.0 * r),
                               rtol=1e-12)
    # device eval against host eval
    dev = complex(np.asarray(k2.jaxEval(jnp.asarray(x), jnp.asarray(y))))
    np.testing.assert_allclose(dev, k2(x, y), rtol=1e-6)

    k3 = getComplexKernel(3, kernel=GREENS_3D, greensLambda=0.5 + 2.0j,
                          scaling=1.0)
    x3 = np.array([0.0, 0.0, 0.0])
    y3 = np.array([0.3, 0.4, 0.0])
    r3 = 0.5
    ref = np.exp(-(0.5 + 2.0j) * r3) / r3
    np.testing.assert_allclose(k3(x3, y3), ref, rtol=1e-12)
    dev3 = complex(np.asarray(k3.jaxEval(jnp.asarray(x3), jnp.asarray(y3))))
    np.testing.assert_allclose(dev3, ref, rtol=1e-12)
    assert k2.singularityValue == 0.0 and k3.singularityValue == -1.0
    assert k2.isComplex and k3.isComplex

    # factory route
    kf = kernelFactory('greens2D', dim=2, greensLambda=lam)
    assert isinstance(kf, ComplexKernel)


def _squareDofs(nRef=1):
    mesh = meshFactory('square', N=2, ax=0, ay=0, bx=1, by=1)
    for _ in range(nRef):
        mesh = mesh.refine()
    dm = dofmapFactory('P1', mesh)         # all dofs free
    return mesh, dm


def test_greens2d_dense_assembly():
    """Dense complex assembly: symmetry, hermitian-part definiteness of the
    double-difference form, and a distant entry against direct quadrature."""
    from pynucleus_tpu.nl.assembly import nonlocalBuilder
    mesh, dm = _squareDofs(nRef=2)
    lam = -3.0j
    kernel = getComplexKernel(2, kernel=GREENS_2D, greensLambda=lam,
                              scaling=1.0)   # infinite horizon
    builder = nonlocalBuilder(dm, kernel)
    A = np.asarray(builder.getDense().toarray())
    assert A.dtype == np.complex128
    # kernel is symmetric (gamma(x,y)=gamma(y,x)) -> complex symmetric matrix
    np.testing.assert_allclose(A, A.T, atol=1e-12)
    assert np.abs(A.imag).max() > 1e-3   # genuinely complex

    # distant-entry check: A[i,j] = -2*int int phi_i(x) phi_j(y) gamma dx dy
    # for dofs with disjoint supports (the difference form cross term)
    verts = np.asarray(mesh.vertices)
    interior = np.array([v for v in range(len(verts))
                         if _dofOfVertex(dm, v) >= 0])
    i = int(interior[np.argmin(
        np.abs(verts[interior] - [0.2, 0.2]).sum(axis=1))])
    j = int(interior[np.argmin(
        np.abs(verts[interior] - [0.8, 0.8]).sum(axis=1))])
    di, dj = _dofOfVertex(dm, i), _dofOfVertex(dm, j)
    ref = _directEntry(mesh, dm, kernel, i, j)
    # ~0.4%: the distant-panel order is tuned for monotone kernels; the
    # oscillatory Hankel converges with target_order like the reference
    np.testing.assert_allclose(A[di, dj], ref, rtol=1e-2)

    diag = np.asarray(builder.getDiagonal().diagonal)
    np.testing.assert_allclose(diag, np.diag(A), rtol=1e-10)


def _dofOfVertex(dm, v):
    cells = np.asarray(dm.mesh.cells)
    c, loc = np.argwhere(cells == v)[0]
    return int(np.asarray(dm.dofs)[c, loc])


def _directEntry(mesh, dm, kernel, vi, vj):
    """-2 * sum over supporting cell pairs of int phi_i gamma phi_j by
    high-order Gauss (supports are disjoint and distant -> smooth)."""
    from pynucleus_tpu.fem.quadrature import simplexDuffy
    cells = np.asarray(mesh.cells)
    verts = np.asarray(mesh.vertices)
    ci = np.nonzero((cells == vi).any(axis=1))[0]
    cj = np.nonzero((cells == vj).any(axis=1))[0]
    pts, w = simplexDuffy(10, 2)
    val = 0.0j
    for a in ci:
        va = verts[cells[a]]
        la = int(np.nonzero(cells[a] == vi)[0][0])
        xa = pts @ va
        vola = abs(np.linalg.det(va[1:] - va[0])) / 2
        pa = pts[:, la]
        for b in cj:
            vb = verts[cells[b]]
            lb = int(np.nonzero(cells[b] == vj)[0][0])
            xb = pts @ vb
            volb = abs(np.linalg.det(vb[1:] - vb[0])) / 2
            pb = pts[:, lb]
            g = np.array([[kernel(xa[p], xb[q]) for q in range(len(xb))]
                          for p in range(len(xa))])
            val += -2.0 * vola * volb * np.einsum('p,q,pq', w * pa, w * pb, g)
    return val


def test_greens2d_complex_solve():
    """End-to-end: assemble + complex GMRES solve."""
    from pynucleus_tpu.nl.assembly import nonlocalBuilder
    from pynucleus_tpu.base.solvers import solverFactory
    mesh, dm = _squareDofs(nRef=2)
    kernel = getComplexKernel(2, kernel=GREENS_2D, greensLambda=-3.0j,
                              horizon=0.45, scaling=1.0)
    A = nonlocalBuilder(dm, kernel).getDense()
    n = A.shape[0]
    b = jnp.asarray(np.random.RandomState(0).rand(n)
                    + 1j * np.random.RandomState(1).rand(n))
    s = solverFactory.build('gmres', A=A, setup=True)
    s.tolerance = 1e-9
    s.maxIter = 300
    x = s.solve(b)
    res = np.linalg.norm(np.asarray(A * x - b)) / np.linalg.norm(np.asarray(b))
    assert res < 1e-7


def test_greens3d_kernel_only():
    """3D assembly is NotImplemented in the reference as well
    (nonlocalAssembly_{SCALAR}.pxi getLocalMatrix raises for dim 3); the
    kernel object itself is the parity surface."""
    k = getComplexKernel(3, kernel=GREENS_3D, greensLambda=1.0 + 4.0j)
    x = np.random.RandomState(2).rand(5, 3)
    y = np.random.RandomState(3).rand(5, 3)
    dev = np.asarray(k.jaxEval(jnp.asarray(x), jnp.asarray(y)))
    host = np.array([k(x[i], y[i]) for i in range(5)])
    np.testing.assert_allclose(dev, host, rtol=1e-12)
    with pytest.raises(NotImplementedError):
        k.getBoundaryKernel()
