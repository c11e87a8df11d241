"""MANIFOLD_FRACTIONAL kernel (ref kernelsCy.pyx:50-73,1594): fractional
kernel of a (dim-1)-manifold embedded in R^dim using chordal distance.  The
reference declares the type but all its eval branches raise; here it
assembles on surface meshes."""
import numpy as np
import jax.numpy as jnp

from pynucleus_tpu.fem import circle, P1_DoFMap
from pynucleus_tpu.nl import getFractionalKernel
from pynucleus_tpu.nl.kernels import MANIFOLD_FRACTIONAL
from pynucleus_tpu.nl.assembly import nonlocalBuilder


def test_manifold_fractional_circle():
    m = circle(n=8)
    for _ in range(3):
        m = m.refine()
    surf = m.get_surface_mesh()
    assert surf.manifold_dim == 1 and surf.dim == 2
    k = getFractionalKernel(2, 0.5, manifold=True)
    assert k.kernelType == MANIFOLD_FRACTIONAL
    # effective dimension is the manifold dim: singularity = -(1) - 2s
    assert np.isclose(k.singularityValue, -2.0)
    A = nonlocalBuilder(dm := P1_DoFMap(surf, tag=None), k,
                        zeroExterior=False).getDense()
    Ad = np.asarray(A.toarray())
    assert np.abs(Ad - Ad.T).max() < 1e-12
    assert (np.diag(Ad) > 0).all()
    # constants lie in the null space of the closed-manifold operator
    one = jnp.ones(dm.num_dofs)
    assert float(jnp.linalg.norm(A @ one)) < 1e-12 * np.abs(Ad).max()
