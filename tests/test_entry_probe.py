"""Entry probes: A.getEntry(I, J) matches the dense assembly entrywise for
touching and distant dof pairs (ref nonlocalAssembly pxi:1475,1539)."""
import numpy as np
import pytest

from pynucleus_tpu.fem import circle, simpleInterval, P1_DoFMap
from pynucleus_tpu.nl import getFractionalKernel
from pynucleus_tpu.nl.assembly import nonlocalBuilder


@pytest.mark.parametrize('dim,noRef', [(1, 4), (2, 2)], ids=['1d', '2d'])
def test_getEntry_matches_dense(dim, noRef):
    m = simpleInterval(-1, 1) if dim == 1 else circle(n=8)
    for _ in range(noRef):
        m = m.refine()
    dm = P1_DoFMap(m)
    k = getFractionalKernel(dim, 0.75)
    b = nonlocalBuilder(dm, k)
    D = np.asarray(b.getDense().toarray())
    N = dm.num_dofs
    rng = np.random.default_rng(42)
    # diagonal, neighboring (touching supports), and distant pairs
    probes = [(0, 0), (N // 2, N // 2)]
    probes += [(i, min(i + 1, N - 1)) for i in (0, N // 2)]
    probes += [(int(rng.integers(N)), int(rng.integers(N)))
               for _ in range(4)]
    # tolerance matches the H2-vs-dense operator tests: the cluster path
    # integrates the exterior via the exact union-surface form while the
    # dense path uses global-boundary + distant quadrature, so entries
    # agree to quadrature accuracy, not roundoff
    for (I, J) in probes:
        e = b.getEntry(I, J)
        ref = D[I, J]
        scale = max(abs(D).max(), 1e-30)
        assert abs(e - ref) <= 2e-4 * scale, (I, J, e, ref)
        e2 = b.getEntryCluster(J, I)
        assert abs(e2 - D[J, I]) <= 2e-4 * scale, (J, I, e2)
