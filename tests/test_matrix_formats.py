"""Matrix formats: diagonal, sparsified, H2corrected
(ref DoFMaps.pyx:885-902 assembleNonlocal dispatch, getDiagonal pxi:2269,
horizonCorrected nonlocalAssembly.pyx:182-260)."""
import numpy as np
import pytest

from pynucleus_tpu.fem import meshFactory, dofmapFactory
from pynucleus_tpu.fem.dofmaps import P1_DoFMap
from pynucleus_tpu.nl.kernels import getFractionalKernel
from pynucleus_tpu.nl.problems import (nonlocalMeshFactory,
                                       HOMOGENEOUS_DIRICHLET)
from pynucleus_tpu.nl.assembly import assembleNonlocal, nonlocalBuilder


def _interiorSetup(horizon=0.4, s=0.25, noRef=3):
    k = getFractionalKernel(1, s, horizon=horizon)
    mesh, nI = nonlocalMeshFactory.build(
        'interval', kernel=k, boundaryCondition=HOMOGENEOUS_DIRICHLET,
        a=-1, b=1)
    for _ in range(noRef):
        mesh = mesh.refine()
    return P1_DoFMap(mesh, tag=nI['domain']), k


def test_diagonal_format():
    mesh = meshFactory('interval', a=-1, b=1)
    for _ in range(4):
        mesh = mesh.refine()
    dm = dofmapFactory('P1', mesh)
    k = getFractionalKernel(1, 0.6)
    d = assembleNonlocal(dm, k, matrixFormat='diagonal')
    Ad = assembleNonlocal(dm, k, matrixFormat='dense')
    np.testing.assert_allclose(np.asarray(d.data),
                               np.diag(np.asarray(Ad.toarray())),
                               rtol=1e-12)


def test_sparsified_format():
    dm, k = _interiorSetup()
    A = assembleNonlocal(dm, k, matrixFormat='sparsified')
    Ad = assembleNonlocal(dm, k, matrixFormat='dense')
    assert A.isSparse()
    x = np.random.RandomState(0).rand(dm.num_dofs)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(Ad @ x),
                               rtol=1e-12)


def test_h2corrected():
    """A_delta = A_inf - Cross - c_tot*Mass matches the exact sparse
    finite-horizon operator on the interior dofmap."""
    dm, k = _interiorSetup()
    Asp = np.asarray(nonlocalBuilder(dm, k).getSparse().toarray())
    Ac = assembleNonlocal(dm, k, matrixFormat='H2corrected')
    D = np.abs(np.asarray(Ac.toarray()) - Asp)
    assert D.max() < 5e-3 * np.abs(Asp).max(), D.max()
    x = np.cos(np.arange(dm.num_dofs) * 0.3)
    rel = np.linalg.norm(np.asarray(Ac @ x) - Asp @ x) \
        / np.linalg.norm(Asp @ x)
    assert rel < 5e-3, rel
    # setKernel with a different horizon reuses S_inf
    k2 = getFractionalKernel(1, 0.25, horizon=0.3)
    Ac.setKernel(k2)
    Asp2 = np.asarray(nonlocalBuilder(dm, k2).getSparse().toarray())
    rel2 = np.linalg.norm(np.asarray(Ac @ x) - Asp2 @ x) \
        / np.linalg.norm(Asp2 @ x)
    assert rel2 < 1e-2, rel2
