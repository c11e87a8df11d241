"""Performance logger, memory profile, plot utils, distributed maps
(ref base performanceLogger.pyx, memProfile.py, plot_utils.py, io.pyx)."""
import numpy as np
import jax.numpy as jnp

from pynucleus_tpu.base.performanceLogger import (PLogger, FakePLogger,
                                                  LoggingPLogger, Timer)
from pynucleus_tpu.base.memProfile import memoryUsage, memorySnapshot
from pynucleus_tpu.parallel.maps import Map, Import, DistVector, DistMatrix


def test_plogger():
    pl = PLogger()
    with Timer('phase1', pl):
        sum(range(1000))
    with Timer('phase1', pl):
        sum(range(1000))
    pl.addValue('numEntries', 42)
    rep = pl.report()
    assert 'phase1' in rep and 'numEntries' in rep
    assert len(pl.values['phase1']) == 2
    fake = FakePLogger()
    with fake.Timer('x') as t:
        pass
    assert t.elapsed >= 0.0
    assert fake.report() == ''


def test_mem_profile():
    rss = memoryUsage()
    assert rss > 10.0   # this process surely uses >10MB
    msg = memorySnapshot('test')
    assert 'host RSS' in msg


def test_plot_manager(tmp_path):
    from pynucleus_tpu.base.plot_utils import plotManager
    from pynucleus_tpu.fem import meshFactory, dofmapFactory, Lambda
    mesh = meshFactory('interval', a=0, b=1)
    for _ in range(3):
        mesh = mesh.refine()
    dm = dofmapFactory('P1', mesh)
    pm = plotManager(mesh, dm)
    pm.add(dm.interpolate(Lambda(lambda x: x[0])), label='u')
    pm.plot(filename=str(tmp_path / 'p.png'))
    assert (tmp_path / 'p.png').exists()


def test_maps_roundtrip():
    m = Map.blockDistribution(17, 4)
    assert m.counts.sum() == 17
    x = np.random.RandomState(0).rand(17)
    dv = DistVector.fromGlobal(m, x)
    np.testing.assert_allclose(dv.toGlobal(), x)
    # import to a shuffled ownership
    rng = np.random.RandomState(1)
    perm = rng.permutation(17)
    m2 = Map([perm[:5], perm[5:9], perm[9:14], perm[14:]], 17)
    imp = Import(m, m2)
    dv2 = imp(dv)
    np.testing.assert_allclose(dv2.toGlobal(), x)


def test_dist_matrix():
    n = 12
    A = np.random.RandomState(2).rand(n, n)
    m = Map.blockDistribution(n, 3)
    DM = DistMatrix(jnp.asarray(A), m)
    x = np.random.RandomState(3).rand(n)
    y = DM.matvec(x)
    np.testing.assert_allclose(y.toGlobal(), A @ x, rtol=1e-12)


def test_simplex_mapper():
    from pynucleus_tpu.fem import meshFactory
    from pynucleus_tpu.fem.simplex_mapper import simplexMapper
    mesh = meshFactory('square', N=2, ax=0, ay=0, bx=1, by=1)
    sm = simplexMapper(mesh)
    assert sm.getNumEdgesPerCell() == 3
    edges = sm.getEdgesOfCell(0)
    assert edges.shape == (3, 2)
    # find each edge back
    for k in range(3):
        assert sm.findEdgeInCell(0, edges[k][::-1]) == k
    v = mesh.cells[0, 1]
    assert sm.findVertexInCell(0, v) == 1
    m3 = meshFactory('cube')
    sm3 = simplexMapper(m3)
    assert sm3.getNumEdgesPerCell() == 6 and sm3.getNumFacesPerCell() == 4
    faces = sm3.getFacesOfCell(0)
    assert sm3.findFaceInCell(0, faces[2][[2, 0, 1]]) == 2


def test_convergence_criteria():
    from pynucleus_tpu.base.convergence import (convergenceCriterion,
                                                noOpConvergenceCriterion)
    c = convergenceCriterion(1e-6, maxiter=10).begin(1.0)
    for r in (0.1, 0.01):
        c.update(r)
    assert not c.converged()
    c.update(1e-7)
    assert c.converged() and c.getIterationCount() == 3
    assert abs(c.rate() - 1e-7 ** (1 / 3)) < 1e-9
    n = noOpConvergenceCriterion(maxiter=2).begin(1.0)
    n.update(0.0)
    assert not n.converged()
    n.update(0.0)
    assert n.converged()
