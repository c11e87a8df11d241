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
