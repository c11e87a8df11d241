"""Partition-first distributed H2 assembly (DistributedH2Matrix.assemble)
must match the wrap-a-global-H2 path exactly (ref nonlocalAssembly pxi:2162
reduceNearOp / :2232 drop off-rank / :2401 partitionDoFs).

Runs on the 8-virtual-device CPU mesh (conftest)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pynucleus_tpu.fem import simpleInterval, circle, P1_DoFMap
from pynucleus_tpu.nl import getFractionalKernel
from pynucleus_tpu.nl.assembly import nonlocalBuilder
from pynucleus_tpu.parallel import makeDeviceMesh
from pynucleus_tpu.parallel.dist_h2 import DistributedH2Matrix


@pytest.mark.parametrize('dim,noRef,s', [(1, 9, 0.75), (2, 4, 0.25)],
                         ids=['1d', '2d'])
def test_assemble_matches_wrap(dim, noRef, s):
    m = simpleInterval(-1.0, 1.0) if dim == 1 else circle(n=8)
    for _ in range(noRef):
        m = m.refine()
    dm = P1_DoFMap(m)
    kernel = getFractionalKernel(dim, s)
    mesh = makeDeviceMesh(min(4, len(jax.devices())))

    H = nonlocalBuilder(dm, kernel).getH2()
    Awrap = DistributedH2Matrix(H, mesh)
    Adir = DistributedH2Matrix.assemble(dm, kernel, mesh)

    x = jnp.asarray(np.random.RandomState(0).rand(dm.num_dofs))
    yw = np.asarray(Awrap.matvec(x))
    yd = np.asarray(Adir.matvec(x))
    ys = np.asarray(H.matvec(x))
    scale = np.linalg.norm(ys)
    # direct assembly vs wrap: same quadrature pipeline, same shards; the
    # residual difference is summation order (cross-device pairs evaluate
    # in different chunk groupings)
    assert np.linalg.norm(yd - yw) / scale < 1e-10
    # and both match the single-device operator
    assert np.linalg.norm(yd - ys) / scale < 1e-10
    dw = np.asarray(Awrap.diagonal)
    dd = np.asarray(Adir.diagonal)
    assert np.abs(dw - dd).max() / np.abs(dw).max() < 1e-9
