"""Overlapping dof decomposition + algebraic accumulate/distribute
(ref meshOverlaps.pyx:266-1205, algebraicOverlaps.pyx:516-1050)."""
import numpy as np
import pytest

from pynucleus_tpu.fem import (uniformSquare, P1_DoFMap,
                               assembleRHS, constant)
from pynucleus_tpu.fem.partitioning import regularMeshPartitioner
from pynucleus_tpu.parallel.overlaps import (
    buildCellOverlap, OverlappingDofPartition, AlgebraicOverlapManager)


@pytest.fixture(scope='module')
def setup():
    m = uniformSquare(N=10)
    m = m.refine()
    dm = P1_DoFMap(m, tag=None)
    cellPart = regularMeshPartitioner(m, 4)
    localCells = buildCellOverlap(m, cellPart, depth=1)
    numOwn = [int((cellPart == p).sum()) for p in range(4)]
    part = OverlappingDofPartition(dm, localCells, numOwnCells=numOwn)
    mgr = AlgebraicOverlapManager(part)
    return m, dm, cellPart, part, mgr


def test_partition_covers(setup):
    m, dm, cellPart, part, mgr = setup
    assert (part.multiplicity >= 1).all()
    assert (part.ownerOf >= 0).all()
    # interface dofs are genuinely shared
    assert (part.multiplicity > 1).any()


def test_from_to_global_roundtrip(setup):
    m, dm, cellPart, part, mgr = setup
    rng = np.random.default_rng(0)
    x = rng.standard_normal(dm.num_dofs)
    X = part.fromGlobal(x)
    assert np.allclose(part.toGlobal(X), x)


def test_accumulate_matches_global_sum(setup):
    """Each part contributes its own-cell element-assembly share; accumulate
    must reproduce the single-domain global assembly in every copy
    (the reference's assembly-then-accumulate pipeline)."""
    m, dm, cellPart, part, mgr = setup
    b = np.asarray(assembleRHS(dm, constant(1.0)).data)
    # per-part rhs from OWN cells only (sum over parts = global)
    c2d = np.asarray(dm.dofs)
    contrib = np.zeros((part.nParts, part.maxLocal))
    vols = np.asarray(m.volumes)
    for p in range(part.nParts):
        own = np.nonzero(np.asarray(cellPart) == p)[0]
        locB = np.zeros(dm.num_dofs)
        for c in own:
            for d in c2d[c]:
                if d >= 0:
                    locB[d] += vols[c] / c2d.shape[1]
        l = part.l2g[p, :part.counts[p]]
        contrib[p, :len(l)] = locB[l]
    acc = mgr.accumulate(contrib)
    # every copy holds the global value
    for p in range(part.nParts):
        l = part.l2g[p, :part.counts[p]]
        assert np.allclose(acc[p, :len(l)], b[l], atol=1e-14)


def test_distribute_is_right_inverse_of_accumulate(setup):
    """accumulate(distribute(x_consistent)) == x_consistent  (partition of
    unity; ref prepareDistribute + distribute semantics)."""
    m, dm, cellPart, part, mgr = setup
    rng = np.random.default_rng(1)
    x = rng.standard_normal(dm.num_dofs)
    X = part.fromGlobal(x)          # consistent: all copies agree
    assert np.allclose(mgr.accumulate(mgr.distribute(X)), X)


def test_unique_keeps_owner_copy(setup):
    m, dm, cellPart, part, mgr = setup
    rng = np.random.default_rng(2)
    x = rng.standard_normal(dm.num_dofs)
    X = part.fromGlobal(x)
    U = mgr.unique(X)
    # summing unique copies over parts gives each global value exactly once
    tot = np.zeros(dm.num_dofs)
    valid = part.l2g >= 0
    np.add.at(tot, part.l2g[valid], U[valid])
    assert np.allclose(tot, x)


def test_device_accumulate_matches_host(setup):
    import jax
    from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
    import jax.numpy as jnp
    m, dm, cellPart, part, mgr = setup
    devs = np.array(jax.devices()[:part.nParts])
    if len(devs) < part.nParts:
        pytest.skip('needs >= nParts devices')
    mesh = Mesh(devs, ('d',))
    rng = np.random.default_rng(3)
    X = rng.standard_normal((part.nParts, part.maxLocal))
    run = mgr.shardmapAccumulate(mesh)
    Xd = jax.device_put(jnp.asarray(X), NamedSharding(mesh, P('d')))
    out = np.asarray(run(Xd))
    assert np.allclose(out, mgr.accumulate(X), atol=1e-12)


def test_repartitioner_roundtrip(setup):
    """ref repartitioner.pyx:34 + connectors.py:151: vector moved between
    two different decompositions of the same level is preserved."""
    from pynucleus_tpu.parallel.overlaps import repartitionConnector
    m, dm, cellPart, part, mgr = setup
    # a different target partition: vertical stripes by cell barycenter x
    bc = np.asarray(m.vertices)[np.asarray(m.cells)].mean(axis=1)
    tgtCellPart = np.minimum((bc[:, 0] * 4).astype(np.int64), 3)
    srcPart, tgtPart, rep = repartitionConnector(
        dm, m, np.asarray(cellPart), tgtCellPart)
    rng = np.random.default_rng(4)
    x = rng.standard_normal(dm.num_dofs)
    Xs = srcPart.fromGlobal(x)
    Xt = rep.apply(Xs)
    assert np.allclose(tgtPart.toGlobal(Xt), x)
    # every copy (incl. ghosts) holds the consistent global value
    valid = tgtPart.l2g >= 0
    assert np.allclose(Xt[valid], x[tgtPart.l2g[valid]])


def test_repartitioner_device_matches_host(setup):
    import jax
    from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
    import jax.numpy as jnp
    from pynucleus_tpu.parallel.overlaps import repartitionConnector
    m, dm, cellPart, part, mgr = setup
    bc = np.asarray(m.vertices)[np.asarray(m.cells)].mean(axis=1)
    tgtCellPart = np.minimum((bc[:, 1] * 4).astype(np.int64), 3)
    srcPart, tgtPart, rep = repartitionConnector(
        dm, m, np.asarray(cellPart), tgtCellPart)
    devs = np.array(jax.devices()[:4])
    if len(devs) < 4:
        pytest.skip('needs 4 devices')
    mesh = Mesh(devs, ('d',))
    rng = np.random.default_rng(5)
    x = rng.standard_normal(dm.num_dofs)
    Xs = srcPart.fromGlobal(x)
    run = rep.deviceApply(mesh)
    Xd = jax.device_put(jnp.asarray(Xs), NamedSharding(mesh, P('d')))
    assert np.allclose(np.asarray(run(Xd)), rep.apply(Xs), atol=1e-13)
