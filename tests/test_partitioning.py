"""Partitioners and boundary layers (ref meshPartitioning.pyx, metisCy,
boundaryLayerCy.pyx)."""
import numpy as np
import pytest

from pynucleus_tpu.fem import meshFactory, dofmapFactory
from pynucleus_tpu.fem.partitioning import (
    regularVertexPartitioner, regularMeshPartitioner, regularDofPartitioner,
    metisDofPartitioner, boundaryLayers)


@pytest.fixture(scope='module')
def squareMesh():
    mesh = meshFactory('square', N=2, ax=0, ay=0, bx=1, by=1)
    for _ in range(4):
        mesh = mesh.refine()
    return mesh


@pytest.mark.parametrize('nParts', [2, 4, 6])
def test_mesh_partition_balance(squareMesh, nParts):
    part = regularMeshPartitioner(squareMesh, nParts)
    counts = np.bincount(part, minlength=nParts)
    assert counts.sum() == squareMesh.num_cells
    assert counts.min() > 0.6 * squareMesh.num_cells / nParts
    assert counts.max() < 1.5 * squareMesh.num_cells / nParts


def test_vertex_and_dof_partition(squareMesh):
    vp = regularVertexPartitioner(squareMesh, 4)
    assert len(vp) == squareMesh.num_vertices
    dm = dofmapFactory('P1', squareMesh)
    dp = regularDofPartitioner(dm, 4)
    counts = np.bincount(dp, minlength=4)
    assert counts.min() > 0.5 * dm.num_dofs / 4
    # spatial coherence: dofs of one part form few connected clusters --
    # proxy: average intra-part coordinate spread is well below the domain
    coords = dm.getDoFCoordinates()
    for p in range(4):
        sel = dp == p
        spread = coords[sel].max(axis=0) - coords[sel].min(axis=0)
        assert spread.prod() < 0.5   # quarter-ish of the unit square


def test_metis_like_partition(squareMesh):
    dm = dofmapFactory('P1', squareMesh)
    part = metisDofPartitioner(dm, 4)
    counts = np.bincount(part, minlength=4)
    assert counts.min() > 0.5 * dm.num_dofs / 4
    # edge cut should not exceed the pure-bisection cut by much
    import scipy.sparse as sp
    N = dm.num_dofs
    d = dm.dofs
    mask = d >= 0
    cc, ll = np.nonzero(mask)
    X = sp.coo_matrix((np.ones(mask.sum()), (d[cc, ll], cc)),
                      shape=(N, squareMesh.num_cells)).tocsr()
    Adj = (X @ X.T).tocoo()
    cut = np.sum(part[Adj.row] != part[Adj.col])
    base = regularDofPartitioner(dm, 4)
    cut0 = np.sum(base[Adj.row] != base[Adj.col])
    assert cut <= cut0 * 1.2


def test_boundary_layers(squareMesh):
    part = regularMeshPartitioner(squareMesh, 2)
    layers = boundaryLayers(squareMesh, part, numLayers=2, part=0)
    assert len(layers) == 2
    assert len(layers[0]) > 0
    # layer cells belong to part 0 and are disjoint between layers
    assert np.all(part[layers[0]] == 0)
    assert np.all(part[layers[1]] == 0)
    assert len(np.intersect1d(layers[0], layers[1])) == 0
    # the first layer touches the other part
    import scipy.sparse as sp
    C = squareMesh.num_cells
    nv = squareMesh.cells.shape[1]
    X = sp.coo_matrix((np.ones(C * nv),
                       (np.repeat(np.arange(C), nv),
                        squareMesh.cells.ravel())),
                      shape=(C, squareMesh.num_vertices)).tocsr()
    Adj = (X @ X.T).tocsr()
    for c in layers[0][:10]:
        row = Adj.indices[Adj.indptr[c]:Adj.indptr[c + 1]]
        assert np.any(part[row] == 1)
