"""HDF5 serialization and VTK export (ref utilsFem.py:246-370,
mesh.py:1826-1959)."""
import numpy as np

from pynucleus_tpu.base.io import (saveDictToHDF5, loadDictFromHDF5,
                                   vertexValues)
from pynucleus_tpu.fem import meshFactory, dofmapFactory
from pynucleus_tpu.fem.dofmaps import DoFMap


def test_dict_roundtrip(tmp_path):
    import h5py
    d = {'a': 1, 'b': 2.5, 'c': 'hello', 'flag': True, 'none': None,
         'arr': np.arange(6, dtype=np.float64).reshape(2, 3),
         'nested': {'x': np.ones(3), 'y': -2},
         'lst': [1.0, 2.0, 3.0], 'tup': (4, 5)}
    with h5py.File(tmp_path / 't.h5', 'w') as f:
        saveDictToHDF5(d, f.create_group('g'))
    with h5py.File(tmp_path / 't.h5', 'r') as f:
        out = loadDictFromHDF5(f['g'])
    assert out['a'] == 1 and abs(out['b'] - 2.5) < 1e-15
    assert out['c'] == 'hello' and out['flag'] is not False
    assert out['none'] is None
    assert np.allclose(out['arr'], d['arr'])
    assert np.allclose(out['nested']['x'], 1.0) and out['nested']['y'] == -2
    assert out['lst'] == [1.0, 2.0, 3.0]
    assert out['tup'] == (4, 5)


def test_mesh_dofmap_roundtrip(tmp_path):
    import h5py
    mesh = meshFactory('square', ax=-1, ay=-1, bx=1, by=1)
    for _ in range(2):
        mesh = mesh.refine()
    dm = dofmapFactory('P2', mesh)
    with h5py.File(tmp_path / 'm.h5', 'w') as f:
        dm.HDF5write(f.create_group('dm'))
    with h5py.File(tmp_path / 'm.h5', 'r') as f:
        dm2 = DoFMap.HDF5read(f['dm'])
    assert dm2.num_dofs == dm.num_dofs
    assert dm2.num_boundary_dofs == dm.num_boundary_dofs
    assert np.array_equal(dm2.dofs, dm.dofs)
    assert np.allclose(dm2.mesh.vertices, mesh.vertices)
    assert np.array_equal(dm2.mesh.cells, mesh.cells)


def test_vtk_export(tmp_path):
    mesh = meshFactory('square', ax=0, ay=0, bx=1, by=1)
    mesh = mesh.refine()
    dm = dofmapFactory('P1', mesh)
    x = np.arange(dm.num_dofs, dtype=np.float64)
    fn = tmp_path / 'out.vtk'
    mesh.exportVTK(str(fn), pointData={'u': vertexValues(dm, x)})
    txt = fn.read_text()
    assert 'UNSTRUCTURED_GRID' in txt
    assert 'POINTS {} double'.format(mesh.num_vertices) in txt
    assert 'CELL_TYPES' in txt and 'SCALARS u double 1' in txt


def test_vertex_values_p1_identity():
    mesh = meshFactory('interval', a=0, b=1)
    for _ in range(3):
        mesh = mesh.refine()
    dm = dofmapFactory('P1', mesh)
    # interpolate f(x)=x; vertexValues must reproduce vertex coordinates at
    # interior vertices (boundary dofs are zeroed)
    coords = dm.getDoFCoordinates()
    x = coords[:, 0].copy()
    vv = vertexValues(dm, x)
    for vNo in range(mesh.num_vertices):
        vx = mesh.vertices[vNo, 0]
        if 0.0 < vx < 1.0:
            assert abs(vv[vNo] - vx) < 1e-14


def test_h2_hdf5_roundtrip(tmp_path):
    """H2 operator checkpointing (ref clusterMethodCy.pyx H2Matrix
    HDF5write/read :2449-2551, tree serializers :1492-1778)."""
    import h5py
    import jax.numpy as jnp
    from pynucleus_tpu.fem import simpleInterval, P1_DoFMap
    from pynucleus_tpu.nl import getFractionalKernel
    from pynucleus_tpu.nl.assembly import nonlocalBuilder
    from pynucleus_tpu.nl.h2 import H2Matrix
    m = simpleInterval(-1.0, 1.0)
    for _ in range(6):
        m = m.refine()
    dm = P1_DoFMap(m)
    H = nonlocalBuilder(dm, getFractionalKernel(1, 0.6)).getH2()
    fn = tmp_path / 'h2.h5'
    with h5py.File(fn, 'w') as hf:
        H.HDF5write(hf.create_group('A'))
    with h5py.File(fn, 'r') as hf:
        H2 = H2Matrix.HDF5read(hf['A'])
    x = jnp.asarray(np.sin(np.linspace(-1, 1, dm.num_dofs)))
    assert float(jnp.linalg.norm(H.matvec(x) - H2.matvec(x))) < 1e-13
