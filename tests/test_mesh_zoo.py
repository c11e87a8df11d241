"""Extended mesh catalogue (ref fem mesh.py:192-1540)."""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from pynucleus_tpu.fem import meshFactory
from pynucleus_tpu.fem.mesh_zoo import (graded_interval,
                                        double_graded_interval, ballNd,
                                        gradeUniformBall)


def test_lshape():
    m = meshFactory('Lshape')
    assert_allclose(m.volume, 3.0)
    m2 = m.refine()
    assert_allclose(m2.volume, 3.0)
    assert m2.num_cells == 4 * m.num_cells


def test_fichera():
    m = meshFactory('fichera')
    assert_allclose(m.volume, 7.0, rtol=1e-12)
    m2 = m.refine()
    assert_allclose(m2.volume, 7.0, rtol=1e-12)


def test_cross_square():
    m = meshFactory('crossSquare')
    assert_allclose(m.volume, 1.0)
    assert m.num_cells == 16   # 2x2 grid cells x 4 triangles


def test_disconnected_interval():
    m = meshFactory('disconnectedInterval', sep=0.2)
    assert_allclose(m.volume, 0.8)


def test_standard_simplices():
    assert_allclose(meshFactory('standardSimplex2D').volume, 0.5)
    assert_allclose(meshFactory('standardSimplex3D').volume, 1.0 / 6.0)


def test_box_and_ball():
    m = meshFactory('box', Nx=3, Ny=3, Nz=3)
    assert_allclose(m.volume, 1.0, rtol=1e-12)
    b = ballNd(3, 1.0, 0.45)
    # refined octahedron ball converges to 4 pi / 3 from below
    assert 0.8 * 4 * np.pi / 3 < b.volume < 4 * np.pi / 3
    b2 = ballNd(2, 1.0, 0.2)
    assert 0.95 * np.pi < b2.volume < np.pi


def test_graded_interval():
    m = graded_interval(0.1, mu=2., a=-1., b=1.)
    x = np.sort(m.vertices[:, 0])
    assert_allclose(x[0], -1.0)
    assert_allclose(x[-1], 1.0)
    # grading: spacing near the ends much smaller than in the middle
    dx = np.diff(x)
    assert dx[0] < 0.3 * dx.max()
    # refinement keeps the grading (new boundary-adjacent cells shrink)
    m2 = m.refine()
    x2 = np.sort(m2.vertices[:, 0])
    dx2 = np.diff(x2)
    assert dx2[0] < 0.6 * dx[0]
    assert_allclose(m2.volume, 2.0, rtol=1e-12)


def test_double_graded_interval():
    m = double_graded_interval(0.1, mu_ll=2., mu_rr=2.)
    x = np.sort(m.vertices[:, 0])
    assert np.any(np.abs(x) < 1e-14)   # node at the interface
    assert_allclose(m.volume, 2.0, rtol=1e-12)


def test_graded_circle():
    m = meshFactory('graded_circle', M=4, mu=2.)
    r = np.linalg.norm(m.vertices, axis=1)
    assert r.max() <= 1.0 + 1e-12
    assert m.volume < np.pi


def test_sphere_meshes():
    s1 = meshFactory('sphere1d', numCells=16)
    assert s1.manifold_dim == 1 and s1.dim == 2
    assert_allclose(s1.volume, 2 * 16 * np.sin(np.pi / 16), rtol=1e-12)
    s2 = meshFactory('sphere2d', h=0.5)
    assert s2.manifold_dim == 2 and s2.dim == 3
    assert 0.8 * 4 * np.pi < s2.volume < 4 * np.pi


def test_cutout_and_twin():
    m = meshFactory('cutoutCircle', n=64, cutoutAngle=np.pi / 2)
    # 3/4 disc
    assert_allclose(m.volume, 0.75 * np.pi, rtol=2e-3)
    t = meshFactory('twinDisc', n=32, sep=0.2)
    assert_allclose(t.volume, 2 * 32 / 2 * np.sin(2 * np.pi / 32), rtol=1e-6)


def test_square_with_cutout():
    m = meshFactory('squareWithCircularCutout')
    # [-3,3]^2 minus ring approximation of unit disc
    assert 36 - np.pi - 0.2 < m.volume < 36 - 0.9 * np.pi
    r = np.linalg.norm(m.vertices, axis=1)
    assert r.min() > 0.99


def test_graded_square_box():
    g = meshFactory('gradedSquare', factor=2.0)
    assert_allclose(g.volume, 1.0, rtol=1e-12)
    gb = meshFactory('gradedBox', factor=0.5)
    assert_allclose(gb.volume, 1.0, rtol=1e-12)
    # factor > 1 concentrates vertices near the origin
    assert np.median(np.linalg.norm(g.refine().refine().vertices, axis=1)) \
        < 0.6


def test_grade_uniform_ball():
    b = ballNd(2, 2.0, 0.3)
    gradeUniformBall(b, muInterior=2., rInterior=1.)
    r = np.linalg.norm(b.vertices, axis=1)
    # vertices concentrate near r = 1
    frac = np.mean(np.abs(r - 1.0) < 0.25)
    assert frac > 0.3
