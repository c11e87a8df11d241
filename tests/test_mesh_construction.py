"""PSLG geometry + conforming Delaunay mesher
(ref fem/PyNucleus_fem/meshConstruction.py via scipy Delaunay + flood fill)."""
import numpy as np

from pynucleus_tpu.fem.mesh_construction import (circle, circularSegment,
                                                 line, polygon, rectangle)


def _area(m):
    V = m.vertices[m.cells]
    return float(np.abs(np.cross(V[:, 1] - V[:, 0],
                                 V[:, 2] - V[:, 0])).sum()) / 2.0


def _quality(m):
    """min angle quality: inradius/circumradius * 2 (equilateral -> 1)."""
    V = m.vertices[m.cells]
    a = np.linalg.norm(V[:, 1] - V[:, 2], axis=1)
    b = np.linalg.norm(V[:, 0] - V[:, 2], axis=1)
    c = np.linalg.norm(V[:, 0] - V[:, 1], axis=1)
    s = 0.5 * (a + b + c)
    area = np.sqrt(np.maximum(s * (s - a) * (s - b) * (s - c), 0.0))
    inr = area / s
    circ = a * b * c / np.maximum(4 * area, 1e-300)
    return float((2 * inr / circ).min())


def test_circle_mesh_area_and_h():
    c = circle((0.0, 0.0), 1.0, num_points_per_unit_len=20)
    m = c.mesh(h=0.15)
    assert m.h <= 0.15 * (1 + 1e-12) or m.h <= 0.2
    # area of the inscribed polygonal disc
    assert abs(_area(m) - np.pi) < 0.05
    assert _quality(m) > 0.2


def test_circle_refine_snaps_to_arc():
    c = circle((0.0, 0.0), 1.0, num_points_per_unit_len=12)
    m = c.mesh(h=0.3)
    r0 = np.linalg.norm(m.vertices, axis=1)
    nB0 = int((np.abs(r0 - 1.0) < 1e-9).sum())
    m2 = m.refine()
    r = np.linalg.norm(m2.vertices, axis=1)
    onB = np.abs(r - 1.0) < 1e-9
    # boundary midpoints moved onto the arc: boundary vertex count grew
    assert int(onB.sum()) >= 2 * nB0 - 1
    assert abs(_area(m2) - np.pi) < abs(_area(m) - np.pi)


def test_rectangle_with_hole():
    outer = rectangle((-2.0, -2.0), (2.0, 2.0),
                      num_points_per_unit_len=4)
    holeC = circle((0.0, 0.0), 0.5, num_points_per_unit_len=20)
    dom = outer + holeC
    dom.holes.append((0.0, 0.0))
    m = dom.mesh(h=0.2)
    assert abs(_area(m) - (16.0 - np.pi * 0.25)) < 0.1
    # no vertex strictly inside the hole
    r = np.linalg.norm(m.vertices, axis=1)
    assert (r > 0.5 - 1e-9).all()


def test_interface_line_is_conforming():
    """An internal constrained line must appear as mesh edges (interfaces)."""
    dom = rectangle((0.0, 0.0), (2.0, 1.0), num_points_per_unit_len=6) + \
        line((1.0, 0.0), (1.0, 1.0), num_points_per_unit_len=6)
    m = dom.mesh(h=0.15)
    assert abs(_area(m) - 2.0) < 1e-9
    # every cell lies entirely on one side of x=1
    V = m.vertices[m.cells]
    minx, maxx = V[:, :, 0].min(axis=1), V[:, :, 0].max(axis=1)
    assert ((maxx <= 1.0 + 1e-9) | (minx >= 1.0 - 1e-9)).all()


def test_composition_translate_rotate():
    seg = line((0.0, 0.0), (1.0, 0.0), num_points=5)
    moved = seg + (0.5, 0.25)
    assert abs(moved.points[0][0] - 0.5) < 1e-12
    rot = seg * ((0.0, 0.0), np.pi / 2)
    assert abs(rot.points[-1][0]) < 1e-12 and \
        abs(rot.points[-1][1] - 1.0) < 1e-12
    # merging dedups the shared endpoint
    two = seg + line((1.0, 0.0), (1.0, 1.0), num_points=5)
    assert two.num_points == 9


def test_polygon_L_shape():
    L = polygon([(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)],
                num_points_per_unit_len=5)
    m = L.mesh(h=0.2)
    assert abs(_area(m) - 3.0) < 1e-9
    assert _quality(m) > 0.2


def test_circular_segment_quarter():
    q = (circularSegment((0.0, 0.0), 1.0, 0.0, np.pi / 2,
                         num_points_per_unit_len=16) +
         line((0.0, 1.0), (0.0, 0.0), num_points_per_unit_len=8) +
         line((0.0, 0.0), (1.0, 0.0), num_points_per_unit_len=8))
    m = q.mesh(h=0.12)
    assert abs(_area(m) - np.pi / 4) < 0.02
