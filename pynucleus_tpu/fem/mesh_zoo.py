"""Mesh zoo: the reference's catalogue of domains beyond the core
interval/square/circle constructors.

Counterpart of /root/reference/fem/PyNucleus_fem/mesh.py:192-1540
(crossSquare, gradedSquare/Box, disconnectedInterval, simpleLshape,
simpleFicheraCube, standardSimplex, box, graded intervals/circles,
uniform_disc, ball, spheres, twinDisc, cutoutCircle, ...) and
meshCy.pyx:140-215 (graded mesh transformers).  Where the reference shells
out to meshpy/triangle/gmsh we build the same domains from structured
constructions (rings, fans, Kuhn cubes) — the refinement transformers make
them converge to the same geometry.
"""
import numpy as np

from ..config import REAL, INDEX
from .meshes import (simplexMesh, simpleInterval, uniformSquare, simpleBox,
                     circle, radialMeshTransformer, meshFactory)

__all__ = ['crossSquare', 'disconnectedInterval', 'simpleLshape',
           'standardSimplex2D', 'standardSimplex3D', 'simpleFicheraCube',
           'box', 'gradedSquare', 'gradedBox', 'gradedHypercubeTransformer',
           'graded_interval', 'double_graded_interval', 'gradedIntervals',
           'multiIntervalMeshTransformer', 'uniform_disc', 'graded_circle',
           'gradeMesh', 'gradeUniformBall', 'ball', 'ballNd', 'sphere1',
           'sphere2', 'twinDisc', 'cutoutCircle', 'squareWithCircularCutout']


# ------------------------------------------------------------- 1D meshes ---

def disconnectedInterval(sep=0.1):
    """(0, 0.5-sep/2) u (0.5+sep/2, 1) (ref mesh.py:220)."""
    vertices = np.array([[0.], [0.5 - sep / 2], [0.5 + sep / 2], [1.]],
                        dtype=REAL)
    cells = np.array([[0, 1], [2, 3]], dtype=INDEX)
    return simplexMesh(vertices, cells, dim=1)


class multiIntervalMeshTransformer:
    """Keep refinements graded: new vertices on graded intervals are placed
    by the inverse grading map (ref meshCy.pyx multiIntervalMeshTransformer).
    intervals: list of (a, b, mu1, mu2); mu=None means no grading toward
    that endpoint."""

    def __init__(self, intervals):
        self.intervals = intervals

    def _place(self, r1, r2, center, radius, mu):
        x1 = 1 - (1 - r1 / radius) ** (1 / mu)
        x2 = 1 - (1 - r2 / radius) ** (1 / mu)
        x3 = 0.5 * (x1 + x2)
        return radius * (1 - (1 - x3) ** mu)

    def __call__(self, oldMesh, newMesh, lookup):
        edges = lookup['edges']
        newIdx = lookup['newIdx']
        for k in range(len(newIdx)):
            j = newIdx[k]
            r = newMesh.vertices[j, 0]
            v0 = oldMesh.vertices[edges[k, 0], 0]
            v1 = oldMesh.vertices[edges[k, 1], 0]
            for (a, b, mu1, mu2) in self.intervals:
                if not (a < r <= b):
                    continue
                if mu1 is None and mu2 is not None:
                    rad = b - a
                    rr = self._place(abs(v0 - a), abs(v1 - a), a, rad, mu2)
                    newMesh.vertices[j, 0] = a + rr
                elif mu2 is None and mu1 is not None:
                    rad = b - a
                    rr = self._place(abs(v0 - b), abs(v1 - b), b, rad, mu1)
                    newMesh.vertices[j, 0] = b - rr
                elif mu1 is not None and mu2 is not None:
                    center = 0.5 * (a + b)
                    rad = 0.5 * (b - a)
                    if r <= center:
                        # grade toward a on the left half
                        rr = self._place(min(abs(v0 - a), rad),
                                         min(abs(v1 - a), rad), a, rad, mu1)
                        newMesh.vertices[j, 0] = a + rr
                    else:
                        rr = self._place(min(abs(v0 - b), rad),
                                         min(abs(v1 - b), rad), b, rad, mu2)
                        newMesh.vertices[j, 0] = b - rr
                break


def gradedIntervals(intervals, h):
    """Union of graded intervals; nodes cluster toward the endpoints with
    power mu (ref mesh.py:1085-1144)."""
    intervals = list(sorted(intervals, key=lambda iv: iv[0]))
    pts = []
    for (a, b, mu1, mu2) in intervals:
        if mu1 is not None and mu2 is not None:
            center, radius = 0.5 * (a + b), 0.5 * (b - a)
            M1 = max(int(np.ceil(1 / (1 - (1 - h / radius) ** (1 / mu1)))), 1)
            M2 = max(int(np.ceil(1 / (1 - (1 - h / radius) ** (1 / mu2)))), 1)
            left = [center - radius * (1 - (1 - j / M1) ** mu1)
                    for j in range(M1, 0, -1)]
            right = [center + radius * (1 - (1 - j / M2) ** mu2)
                     for j in range(1, M2 + 1)]
            pts.extend(left + [center] + right)
        elif mu1 is None:
            radius = b - a
            M2 = max(int(np.ceil(1 / (1 - (1 - h / radius) ** (1 / mu2)))), 1)
            pts.extend([a + radius * (1 - (1 - j / M2) ** mu2)
                        for j in range(0, M2 + 1)])
        else:
            radius = b - a
            M1 = max(int(np.ceil(1 / (1 - (1 - h / radius) ** (1 / mu1)))), 1)
            pts.extend([b - radius * (1 - (1 - j / M1) ** mu1)
                        for j in range(M1, -1, -1)])
    pts = np.unique(np.round(np.asarray(pts), 14))
    verts = pts.reshape(-1, 1).astype(REAL)
    n = len(verts)
    cells = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    m = simplexMesh(verts, cells.astype(INDEX), dim=1)
    m.transformer = multiIntervalMeshTransformer(intervals)
    return m


def graded_interval(h, mu=2., mu2=None, a=-1., b=1.):
    """Interval graded toward both endpoints (ref mesh.py:1145)."""
    if mu2 is None:
        mu2 = mu
    return gradedIntervals([(a, b, mu, mu2)], h)


def double_graded_interval(h, mu_ll=2., mu_rr=2., mu_lr=None, mu_rl=None,
                           a=-1., b=1.):
    """Two intervals joined at 0, graded toward every breakpoint
    (ref mesh.py:1152)."""
    if mu_lr is None:
        mu_lr = mu_ll
    if mu_rl is None:
        mu_rl = mu_rr
    return gradedIntervals([(a, 0., mu_ll, mu_lr), (0., b, mu_rl, mu_rr)], h)


# ------------------------------------------------------------- 2D meshes ---

def crossSquare(N=3, ax=0., ay=0., bx=1., by=1.):
    """Unit square, crossed-diagonal pattern: every grid cell is split into
    4 triangles around its center (ref mesh.py:192, uniformSquare
    crossed=True)."""
    xs = np.linspace(ax, bx, N)
    ys = np.linspace(ay, by, N)
    verts = [(x, y) for x in xs for y in ys]

    def vid(i, j):
        return i * N + j

    centers = {}
    for i in range(N - 1):
        for j in range(N - 1):
            centers[(i, j)] = len(verts)
            verts.append((0.5 * (xs[i] + xs[i + 1]),
                          0.5 * (ys[j] + ys[j + 1])))
    cells = []
    for i in range(N - 1):
        for j in range(N - 1):
            c = centers[(i, j)]
            v00, v10 = vid(i, j), vid(i + 1, j)
            v01, v11 = vid(i, j + 1), vid(i + 1, j + 1)
            cells += [[v00, v10, c], [v10, v11, c],
                      [v11, v01, c], [v01, v00, c]]
    return simplexMesh(np.asarray(verts, dtype=REAL),
                       np.asarray(cells, dtype=INDEX), dim=2)


def simpleLshape():
    """[0,2]^2 minus [1,2]x[1,2] (ref mesh.py:905)."""
    vertices = np.array([(0, 0), (1, 0), (2, 0), (2, 1),
                         (1, 1), (0, 1), (0, 2), (1, 2)], dtype=REAL)
    cells = np.array([(0, 1, 4), (0, 4, 5), (1, 2, 3),
                      (1, 3, 4), (5, 4, 7), (5, 7, 6)], dtype=INDEX)
    return simplexMesh(vertices, cells, dim=2)


def standardSimplex2D():
    return simplexMesh(np.array([[0., 0.], [1., 0.], [0., 1.]], dtype=REAL),
                       np.array([[0, 1, 2]], dtype=INDEX), dim=2)


def standardSimplex3D():
    return simplexMesh(np.array([[0., 0., 0.], [1., 0., 0.],
                                 [0., 1., 0.], [0., 0., 1.]], dtype=REAL),
                       np.array([[0, 1, 2, 3]], dtype=INDEX), dim=3)


def simpleFicheraCube():
    """[0,2]^3 minus [1,2]^3: seven unit cubes, Kuhn-triangulated
    (ref mesh.py:856)."""
    xs = np.array([0., 1., 2.])
    verts = np.array([(x, y, z) for x in xs for y in xs for z in xs],
                     dtype=REAL)

    def vid(i, j, k):
        return (i * 3 + j) * 3 + k

    from itertools import permutations
    cells = []
    for i in range(2):
        for j in range(2):
            for k in range(2):
                if (i, j, k) == (1, 1, 1):
                    continue
                corner = np.array([i, j, k])
                for perm in permutations(range(3)):
                    step = corner.copy()
                    tet = [vid(*step)]
                    for axis in perm:
                        step[axis] += 1
                        tet.append(vid(*step))
                    cells.append(tet)
    return simplexMesh(verts, np.asarray(cells, dtype=INDEX), dim=3)


class gradedHypercubeTransformer:
    """Component-wise power grading of refined vertices
    (ref meshCy.pyx:140-183): factor > 1 concentrates vertices toward the
    lower-left corner, factor < 1 toward the upper-right corner."""

    def __init__(self, factor=0.4):
        self.factor = np.atleast_1d(np.asarray(factor, dtype=REAL))

    def __call__(self, oldMesh, newMesh, lookup):
        dim = newMesh.dim
        fac = np.resize(self.factor, dim)
        lo = newMesh.vertices.min(axis=0)
        hi = newMesh.vertices.max(axis=0)
        scale = hi - lo
        edges = lookup['edges']
        newIdx = lookup['newIdx']
        v0 = (oldMesh.vertices[edges[:, 0]] - lo) / scale
        v1 = (oldMesh.vertices[edges[:, 1]] - lo) / scale
        mid = 0.5 * v0 ** (1.0 / fac) + 0.5 * v1 ** (1.0 / fac)
        newMesh.vertices[newIdx] = lo + scale * mid ** fac


def gradedSquare(factor=0.6):
    """Unit square graded toward the origin (ref mesh.py:196)."""
    m = simplexMesh(np.array([[0., 0.], [1., 0.], [0., 1.], [1., 1.]],
                             dtype=REAL),
                    np.array([[0, 1, 3], [3, 2, 0]], dtype=INDEX), dim=2)
    m.transformer = gradedHypercubeTransformer(factor)
    return m.refine()


def gradedBox(factor=0.6):
    """Unit cube graded toward the origin (ref mesh.py:824)."""
    m = simpleBox()
    m.transformer = gradedHypercubeTransformer(factor)
    return m.refine()


def box(ax=0., ay=0., az=0., bx=1., by=1., bz=1., Nx=2, Ny=2, Nz=2):
    """Structured box mesh (ref mesh.py:775)."""
    xs = np.linspace(ax, bx, Nx)
    ys = np.linspace(ay, by, Ny)
    zs = np.linspace(az, bz, Nz)
    verts = np.array([(x, y, z) for x in xs for y in ys for z in zs],
                     dtype=REAL)

    def vid(i, j, k):
        return (i * Ny + j) * Nz + k

    from itertools import permutations
    cells = []
    for i in range(Nx - 1):
        for j in range(Ny - 1):
            for k in range(Nz - 1):
                corner = np.array([i, j, k])
                for perm in permutations(range(3)):
                    step = corner.copy()
                    tet = [vid(*step)]
                    for axis in perm:
                        step[axis] += 1
                        tet.append(vid(*step))
                    cells.append(tet)
    return simplexMesh(verts, np.array(cells, dtype=INDEX), dim=3)


def uniform_disc(radius=1., n=6, **kwargs):
    """Hexagon fan disc with radial projection on refinement
    (ref mesh.py:946)."""
    m = circle(n=n, radius=radius)
    m.transformer = radialMeshTransformer(radius)
    return m


def gradeMesh(mesh, grading):
    """Radially remap all vertices: |x| -> grading(|x|) (ref mesh.py:1467)."""
    norms = np.linalg.norm(mesh.vertices, axis=1)
    with np.errstate(invalid='ignore'):
        scale = np.where(norms > 0,
                         np.array([grading(r) if r > 0 else 1.0
                                   for r in norms]) / np.maximum(norms, 1e-300),
                         1.0)
    mesh.vertices *= scale[:, None]
    return mesh


def gradeUniformBall(mesh, muInterior=2., muExterior=2., rInterior=1.,
                     rExterior=None, rExteriorInitial=None):
    """Grade a uniform ball toward the sphere r = rInterior
    (ref mesh.py:1475)."""
    if rExteriorInitial is None:
        rExteriorInitial = np.linalg.norm(mesh.vertices, axis=1).max()
    assert rInterior < rExteriorInitial or rExterior is None
    if rExterior is None:
        rExterior = rExteriorInitial

    def grading(r):
        if r <= rInterior:
            return rInterior * (1 - (1 - r / rInterior) ** muInterior)
        return rInterior + (rExterior - rInterior) * (
            (r - rInterior) / (rExteriorInitial - rInterior)) ** muExterior

    return gradeMesh(mesh, grading)


def graded_circle(M, mu=2., radius=1., **kwargs):
    """Disc graded toward its boundary (ref mesh.py:1174; built as a uniform
    fan disc refined M times, then radially graded -- the reference uses a
    meshpy ring construction, not available here)."""
    m = uniform_disc(radius=radius)
    for _ in range(max(int(np.ceil(np.log2(max(M, 1)))) + 1, 2)):
        m = m.refine()

    def grading(r):
        return radius * (1 - (1 - r / radius) ** mu)

    gradeMesh(m, grading)
    m.transformer = None
    return m


def twinDisc(n=8, radius=1., sep=0.1, **kwargs):
    """Two discs of given radius separated by sep (ref mesh.py:1280)."""
    m1 = circle(n=n, radius=radius)
    m2 = circle(n=n, radius=radius)
    v1 = m1.vertices + np.array([radius + sep / 2, 0.0])
    v2 = m2.vertices - np.array([radius + sep / 2, 0.0])
    verts = np.vstack([v1, v2])
    cells = np.vstack([m1.cells, m2.cells + m1.num_vertices])
    m = simplexMesh(verts, cells.astype(INDEX), dim=2)
    m.transformer = None
    return m


def cutoutCircle(n=8, radius=1., cutoutAngle=np.pi / 2., **kwargs):
    """Disc with an angular sector removed (ref mesh.py:1254)."""
    thetas = np.linspace(cutoutAngle, 2 * np.pi, n + 1)
    verts = [np.zeros(2)]
    for t in thetas:
        verts.append(radius * np.array([np.cos(t), np.sin(t)]))
    cells = [[0, i, i + 1] for i in range(1, n + 1)]
    m = simplexMesh(np.asarray(verts, dtype=REAL),
                    np.asarray(cells, dtype=INDEX), dim=2)
    m.transformer = radialMeshTransformer(radius)
    return m


def squareWithCircularCutout(ax=-3., ay=-3., bx=3., by=3., radius=1.,
                             num_points_per_unit_len=2):
    """Square with a disc removed: ring triangulation from the circle to the
    square boundary (ref mesh.py squareWithCircularCutout; meshpy-free)."""
    n0 = max(int(np.ceil(2 * np.pi * radius * num_points_per_unit_len)), 8)
    n0 = (n0 // 4) * 4
    corners = np.mod([np.arctan2(cy, cx) for cx, cy in
                      ((bx, by), (ax, by), (ax, ay), (bx, ay))], 2 * np.pi)
    thetas = np.unique(np.concatenate([2 * np.pi * np.arange(n0) / n0,
                                       corners]))
    n = len(thetas)

    def squarePoint(t):
        # map angle to the square boundary along the ray
        c, s = np.cos(t), np.sin(t)
        tx = np.inf if abs(c) < 1e-15 else max((bx if c > 0 else ax) / c, 0)
        ty = np.inf if abs(s) < 1e-15 else max((by if s > 0 else ay) / s, 0)
        r = min(tx, ty)
        return np.array([r * c, r * s])

    inner = radius * np.stack([np.cos(thetas), np.sin(thetas)], axis=1)
    outer = np.stack([squarePoint(t) for t in thetas], axis=0)
    # radial layers between circle and square
    half = 0.5 * (inner + outer)
    rings = [inner, half, outer]
    verts = np.vstack(rings)
    cells = []
    for l in range(len(rings) - 1):
        o1 = l * n
        o2 = (l + 1) * n
        for i in range(n):
            j = (i + 1) % n
            cells.append([o1 + i, o2 + i, o2 + j])
            cells.append([o1 + i, o2 + j, o1 + j])
    m = simplexMesh(verts.astype(REAL), np.asarray(cells, dtype=INDEX), dim=2)
    m.transformer = radialMeshTransformer(radius)
    return m


# ------------------------------------------------------------- 3D meshes ---

def ball(radius=1., points=4, radial_subdiv=None, **kwargs):
    """3D ball: octahedron fan around the origin; refinement projects new
    boundary vertices onto the sphere (ref mesh.py:1408 builds a meshpy
    surface of revolution; same limit geometry)."""
    r = radius
    verts = np.array([[0, 0, 0],
                      [r, 0, 0], [-r, 0, 0],
                      [0, r, 0], [0, -r, 0],
                      [0, 0, r], [0, 0, -r]], dtype=REAL)
    cells = []
    for sx, vx in ((1, 1), (-1, 2)):
        for sy, vy in ((1, 3), (-1, 4)):
            for sz, vz in ((1, 5), (-1, 6)):
                tet = [0, vx, vy, vz]
                # fix orientation (positive volume)
                if sx * sy * sz < 0:
                    tet = [0, vy, vx, vz]
                cells.append(tet)
    m = simplexMesh(verts, np.asarray(cells, dtype=INDEX), dim=3)
    m.transformer = radialMeshTransformer()
    return m


def ballNd(dim, radius, h):
    """Ball in 1/2/3D refined to target h (ref mesh.py:1446)."""
    if dim == 1:
        m = simpleInterval(-radius, radius)
    elif dim == 2:
        m = uniform_disc(radius=radius)
    elif dim == 3:
        m = ball(radius)
    else:
        raise NotImplementedError(dim)
    while m.h > h:
        m = m.refine()
    return m


def sphere1(numCells=10, radius=1.):
    """1-sphere (circle) as a 1D manifold mesh in 2D (ref mesh.py:1493)."""
    thetas = 2 * np.pi * np.arange(numCells) / numCells
    verts = radius * np.stack([np.cos(thetas), np.sin(thetas)], axis=1)
    cells = np.stack([np.arange(numCells),
                      (np.arange(numCells) + 1) % numCells], axis=1)
    m = simplexMesh(verts.astype(REAL), cells.astype(INDEX), dim=2)
    m.transformer = radialMeshTransformer()
    return m


def sphere2(radius=1., h=0.5):
    """2-sphere surface mesh in 3D: refined octahedron projected radially
    (ref mesh.py:1508 uses gmsh; same limit geometry)."""
    r = radius
    verts = np.array([[r, 0, 0], [-r, 0, 0], [0, r, 0],
                      [0, -r, 0], [0, 0, r], [0, 0, -r]], dtype=REAL)
    cells = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]],
                     dtype=INDEX)
    m = simplexMesh(verts, cells, dim=3)
    m.transformer = radialMeshTransformer()
    while m.h > h:
        m = m.refine()
    return m


# ------------------------------------------------------------ registrations

meshFactory.register('disconnectedInterval', disconnectedInterval)
meshFactory.register('crossSquare', crossSquare, aliases=['squareCross'])
meshFactory.register('gradedSquare', gradedSquare)
meshFactory.register('gradedBox', gradedBox, aliases=['gradedCube'])
meshFactory.register('simpleLshape', simpleLshape,
                     aliases=['Lshape', 'L-shape'])
meshFactory.register('standardSimplex2D', standardSimplex2D)
meshFactory.register('standardSimplex3D', standardSimplex3D)
meshFactory.register('simpleFicheraCube', simpleFicheraCube,
                     aliases=['fichera', 'ficheraCube'])
meshFactory.register('box', box)
meshFactory.register('ball', ball)
meshFactory.register('uniform_disc', uniform_disc,
                     aliases=['uniform_ball2d', '2dball_uniform'])
meshFactory.register('graded_circle', graded_circle,
                     aliases=['gradedCircle'])
meshFactory.register('gradedInterval', graded_interval)
meshFactory.register('doubleGradedInterval', double_graded_interval)
meshFactory.register('twinDisc', twinDisc)
meshFactory.register('cutoutCircle', cutoutCircle, aliases=['cutoutDisc'])
meshFactory.register('squareWithCircularCutout', squareWithCircularCutout)
meshFactory.register('sphere1d', sphere1,
                     aliases=['sphere1', '1dsphere', '1-sphere'])
meshFactory.register('sphere2d', sphere2,
                     aliases=['sphere2', '2dsphere', '2-sphere'])
