"""PSLG geometry construction + conforming Delaunay meshing.

Counterpart of /root/reference/fem/PyNucleus_fem/meshConstruction.py
(segment:18, circularSegment:187, circle:231, line:237, polygon:255,
rectangle:270): composable planar straight-line-graph geometries with
``+`` (translate / merge with point dedup), ``*`` (rotate) and
``.mesh(h=...)``.

The reference meshes the PSLG with Shewchuk's ``triangle`` (meshpy).  That
library is not available here; the mesher below is self-contained:

1. every facet is split into subsegments of length <= h;
2. interior seeds come from a hex-offset grid at spacing ~h, kept at a
   safe distance from the boundary samples;
3. ``scipy.spatial.Delaunay`` triangulates all points;
4. triangles outside the domain are removed by FLOOD FILL across
   non-constraint edges from the convex hull (and from hole seed points) —
   the same region-classification idea ``triangle`` uses, so interfaces
   (internal constrained lines) and non-convex domains work;
5. missing constraint subsegments are recovered by midpoint insertion and
   re-triangulation (a few sweeps; dense boundary sampling makes this
   rare).

Mesh transformations (e.g. snapping refined boundary midpoints back onto
circular arcs) ride the repo's mesh ``transformer`` protocol
(meshes.simplexMesh.refine)."""
from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree, Delaunay

from ..config import INDEX, REAL

__all__ = ['segment', 'circularSegment', 'circle', 'line', 'polygon',
           'rectangle']


class segment:
    """A PSLG fragment: points, facets (point index pairs), hole seed
    points, and mesh transformations (ref meshConstruction.py:18)."""

    def __init__(self, points, facets, holes=None):
        self.points = [tuple(map(float, p)) for p in points]
        self.facets = [tuple(map(int, f)) for f in facets]
        self.holes = [tuple(map(float, p)) for p in (holes or [])]
        self.meshTransformations = []

    # -- composition ------------------------------------------------------
    def __add__(self, other):
        if isinstance(other, (tuple, np.ndarray)):
            dx, dy = float(other[0]), float(other[1])
            s = segment([(p[0] + dx, p[1] + dy) for p in self.points],
                        self.facets,
                        [(p[0] + dx, p[1] + dy) for p in self.holes])
            off = np.array([dx, dy])
            for t in self.meshTransformations:
                s.meshTransformations.append(_translated(t, off))
            return s
        if isinstance(other, segment):
            pts = self.points + other.points
            holes = self.holes + other.holes
            off = len(self.points)
            facets = list(self.facets) + \
                [(f[0] + off, f[1] + off) for f in other.facets]
            # dedup coincident points (ref :51-66)
            P = np.asarray(pts)
            kd = cKDTree(P)
            remap = -np.ones(len(pts), dtype=np.int64)
            for i, j in sorted(map(sorted, kd.query_pairs(1e-6))):
                if remap[j] == -1:
                    remap[j] = i
            keep, newIdx = [], np.zeros(len(pts), dtype=np.int64)
            k = 0
            for i in range(len(pts)):
                if remap[i] == -1:
                    newIdx[i] = k
                    keep.append(i)
                    k += 1
            for i in range(len(pts)):
                if remap[i] != -1:
                    r = remap[i]
                    while remap[r] != -1:
                        r = remap[r]
                    newIdx[i] = newIdx[r]
            s = segment([pts[i] for i in keep],
                        [(int(newIdx[a]), int(newIdx[b]))
                         for a, b in facets], holes)
            s.meshTransformations = (self.meshTransformations
                                     + other.meshTransformations)
            return s
        raise NotImplementedError(other)

    def __mul__(self, other):
        """Rotate by (center, angle) (ref :74)."""
        c = np.asarray(other[0], dtype=np.float64)
        ang = float(other[1])
        R = np.array([[np.cos(ang), -np.sin(ang)],
                      [np.sin(ang), np.cos(ang)]])
        pts = [tuple(c + R @ (np.asarray(p) - c)) for p in self.points]
        holes = [tuple(c + R @ (np.asarray(p) - c)) for p in self.holes]
        s = segment(pts, self.facets, holes)
        for t in self.meshTransformations:
            s.meshTransformations.append(_rotated(t, c, R))
        return s

    @property
    def num_points(self):
        return len(self.points)

    @property
    def num_facets(self):
        return len(self.facets)

    @property
    def num_holes(self):
        return len(self.holes)

    @property
    def num_mesh_transformations(self):
        return len(self.meshTransformations)

    # -- meshing ----------------------------------------------------------
    def mesh(self, h=0.1, href=0, **kwargs):
        """Conforming Delaunay mesh with target edge length <= h
        (ref :128; ``triangle`` flags replaced by the built-in mesher).
        ``href``: re-mesh with shrinking h until mesh.h <= h."""
        from .meshes import simplexMesh
        hTry = float(h)
        for _ in range(max(int(href), 0) + 1):
            verts, cells = _conformingDelaunay(
                np.asarray(self.points), self.facets, self.holes, hTry,
                transformations=self.meshTransformations)
            m = simplexMesh(np.asarray(verts, dtype=REAL),
                            np.asarray(cells, dtype=INDEX))
            if m.h <= h * (1 + 1e-12):
                break
            hTry *= 0.8
        if self.meshTransformations:
            m.transformer = _pslgTransformer(list(self.meshTransformations))
        return m


class circularSegment(segment):
    """Arc of a circle, sampled at num_points, with a transformation that
    snaps refined midpoints back onto the arc (ref :187)."""

    def __init__(self, center, radius, start_angle, stop_angle,
                 num_points=None, num_points_per_unit_len=None):
        self.center = np.asarray(center, dtype=np.float64)
        self.radius = float(radius)
        self.start_angle = float(start_angle)
        self.stop_angle = float(stop_angle)
        arcLen = abs(stop_angle - start_angle) * radius
        if num_points is None:
            per = num_points_per_unit_len if num_points_per_unit_len \
                else 8 / (2 * np.pi * radius)
            num_points = max(int(np.ceil(arcLen * per)) + 1, 3)
        th = np.linspace(start_angle, stop_angle, num_points)
        pts = [(self.center[0] + radius * np.cos(t),
                self.center[1] + radius * np.sin(t)) for t in th]
        closed = abs((stop_angle - start_angle) % (2 * np.pi)) < 1e-12 and \
            abs(stop_angle - start_angle) > 1e-12
        if closed:
            pts = pts[:-1]
            facets = [(i, (i + 1) % len(pts)) for i in range(len(pts))]
        else:
            facets = [(i, i + 1) for i in range(len(pts) - 1)]
        super().__init__(pts, facets)
        self.meshTransformations.append(self._snap)

    def _snap(self, x1, x2, xNew):
        """Midpoints whose parents both lie on the arc move to the arc
        (ref circularSegment.meshTransformation :212)."""
        c, r = self.center, self.radius
        r1 = np.linalg.norm(x1 - c, axis=-1)
        r2 = np.linalg.norm(x2 - c, axis=-1)
        on = (np.abs(r1 - r) < 1e-9 * (1 + r)) & \
             (np.abs(r2 - r) < 1e-9 * (1 + r))
        rm = np.linalg.norm(xNew - c, axis=-1)
        scale = np.where(on & (rm > 0), r / np.maximum(rm, 1e-300), 1.0)
        xNew[:] = c + (xNew - c) * scale[..., None]


class circle(circularSegment):
    """Full circle (ref :231)."""

    def __init__(self, center, radius, num_points=None,
                 num_points_per_unit_len=None):
        super().__init__(center, radius, 0.0, 2 * np.pi,
                         num_points=num_points,
                         num_points_per_unit_len=num_points_per_unit_len)


class line(segment):
    """Straight segment from a to b (ref :237)."""

    def __init__(self, a, b, num_points=None, num_points_per_unit_len=None):
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        if num_points is None:
            if num_points_per_unit_len is None:
                num_points = 2
            else:
                L = np.linalg.norm(b - a)
                num_points = max(int(np.ceil(L * num_points_per_unit_len))
                                 + 1, 2)
        ts = np.linspace(0.0, 1.0, num_points)
        pts = [tuple(a + (b - a) * t) for t in ts]
        facets = [(i, i + 1) for i in range(len(pts) - 1)]
        super().__init__(pts, facets)


def polygon(points, doClose=True, num_points=None,
            num_points_per_unit_len=None):
    """Closed (or open) polyline through points (ref :255)."""
    pts = [tuple(map(float, p)) for p in points]
    n = len(pts)
    segs = None
    pairs = [(i, (i + 1) % n) for i in range(n)] if doClose else \
        [(i, i + 1) for i in range(n - 1)]
    for i, j in pairs:
        ln = line(pts[i], pts[j], num_points=num_points,
                  num_points_per_unit_len=num_points_per_unit_len)
        segs = ln if segs is None else segs + ln
    return segs


def rectangle(a, b, num_points=None, num_points_per_unit_len=None):
    """Axis-aligned rectangle with corners a, b (ref :270)."""
    ax, ay = map(float, a)
    bx, by = map(float, b)
    return polygon([(ax, ay), (bx, ay), (bx, by), (ax, by)],
                   num_points=num_points,
                   num_points_per_unit_len=num_points_per_unit_len)


def _translated(t, off):
    def transform(x1, x2, xNew):
        tmp = xNew - off
        t(x1 - off, x2 - off, tmp)
        xNew[:] = off + tmp
    return transform


def _rotated(t, c, R):
    def transform(x1, x2, xNew):
        tmp = c + (xNew - c) @ R          # R^T applied row-wise
        t(c + (x1 - c) @ R, c + (x2 - c) @ R, tmp)
        xNew[:] = c + (tmp - c) @ R.T
    return transform


class _pslgTransformer:
    """Adapt the reference's per-edge meshTransformation callbacks
    (t(x1, x2, xNew) mutates midpoint coords) to the repo's refine
    transformer protocol (meshes.radialMeshTransformer)."""

    def __init__(self, transformations):
        self.transformations = transformations

    def __call__(self, oldMesh, newMesh, lookup):
        edges = lookup['edges']
        newIdx = lookup['newIdx']
        x1 = oldMesh.vertices[edges[:, 0]]
        x2 = oldMesh.vertices[edges[:, 1]]
        xNew = newMesh.vertices[newIdx].copy()
        for t in self.transformations:
            t(x1, x2, xNew)
        newMesh.vertices[newIdx] = xNew


# --------------------------------------------------------------------------
# the mesher
# --------------------------------------------------------------------------

def _splitFacets(points, facets, h, transformations=()):
    """Subdivide facets into subsegments of length <= h.  Facets are first
    split at any INPUT point lying on them (junctions like an interface
    endpoint on a boundary edge — keeps the PSLG valid even when the user
    did not share the point).  Returns the augmented point array and
    constraint edge list (indices)."""
    P = np.asarray(points, dtype=np.float64)
    pts = [tuple(p) for p in points]
    index = {p: i for i, p in enumerate(pts)}
    splitFacets = []
    for a, b in facets:
        pa, pb = P[a], P[b]
        d = pb - pa
        L2 = float(d @ d)
        # input points strictly inside the facet (projected parameter)
        t = ((P - pa) @ d) / max(L2, 1e-300)
        off = np.linalg.norm(P - (pa + t[:, None] * d), axis=1)
        onSeg = (off < 1e-12 * (1 + np.sqrt(L2))) & (t > 1e-12) &             (t < 1 - 1e-12)
        mids = np.nonzero(onSeg)[0]
        chain = [a] + [int(i) for i in mids[np.argsort(t[mids])]] + [b]
        for u, v in zip(chain[:-1], chain[1:]):
            splitFacets.append((u, v))
    edges = []
    for a, b in splitFacets:
        pa, pb = np.asarray(pts[a]), np.asarray(pts[b])
        L = np.linalg.norm(pb - pa)
        n = max(int(np.ceil(L / h)), 1)
        prev = a
        for k in range(1, n):
            qa = pa + (pb - pa) * (k / n)
            # snap subdivision points onto curved geometry (arc etc.)
            xNew = qa[None, :].copy()
            for t in transformations:
                t(pa[None, :], pb[None, :], xNew)
            q = tuple(xNew[0])
            if q not in index:
                index[q] = len(pts)
                pts.append(q)
            cur = index[q]
            edges.append((prev, cur))
            prev = cur
        edges.append((prev, b))
    return np.asarray(pts, dtype=np.float64), edges


def _interiorSeeds(bpts, constraints, h):
    """Hex-offset grid over the bounding box.  Seeds are kept out of every
    constraint subsegment's diametral disk (plus margin) so boundary
    chords stay Delaunay — filtered against boundary samples AND facet
    midpoints."""
    lo, hi = bpts.min(axis=0), bpts.max(axis=0)
    dx = h
    dy = h * np.sqrt(3) / 2
    ys = np.arange(lo[1] + 0.5 * dy, hi[1], dy)
    rows = []
    for r, y in enumerate(ys):
        x0 = lo[0] + (0.25 if r % 2 else 0.75) * dx
        xs = np.arange(x0, hi[0], dx)
        rows.append(np.stack([xs, np.full(len(xs), y)], axis=1))
    if not rows:
        return np.zeros((0, 2))
    cand = np.concatenate(rows, axis=0)
    con = np.asarray(constraints, dtype=np.int64) if len(constraints)         else np.zeros((0, 2), dtype=np.int64)
    guard = bpts if not len(con) else np.concatenate(
        [bpts, 0.5 * (bpts[con[:, 0]] + bpts[con[:, 1]])], axis=0)
    kd = cKDTree(guard)
    d, _ = kd.query(cand, k=1)
    return cand[d >= 0.7 * h]


def _classifyTriangles(tri, constraints, holes):
    """Flood fill: outside from hull across non-constraint edges, holes
    from their seed triangles.  Returns a keep mask over tri.simplices."""
    simp = tri.simplices
    nT = len(simp)
    conSet = {tuple(sorted(e)) for e in constraints}
    neigh = tri.neighbors
    blockFrom = np.zeros((nT, 3), dtype=bool)
    for t in range(nT):
        for j in range(3):
            # edge opposite local vertex j
            e = tuple(sorted((simp[t, (j + 1) % 3], simp[t, (j + 2) % 3])))
            if e in conSet:
                blockFrom[t, j] = True
    removed = np.zeros(nT, dtype=bool)
    stack = []
    # hull seeds: neighbors[t, j] == -1 means edge opposite j is on hull
    for t in range(nT):
        for j in range(3):
            if neigh[t, j] == -1 and not blockFrom[t, j]:
                if not removed[t]:
                    removed[t] = True
                    stack.append(t)
    # hole seeds
    for hp in holes:
        t = int(tri.find_simplex(np.asarray(hp)))
        if t >= 0 and not removed[t]:
            removed[t] = True
            stack.append(t)
    while stack:
        t = stack.pop()
        for j in range(3):
            n = neigh[t, j]
            if n >= 0 and not removed[n] and not blockFrom[t, j]:
                removed[n] = True
                stack.append(n)
    return ~removed


def _conformingDelaunay(points, facets, holes, h, maxSweeps=6,
                        transformations=()):
    bpts, constraints = _splitFacets(points, facets, h, transformations)
    seeds = _interiorSeeds(bpts, constraints, h)
    pts = np.concatenate([bpts, seeds], axis=0)
    for _ in range(maxSweeps):
        tri = Delaunay(pts)
        edgeSet = set()
        for s in tri.simplices:
            for a, b in ((0, 1), (1, 2), (2, 0)):
                edgeSet.add(tuple(sorted((s[a], s[b]))))
        missing = [e for e in constraints
                   if tuple(sorted(e)) not in edgeSet]
        if not missing:
            break
        # recover by midpoint insertion (snapped onto curved geometry by
        # the segment's mesh transformations)
        newPts, newCons = [], []
        for a, b in missing:
            mid = 0.5 * (pts[a] + pts[b])
            xNew = mid[None, :].copy()
            for t in transformations:
                t(pts[a][None, :], pts[b][None, :], xNew)
            mid = xNew[0]
            idx = len(pts) + len(newPts)
            newPts.append(mid)
            newCons.append((a, idx))
            newCons.append((idx, b))
        keepCons = [e for e in constraints
                    if tuple(sorted(e)) in edgeSet]
        constraints = keepCons + newCons
        pts = np.concatenate([pts, np.asarray(newPts)], axis=0)
    keep = _classifyTriangles(tri, constraints, holes)
    simp = tri.simplices[keep]
    # size control: split interior edges longer than ~h (the seed guard
    # ring near the boundary leaves gaps bridged by long edges; triangle's
    # -a flag plays this role in the reference)
    conSet = {tuple(sorted(e)) for e in constraints}
    for _ in range(4):
        E = np.concatenate([simp[:, [0, 1]], simp[:, [1, 2]],
                            simp[:, [2, 0]]], axis=0)
        E = np.unique(np.sort(E, axis=1), axis=0)
        eLen = np.linalg.norm(pts[E[:, 0]] - pts[E[:, 1]], axis=1)
        long = eLen > 1.25 * h
        newPts = [0.5 * (pts[a] + pts[b]) for a, b in E[long]
                  if (a, b) not in conSet]
        if not newPts:
            break
        pts = np.concatenate([pts, np.asarray(newPts)], axis=0)
        tri = Delaunay(pts)
        keep = _classifyTriangles(tri, constraints, holes)
        simp = tri.simplices[keep]
    # Laplacian smoothing of the free (seed) points over kept triangles —
    # fills the quality role of triangle's -q flag; constrained points
    # (boundary samples + recovery insertions) stay fixed
    free = np.ones(len(pts), dtype=bool)
    free[:len(bpts)] = False
    conIdx = np.unique(np.asarray(constraints)) if len(constraints) else []
    free[conIdx] = False
    for _ in range(3):
        nbrSum = np.zeros_like(pts)
        nbrCnt = np.zeros(len(pts))
        for a, b in ((0, 1), (1, 2), (2, 0)):
            np.add.at(nbrSum, simp[:, a], pts[simp[:, b]])
            np.add.at(nbrCnt, simp[:, a], 1)
            np.add.at(nbrSum, simp[:, b], pts[simp[:, a]])
            np.add.at(nbrCnt, simp[:, b], 1)
        upd = free & (nbrCnt > 0)
        pts[upd] = nbrSum[upd] / nbrCnt[upd, None]
        tri = Delaunay(pts)
        keep = _classifyTriangles(tri, constraints, holes)
        simp = tri.simplices[keep]
    # drop unused points, remap
    used = np.unique(simp)
    remap = -np.ones(len(pts), dtype=np.int64)
    remap[used] = np.arange(len(used))
    return pts[used], remap[simp]
