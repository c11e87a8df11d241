"""Simplex meshes (1D/2D/3D), uniform refinement, boundary tagging, mesh zoo.

Counterpart of /root/reference/fem/PyNucleus_fem/meshCy.pyx (meshBase, refine)
and mesh.py (mesh zoo, meshNd, surface meshes).  Host-side numpy throughout —
mesh setup is irregular and happens once; device code only ever sees index
arrays derived from it.

Tag conventions follow the reference (fem/PyNucleus_fem/mesh.py:33-40):
PHYSICAL=0 marks the physical boundary, INTERIOR=-2 artificial interior
boundaries, NO_BOUNDARY selects nothing.
"""
from __future__ import annotations

import numpy as np

from ..config import REAL, INDEX
from ..base.factory import factory

PHYSICAL = 0
INTERIOR_NONOVERLAPPING = -1
INTERIOR = -2
NO_BOUNDARY = np.iinfo(np.int32).min
DIRICHLET_EXTERIOR = 1  # tag for interaction-domain (exterior) vertices
DIRICHLET_INTERIOR = 2

__all__ = ['simplexMesh', 'meshFactory', 'simpleInterval', 'simpleBox',
           'intervalWithInteraction',
           'simpleSquare', 'uniformSquare', 'squareWithInteractions', 'circle',
           'discWithInteraction', 'PHYSICAL', 'INTERIOR', 'NO_BOUNDARY',
           'gradedIntervalTransform', 'doubleIntervalWithInteractions',
           'doubleSquareWithInteractions']


def _octahedronSplit(verts, m01, m02, m03, m12, m13, m23):
    """Split the interior octahedron of a red-refined tetrahedron into 4
    sub-tets along its shortest interior diagonal, per cell (vectorized;
    behavior of ref meshCy.pyx:1395-1430)."""
    d0 = ((verts[m01] - verts[m23]) ** 2).sum(axis=1)   # v01-v23
    d1 = ((verts[m02] - verts[m13]) ** 2).sum(axis=1)   # v02-v13
    d2 = ((verts[m03] - verts[m12]) ** 2).sum(axis=1)   # v03-v12
    choice = np.where((d0 < d1) & (d0 < d2), 0,
                      np.where(d1 < d2, 1, 2))          # [C]
    # candidate splits [3 choices][4 tets] of vertex tuples
    cands = [
        [(m01, m12, m02, m23), (m01, m23, m03, m13),
         (m01, m02, m03, m23), (m01, m13, m12, m23)],
        [(m01, m02, m03, m13), (m01, m12, m02, m13),
         (m02, m03, m13, m23), (m02, m13, m12, m23)],
        [(m01, m13, m12, m03), (m03, m23, m13, m12),
         (m03, m23, m12, m02), (m01, m12, m02, m03)],
    ]
    out = []
    for t in range(4):
        stacked = np.stack([np.stack(cands[c][t], axis=1)
                            for c in range(3)], axis=0)  # [3, C, 4]
        out.append(stacked[choice, np.arange(len(choice))])
    return out


class simplexMesh:
    """vertices [V, dim] float64, cells [C, manifold_dim+1] int32."""

    def __init__(self, vertices, cells, dim=None):
        self.vertices = np.ascontiguousarray(vertices, dtype=REAL)
        self.cells = np.ascontiguousarray(cells, dtype=INDEX)
        self.dim = dim if dim is not None else self.vertices.shape[1]
        self.manifold_dim = self.cells.shape[1] - 1
        self.transformer = None
        self._boundaryVertices = None
        self._boundaryVertexTags = None
        self._boundaryEdges = None
        self._boundaryEdgeTags = None
        self._boundaryFaces = None
        self._boundaryFaceTags = None

    # ------------------------------------------------------------------ sizes
    @property
    def num_vertices(self):
        return self.vertices.shape[0]

    @property
    def num_cells(self):
        return self.cells.shape[0]

    # --------------------------------------------------------------- geometry
    def simplexVolumes(self):
        V = self.vertices[self.cells]                      # [C, m+1, dim]
        m = self.manifold_dim
        span = V[:, 1:, :] - V[:, :1, :]                   # [C, m, dim]
        if m == 0:
            return np.ones(self.num_cells, dtype=REAL)
        if m == self.dim:
            det = np.linalg.det(span)
            fac = {1: 1.0, 2: 0.5, 3: 1.0 / 6.0}[m]
            return np.abs(det) * fac
        # manifold simplices (surface meshes)
        G = np.einsum('cid,cjd->cij', span, span)
        det = np.linalg.det(G) if m > 1 else G[:, 0, 0]
        fac = {1: 1.0, 2: 0.5, 3: 1.0 / 6.0}[m]
        return np.sqrt(np.abs(det)) * fac

    @property
    def volumes(self):
        return self.simplexVolumes()

    @property
    def volume(self):
        return float(self.simplexVolumes().sum())

    def edgeLengths(self):
        V = self.vertices[self.cells]
        m = self.manifold_dim
        ls = []
        for i in range(m + 1):
            for j in range(i + 1, m + 1):
                ls.append(np.linalg.norm(V[:, i, :] - V[:, j, :], axis=1))
        return np.stack(ls, axis=1)  # [C, numEdges]

    @property
    def h(self):
        return float(self.edgeLengths().max())

    @property
    def hmin(self):
        return float(self.edgeLengths().min())

    @property
    def diam(self):
        lo = self.vertices.min(axis=0)
        hi = self.vertices.max(axis=0)
        return float(np.linalg.norm(hi - lo))

    # --------------------------------------------------------------- boundary
    def computeBoundary(self):
        """Find boundary facets (appear in exactly one cell) and derive
        boundary vertices/edges.  Sets default PHYSICAL tags if untagged."""
        m = self.manifold_dim
        if m == 1:
            # facets = vertices
            counts = np.zeros(self.num_vertices, dtype=np.int64)
            np.add.at(counts, self.cells.ravel(), 1)
            bv = np.nonzero(counts == 1)[0].astype(INDEX)
            self._boundaryVertices = bv
            if self._boundaryVertexTags is None or \
                    len(self._boundaryVertexTags) != len(bv):
                self._boundaryVertexTags = np.full(len(bv), PHYSICAL, dtype=np.int64)
        elif m == 2:
            edges = np.concatenate([self.cells[:, [0, 1]],
                                    self.cells[:, [1, 2]],
                                    self.cells[:, [2, 0]]], axis=0)
            se = np.sort(edges, axis=1)
            uniq, inv, counts = np.unique(se, axis=0, return_inverse=True,
                                          return_counts=True)
            bEdges = uniq[counts == 1].astype(INDEX)
            self._boundaryEdges = bEdges
            if self._boundaryEdgeTags is None or \
                    len(self._boundaryEdgeTags) != len(bEdges):
                self._boundaryEdgeTags = np.full(len(bEdges), PHYSICAL, dtype=np.int64)
            bv = np.unique(bEdges.ravel()).astype(INDEX)
            self._boundaryVertices = bv
            if self._boundaryVertexTags is None or \
                    len(self._boundaryVertexTags) != len(bv):
                # vertex tag = max over incident boundary edge tags
                tagmap = {}
                for e, t in zip(bEdges, self._boundaryEdgeTags):
                    for v in e:
                        tagmap[v] = max(tagmap.get(v, -10 ** 9), t)
                self._boundaryVertexTags = np.array(
                    [tagmap[v] for v in bv], dtype=np.int64)
        elif m == 3:
            faces = np.concatenate([self.cells[:, [0, 1, 2]],
                                    self.cells[:, [0, 1, 3]],
                                    self.cells[:, [1, 2, 3]],
                                    self.cells[:, [0, 2, 3]]], axis=0)
            sf = np.sort(faces, axis=1)
            uniq, counts = np.unique(sf, axis=0, return_counts=True)
            bFaces = uniq[counts == 1].astype(INDEX)
            self._boundaryFaces = bFaces
            if self._boundaryFaceTags is None or \
                    len(self._boundaryFaceTags) != len(bFaces):
                self._boundaryFaceTags = np.full(len(bFaces), PHYSICAL, dtype=np.int64)
            bEdges = np.concatenate([bFaces[:, [0, 1]], bFaces[:, [1, 2]],
                                     bFaces[:, [0, 2]]], axis=0)
            bEdges = np.unique(np.sort(bEdges, axis=1), axis=0).astype(INDEX)
            self._boundaryEdges = bEdges
            self._boundaryEdgeTags = np.full(len(bEdges), PHYSICAL, dtype=np.int64)
            bv = np.unique(bFaces.ravel()).astype(INDEX)
            self._boundaryVertices = bv
            self._boundaryVertexTags = np.full(len(bv), PHYSICAL, dtype=np.int64)

    @property
    def boundaryVertices(self):
        if self._boundaryVertices is None:
            self.computeBoundary()
        return self._boundaryVertices

    @property
    def boundaryVertexTags(self):
        if self._boundaryVertexTags is None:
            self.computeBoundary()
        return self._boundaryVertexTags

    @property
    def boundaryEdges(self):
        if self._boundaryEdges is None:
            self.computeBoundary()
        return self._boundaryEdges

    @property
    def boundaryEdgeTags(self):
        if self._boundaryEdgeTags is None:
            self.computeBoundary()
        return self._boundaryEdgeTags

    @property
    def boundaryFaces(self):
        if self._boundaryFaces is None:
            self.computeBoundary()
        return self._boundaryFaces

    def tagBoundaryVertices(self, tagFunc):
        bv = self.boundaryVertices
        self._boundaryVertexTags = np.array(
            [tagFunc(self.vertices[v]) for v in bv], dtype=np.int64)

    def tagBoundaryEdges(self, tagFunc):
        be = self.boundaryEdges
        self._boundaryEdgeTags = np.array(
            [tagFunc(self.vertices[e[0]], self.vertices[e[1]]) for e in be],
            dtype=np.int64)
        # propagate to vertices
        tagmap = {}
        for e, t in zip(be, self._boundaryEdgeTags):
            for v in e:
                tagmap[v] = max(tagmap.get(v, -10 ** 9), t)
        self._boundaryVertexTags = np.array(
            [tagmap[v] for v in self.boundaryVertices], dtype=np.int64)

    def getBoundaryVerticesByTag(self, tag=None):
        bv = self.boundaryVertices
        if tag is None:
            return bv
        tags = self.boundaryVertexTags
        if not isinstance(tag, (list, tuple, np.ndarray)):
            tag = [tag]
        if NO_BOUNDARY in tag:
            return np.array([], dtype=INDEX)
        mask = np.isin(tags, tag)
        return bv[mask]

    def getBoundaryEdgesByTag(self, tag=None):
        be = self.boundaryEdges
        if be is None:
            return np.zeros((0, 2), dtype=INDEX)
        if tag is None:
            return be
        tags = self.boundaryEdgeTags
        if not isinstance(tag, (list, tuple, np.ndarray)):
            tag = [tag]
        if NO_BOUNDARY in tag:
            return np.zeros((0, 2), dtype=INDEX)
        mask = np.isin(tags, tag)
        return be[mask]

    # ------------------------------------------------------------- refinement
    def refine(self, returnLookup=False):
        """Uniform refinement (red). 1D: bisection; 2D: 4 triangles;
        3D: 8 tetrahedra (ref meshCy.pyx refineCy1D/2Dhash/3D)."""
        m = self.manifold_dim
        if m == 1:
            newMesh, lookup = self._refine1D()
        elif m == 2:
            newMesh, lookup = self._refine2D()
        elif m == 3:
            newMesh, lookup = self._refine3D()
        else:
            raise NotImplementedError(m)
        newMesh.transformer = self.transformer
        if self.transformer is not None:
            self.transformer(self, newMesh, lookup)
        self._propagateBoundaryTags(newMesh, lookup)
        if returnLookup:
            return newMesh, lookup
        return newMesh

    def _edgeMidpoints(self, edges):
        """edges [E,2] sorted-unique; returns midpoint vertex numbers and a
        lookup dict from sorted tuple -> new vertex index."""
        mids = 0.5 * (self.vertices[edges[:, 0]] + self.vertices[edges[:, 1]])
        newIdx = self.num_vertices + np.arange(edges.shape[0], dtype=np.int64)
        return mids, newIdx

    def _refine1D(self):
        C = self.num_cells
        mids = 0.5 * (self.vertices[self.cells[:, 0]] +
                      self.vertices[self.cells[:, 1]])
        newV = np.concatenate([self.vertices, mids], axis=0)
        midIdx = self.num_vertices + np.arange(C)
        left = np.stack([self.cells[:, 0], midIdx], axis=1)
        right = np.stack([midIdx, self.cells[:, 1]], axis=1)
        newC = np.concatenate([left, right], axis=0)
        lookup = {'edges': np.sort(self.cells, axis=1), 'newIdx': midIdx}
        return simplexMesh(newV, newC, dim=self.dim), lookup

    def _refine2D(self):
        cells = self.cells
        edges = np.concatenate([cells[:, [0, 1]], cells[:, [1, 2]],
                                cells[:, [2, 0]]], axis=0)
        se = np.sort(edges, axis=1)
        uniq, inv = np.unique(se, axis=0, return_inverse=True)
        mids, newIdx = self._edgeMidpoints(uniq)
        newV = np.concatenate([self.vertices, mids], axis=0)
        C = self.num_cells
        m01 = newIdx[inv[:C]]
        m12 = newIdx[inv[C:2 * C]]
        m20 = newIdx[inv[2 * C:]]
        v0, v1, v2 = cells[:, 0], cells[:, 1], cells[:, 2]
        newC = np.concatenate([
            np.stack([v0, m01, m20], axis=1),
            np.stack([v1, m12, m01], axis=1),
            np.stack([v2, m20, m12], axis=1),
            np.stack([m01, m12, m20], axis=1)], axis=0)
        lookup = {'edges': uniq, 'newIdx': newIdx}
        return simplexMesh(newV, newC, dim=self.dim), lookup

    def _refine3D(self):
        cells = self.cells
        pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        edges = np.concatenate([cells[:, list(p)] for p in pairs], axis=0)
        se = np.sort(edges, axis=1)
        uniq, inv = np.unique(se, axis=0, return_inverse=True)
        mids, newIdx = self._edgeMidpoints(uniq)
        newV = np.concatenate([self.vertices, mids], axis=0)
        C = self.num_cells
        m = {}
        for k, p in enumerate(pairs):
            m[p] = newIdx[inv[k * C:(k + 1) * C]]
        v = [cells[:, i] for i in range(4)]
        m01, m02, m03 = m[(0, 1)], m[(0, 2)], m[(0, 3)]
        m12, m13, m23 = m[(1, 2)], m[(1, 3)], m[(2, 3)]
        newC = np.concatenate([
            np.stack([v[0], m01, m02, m03], axis=1),
            np.stack([v[1], m01, m12, m13], axis=1),
            np.stack([v[2], m02, m12, m23], axis=1),
            np.stack([v[3], m03, m13, m23], axis=1),
            # octahedron split along the SHORTEST interior diagonal
            # (ref meshCy.pyx:1395-1430: shortest-interior-edge refinement
            # instead of Bey's fixed choice) -- keeps shape regularity under
            # repeated refinement for arbitrary tet geometry.
            *_octahedronSplit(newV, m01, m02, m03, m12, m13, m23)], axis=0)
        lookup = {'edges': uniq, 'newIdx': newIdx}
        return simplexMesh(newV, newC, dim=self.dim), lookup

    def _propagateBoundaryTags(self, newMesh, lookup):
        """Carry boundary tags from parent to child mesh by geometry lookup."""
        if self._boundaryVertexTags is None:
            return
        m = self.manifold_dim
        if m == 1:
            newMesh.computeBoundary()
            # boundary vertices identical (endpoints keep indices)
            oldMap = dict(zip(self.boundaryVertices.tolist(),
                              self.boundaryVertexTags.tolist()))
            newMesh._boundaryVertexTags = np.array(
                [oldMap.get(int(v), PHYSICAL) for v in newMesh.boundaryVertices],
                dtype=np.int64)
        elif m == 2:
            newMesh.computeBoundary()
            # an old boundary edge (a,b) with midpoint m gives new edges (a,m),(m,b)
            edgeTag = {}
            uniq = lookup['edges']
            newIdx = lookup['newIdx']
            mid_of = {tuple(e): int(i) for e, i in zip(uniq.tolist(), newIdx.tolist())}
            for e, t in zip(self.boundaryEdges.tolist(), self.boundaryEdgeTags.tolist()):
                a, b = sorted(e)
                mm = mid_of[(a, b)]
                edgeTag[tuple(sorted((a, mm)))] = t
                edgeTag[tuple(sorted((mm, b)))] = t
            newTags = np.array([edgeTag.get(tuple(sorted(e.tolist())), PHYSICAL)
                                for e in newMesh.boundaryEdges], dtype=np.int64)
            newMesh._boundaryEdgeTags = newTags
            tagmap = {}
            for e, t in zip(newMesh.boundaryEdges, newTags):
                for vv in e:
                    tagmap[vv] = max(tagmap.get(vv, -10 ** 9), t)
            newMesh._boundaryVertexTags = np.array(
                [tagmap[v] for v in newMesh.boundaryVertices], dtype=np.int64)

    # ----------------------------------------------------------- surface mesh
    def get_surface_mesh(self, tag=None):
        """Mesh of boundary facets, with outward orientation info
        (ref fem mesh.py:2055)."""
        m = self.manifold_dim
        if m == 1:
            bv = self.getBoundaryVerticesByTag(tag)
            cells = bv.reshape(-1, 1).astype(INDEX)
            sm = simplexMesh(self.vertices.copy(), cells, dim=self.dim)
            # outward normal at endpoints: -1 at left boundary, +1 at right
            # (determined by adjacency: vertex's single cell)
            normals = np.zeros((len(bv), self.dim), dtype=REAL)
            counts = {}
            for c in self.cells:
                for v in c:
                    counts[v] = counts.get(v, 0) + 1
            for k, v in enumerate(bv):
                # find the cell containing v
                rows = np.nonzero((self.cells == v).any(axis=1))[0]
                cell = self.cells[rows[0]]
                other = cell[cell != v][0]
                d = self.vertices[v] - self.vertices[other]
                normals[k] = d / np.linalg.norm(d)
            sm.normals = normals
            return sm
        elif m == 2:
            be = self.getBoundaryEdgesByTag(tag)
            sm = simplexMesh(self.vertices.copy(), be.astype(INDEX), dim=self.dim)
            # outward normals per boundary edge
            normals = np.zeros((len(be), self.dim), dtype=REAL)
            # build map edge->cell
            cells = self.cells
            alledges = np.concatenate([cells[:, [0, 1]], cells[:, [1, 2]],
                                       cells[:, [2, 0]]], axis=0)
            owner = np.concatenate([np.arange(len(cells))] * 3)
            key = {}
            for e, o in zip(np.sort(alledges, axis=1).tolist(), owner):
                key.setdefault(tuple(e), []).append(o)
            for k, e in enumerate(be):
                t = self.vertices[e[1]] - self.vertices[e[0]]
                n = np.array([t[1], -t[0]])
                n /= np.linalg.norm(n)
                cellNo = key[tuple(sorted(e.tolist()))][0]
                center = self.vertices[self.cells[cellNo]].mean(axis=0)
                mid = 0.5 * (self.vertices[e[0]] + self.vertices[e[1]])
                if np.dot(n, mid - center) < 0:
                    n = -n
                normals[k] = n
            sm.normals = normals
            return sm
        elif m == 3:
            bf = self._boundaryFaces if self._boundaryFaces is not None else None
            if bf is None:
                self.computeBoundary()
                bf = self._boundaryFaces
            sm = simplexMesh(self.vertices.copy(), bf.astype(INDEX), dim=self.dim)
            return sm
        raise NotImplementedError(m)

    def copy(self):
        nm = simplexMesh(self.vertices.copy(), self.cells.copy(), dim=self.dim)
        nm._boundaryVertices = None if self._boundaryVertices is None else self._boundaryVertices.copy()
        nm._boundaryVertexTags = None if self._boundaryVertexTags is None else self._boundaryVertexTags.copy()
        nm._boundaryEdges = None if self._boundaryEdges is None else self._boundaryEdges.copy()
        nm._boundaryEdgeTags = None if self._boundaryEdgeTags is None else self._boundaryEdgeTags.copy()
        nm.transformer = self.transformer
        return nm

    def getProjectedCenters(self):
        return self.vertices[self.cells].mean(axis=1)

    def exportVTK(self, filename, pointData=None, cellData=None):
        from ..base.io import exportVTK
        exportVTK(self, filename, pointData=pointData, cellData=cellData)

    def HDF5write(self, grp):
        from ..base.io import meshHDF5write
        meshHDF5write(self, grp)

    @staticmethod
    def HDF5read(grp):
        from ..base.io import meshHDF5read
        return meshHDF5read(grp)

    def __repr__(self):
        return (f'<simplexMesh dim={self.dim} manifold={self.manifold_dim} '
                f'V={self.num_vertices} C={self.num_cells} h={self.h:.4g}>')


# ---------------------------------------------------------------- mesh zoo --

def simpleInterval(a=0.0, b=1.0, numCells=1):
    vertices = np.linspace(a, b, numCells + 1).reshape(-1, 1)
    cells = np.stack([np.arange(numCells), np.arange(1, numCells + 1)], axis=1)
    return simplexMesh(vertices, cells, dim=1)


def intervalWithInteraction(a=-1.0, b=1.0, horizon=0.1, h=None, strictInteraction=True):
    """[a-horizon, b+horizon] with vertices at a, b; interaction-zone vertices
    tagged DIRICHLET_EXTERIOR (ref fem mesh.py:247)."""
    if h is None:
        # match the reference default (ref fem mesh.py:248): the interior
        # mesh size equals the horizon, so that after uniform refinement the
        # horizon stays an exact multiple of h.  This keeps the kinks of the
        # horizon-cut integrand on mesh nodes, making the cut-pair quadrature
        # exact for polynomial data.
        h = horizon if horizon > 0 else (b - a)
    numCells = int(np.ceil((b - a) / h - 1e-8))
    hh = (b - a) / numCells
    numInt = max(int(np.ceil(horizon / hh - 1e-8)), 1) if horizon > 0 else 0
    left = a - horizon + (horizon / numInt) * np.arange(numInt) if numInt else np.zeros((0,))
    mid = a + hh * np.arange(numCells + 1)
    right = b + (horizon / numInt) * np.arange(1, numInt + 1) if numInt else np.zeros((0,))
    verts = np.concatenate([left, mid, right]).reshape(-1, 1)
    n = len(verts)
    cells = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    m = simplexMesh(verts, cells, dim=1)
    return m


def simpleBox(ax=0.0, ay=0.0, az=0.0, bx=1.0, by=1.0, bz=1.0):
    """Unit box as 6 tetrahedra: the Kuhn triangulation along the main
    diagonal -- one tet per permutation sigma of the axes, walking from
    (0,0,0) to (1,1,1) taking unit steps in the order sigma
    (ref fem mesh.py:757 uses the same decomposition as an explicit table)."""
    from itertools import permutations
    lo = np.array([ax, ay, az])
    hi = np.array([bx, by, bz])
    corners = np.array([[(i >> a) & 1 for a in range(3)]
                        for i in range(8)], dtype=REAL)
    vertices = lo + corners * (hi - lo)

    def vid(step):  # step is a 0/1 vector
        return int(step[0]) + 2 * int(step[1]) + 4 * int(step[2])

    cells = []
    for perm in permutations(range(3)):
        step = np.zeros(3, dtype=np.int64)
        tet = [vid(step)]
        for axis in perm:
            step[axis] = 1
            tet.append(vid(step))
        cells.append(tet)
    return simplexMesh(vertices, np.array(cells, dtype=INDEX), dim=3)


def simpleSquare(ax=0.0, ay=0.0, bx=1.0, by=1.0):
    vertices = np.array([[ax, ay], [bx, ay], [bx, by], [ax, by]], dtype=REAL)
    cells = np.array([[0, 1, 3], [1, 2, 3]], dtype=INDEX)
    return simplexMesh(vertices, cells, dim=2)


def uniformSquare(N=2, M=None, ax=0.0, ay=0.0, bx=1.0, by=1.0, preserveLinesHorizontal=[], preserveLinesVertical=[]):
    """N x M vertex grid of crossed triangles (ref fem mesh.py:121)."""
    if M is None:
        M = N
    xs = np.linspace(ax, bx, N)
    ys = np.linspace(ay, by, M)
    X, Y = np.meshgrid(xs, ys, indexing='ij')
    vertices = np.stack([X.ravel(), Y.ravel()], axis=1)

    def vid(i, j):
        return i * M + j

    cells = []
    for i in range(N - 1):
        for j in range(M - 1):
            v00, v10 = vid(i, j), vid(i + 1, j)
            v01, v11 = vid(i, j + 1), vid(i + 1, j + 1)
            if (i + j) % 2 == 0:
                cells.append([v00, v10, v11])
                cells.append([v00, v11, v01])
            else:
                cells.append([v10, v11, v01])
                cells.append([v10, v01, v00])
    return simplexMesh(vertices, np.array(cells, dtype=INDEX), dim=2)


def circle(n=8, radius=1.0, returnFacets=False, projectNodeToOrigin=True, h=None):
    """Disc mesh: regular n-gon fan, with a radial projection transformer so
    refinements approach the circle (ref fem mesh.py circle + radialMeshTransformer)."""
    if h is not None:
        n = max(int(np.ceil(2 * np.pi * radius / h)), 4)
    angles = 2 * np.pi * np.arange(n) / n
    ring = radius * np.stack([np.cos(angles), np.sin(angles)], axis=1)
    vertices = np.concatenate([np.zeros((1, 2)), ring], axis=0)
    cells = np.array([[0, 1 + i, 1 + (i + 1) % n] for i in range(n)], dtype=INDEX)
    m = simplexMesh(vertices, cells, dim=2)
    m.transformer = radialMeshTransformer(radius)
    return m


class radialMeshTransformer:
    """After refinement, project new vertices whose parent edge endpoints both
    lie on a circle of the same radius back onto that circle
    (ref fem meshCy.pyx:34 radialMeshTransformer)."""

    def __init__(self, radius=None, center=None):
        self.radius = radius
        self.center = center

    def __call__(self, oldMesh, newMesh, lookup):
        edges = lookup['edges']
        newIdx = lookup['newIdx']
        center = self.center
        if center is None:
            center = np.zeros(oldMesh.dim)
        r0 = np.linalg.norm(oldMesh.vertices[edges[:, 0]] - center, axis=1)
        r1 = np.linalg.norm(oldMesh.vertices[edges[:, 1]] - center, axis=1)
        onCircle = np.abs(r0 - r1) < 1e-9 * (1 + np.abs(r0))
        target = 0.5 * (r0 + r1)
        mids = newMesh.vertices[newIdx]
        rm = np.linalg.norm(mids - center, axis=1)
        scale = np.where(onCircle & (rm > 0), target / np.maximum(rm, 1e-300), 1.0)
        newMesh.vertices[newIdx] = center + (mids - center) * scale[:, None]


def gradedIntervalTransform(*args, **kwargs):
    raise NotImplementedError('graded meshes land with the adaptivity layer')


def squareWithInteractions(ax=-1., ay=-1., bx=1., by=1., horizon=0.1, h=None, **kwargs):
    """Square extended by the horizon (simplified relative to ref mesh.py:314:
    uniform grid over the extended box with grid lines snapped to the inner
    square boundary)."""
    if h is None:
        h = horizon
    def axis(lo, hi):
        nIn = max(int(np.ceil((hi - lo) / h)), 1)
        inner = np.linspace(lo, hi, nIn + 1)
        nH = max(int(np.ceil(horizon / h)), 1)
        left = lo - horizon + (horizon / nH) * np.arange(nH)
        right = hi + (horizon / nH) * np.arange(1, nH + 1)
        return np.concatenate([left, inner, right])
    xs = axis(ax, bx)
    ys = axis(ay, by)
    X, Y = np.meshgrid(xs, ys, indexing='ij')
    vertices = np.stack([X.ravel(), Y.ravel()], axis=1)
    N, M = len(xs), len(ys)

    def vid(i, j):
        return i * M + j

    cells = []
    for i in range(N - 1):
        for j in range(M - 1):
            v00, v10 = vid(i, j), vid(i + 1, j)
            v01, v11 = vid(i, j + 1), vid(i + 1, j + 1)
            if (i + j) % 2 == 0:
                cells.append([v00, v10, v11])
                cells.append([v00, v11, v01])
            else:
                cells.append([v10, v11, v01])
                cells.append([v10, v01, v00])
    return simplexMesh(vertices, np.array(cells, dtype=INDEX), dim=2)


def doubleSquareWithInteractions(ax=0., ay=0., bx=2., by=1., cx=1.,
                                 horizon1=0.1, horizon2=0.2, h=None):
    """Two touching unit squares Omega1 = (ax,cx) x (ay,by) and
    Omega2 = (cx,bx) x (ay,by) with their interaction collars (width
    horizon1 / horizon2).  Structured triangulation with grid lines snapped
    to every kernel breakpoint (interface +- horizons, collar boundaries) so
    the interface weights are constant per cell; collar corners are square
    instead of the reference's rounded arcs (ref fem mesh.py:463-700
    doubleSquareWithInteractions) -- the extra corner cells lie beyond both
    horizons and only carry prescribed exterior data."""
    assert horizon2 >= horizon1 >= 0
    if h is None:
        h = horizon1 if horizon1 > 0 else (horizon2 if horizon2 > 0 else 0.5)
    else:
        if horizon1 > 0:
            h = min(h, horizon1, horizon2)
        elif horizon2 > 0:
            h = min(h, horizon2)

    def snappedAxis(breaks, h):
        breaks = np.unique(np.asarray(breaks))
        segs = [np.array([breaks[0]])]
        for lo, hi in zip(breaks[:-1], breaks[1:]):
            k = max(int(np.ceil((hi - lo - 1e-12) / h)), 1)
            segs.append(np.linspace(lo, hi, k + 1)[1:])
        return np.concatenate(segs)

    xBreaks = [ax, cx, bx]
    yBreaks = [ay, by]
    if horizon1 > 0:
        xBreaks += [ax - horizon1, cx - horizon1, cx + horizon1]
        yBreaks += [ay - horizon1, by + horizon1]
    if horizon2 > 0:
        xBreaks += [cx - horizon2, cx + horizon2, bx + horizon2]
        yBreaks += [ay - horizon2, by + horizon2]
    xs = snappedAxis(xBreaks, h)
    ys = snappedAxis(yBreaks, h)

    X, Y = np.meshgrid(xs, ys, indexing='ij')
    vertices = np.stack([X.ravel(), Y.ravel()], axis=1)
    N, M = len(xs), len(ys)

    def vid(i, j):
        return i * M + j

    def covered(px, py):
        in1 = (ax - horizon1 <= px <= cx + horizon1 and
               ay - horizon1 <= py <= by + horizon1)
        in2 = (cx - horizon2 <= px <= bx + horizon2 and
               ay - horizon2 <= py <= by + horizon2)
        return in1 or in2

    cells = []
    for i in range(N - 1):
        for j in range(M - 1):
            if not covered(0.5 * (xs[i] + xs[i + 1]),
                           0.5 * (ys[j] + ys[j + 1])):
                continue
            v00, v10 = vid(i, j), vid(i + 1, j)
            v01, v11 = vid(i, j + 1), vid(i + 1, j + 1)
            if (i + j) % 2 == 0:
                cells.append([v00, v10, v11])
                cells.append([v00, v11, v01])
            else:
                cells.append([v10, v11, v01])
                cells.append([v10, v01, v00])
    cells = np.array(cells, dtype=INDEX)
    # drop unused vertices (collar corners outside both regions)
    used = np.unique(cells)
    remap = np.full(vertices.shape[0], -1, dtype=INDEX)
    remap[used] = np.arange(used.shape[0], dtype=INDEX)
    return simplexMesh(vertices[used], remap[cells], dim=2)


def discWithInteraction(radius=1.0, horizon=0.1, h=0.25):
    m = circle(h=h, radius=radius + horizon)
    m.transformer = radialMeshTransformer()
    return m


def doubleIntervalWithInteractions(a=0., b=1., c=2., horizon1=0.1,
                                   horizon2=0.2, h=None):
    """Two touching intervals (a,b), (b,c) with interaction collars; nodes
    are forced at all kernel breakpoints b-h2, b-h1, b, b+h1, b+h2 so the
    interface weights are piecewise constant per cell (ref fem
    mesh.py:259-311)."""
    assert horizon2 >= horizon1 >= 0
    if h is None:
        h = horizon1 if horizon1 > 0 else (horizon2 if horizon2 > 0 else 0.5)
    elif horizon1 > 0:
        h = min(h, horizon1, horizon2)
    elif horizon2 > 0:
        h = min(h, horizon2)

    nodes = []
    if horizon1 > 0:
        nodes.append(a - horizon1)
    nodes.append(a)
    if horizon2 > 0:
        nodes.append(b - horizon2)
        if horizon1 != horizon2:
            nodes.append(b - horizon1)
    nodes.append(b)
    if horizon2 > 0:
        if horizon1 != horizon2:
            nodes.append(b + horizon1)
        nodes.append(b + horizon2)
    nodes.append(c)
    if horizon2 > 0:
        nodes.append(c + horizon2)

    eps = 1e-8
    segs = [np.linspace(nodes[0], nodes[1],
                        int(np.ceil((nodes[1] - nodes[0] - eps) / h)) + 1)]
    for i in range(1, len(nodes) - 1):
        k = int(np.ceil((nodes[i + 1] - nodes[i] - eps) / h))
        segs.append(np.linspace(nodes[i], nodes[i + 1], k + 1)[1:])
    verts = np.hstack(segs).reshape(-1, 1)
    n = len(verts)
    cells = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    return simplexMesh(verts, cells, dim=1)


meshFactory = factory()
meshFactory.register('simpleInterval', simpleInterval, aliases=['interval'])
meshFactory.register('unitInterval', simpleInterval, params={'a': 0., 'b': 1.})
meshFactory.register('intervalWithInteraction', intervalWithInteraction)
meshFactory.register('simpleBox', simpleBox,
                     aliases=['unitBox', 'cube', 'unitCube'])
meshFactory.register('simpleSquare', simpleSquare)
meshFactory.register('unitSquare', uniformSquare, params={'N': 2})
meshFactory.register('square', uniformSquare,
                     params={'N': 2, 'ax': -1., 'ay': -1., 'bx': 1., 'by': 1.})
meshFactory.register('squareWithInteraction', squareWithInteractions)
meshFactory.register('circle', circle, aliases=['disc', 'unitDisc', 'ball2d'])
meshFactory.register('discWithInteraction', discWithInteraction)
meshFactory.register('doubleSquareWithInteractions',
                     doubleSquareWithInteractions)
