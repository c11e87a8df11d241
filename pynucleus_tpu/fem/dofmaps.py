"""Finite element spaces (P0-P3 Lagrange) and DoF maps.

Counterpart of /root/reference/fem/PyNucleus_fem/DoFMaps.pyx.  Conventions:
  - interior dofs are numbered >= 0 in cell-traversal order, boundary dofs
    (on mesh parts selected by ``tag``) are numbered < 0 (encoded -dof-1),
    matching the reference's split (ref DoFMaps.pyx:61-260).
  - local dof order: vertex dofs, then edge dofs (2D/3D), then cell dofs.
  - shape functions are evaluated on HOST (numpy, barycentric coordinates) to
    build static tables; device code only consumes the tables.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import REAL, INDEX
from ..base.factory import factory
from .meshes import simplexMesh, NO_BOUNDARY, PHYSICAL
from .quadrature import simplexDuffy

# canonical local faces of a tetrahedron; the order fixes the P3 face-dof
# layout in localNodes and in DoFMap numbering
LOCAL_FACES_3D = ((0, 1, 2), (0, 1, 3), (1, 2, 3), (0, 2, 3))

__all__ = ['DoFMap', 'P0_DoFMap', 'P1_DoFMap', 'P2_DoFMap', 'P3_DoFMap',
           'dofmapFactory', 'fe_vector', 'str2DoFMap']


# ----------------------------------------------------------- shape functions

def _lagrange_shape_functions(order, mdim):
    """Return (evalPhi, evalGradPhi, localNodes) for Pk Lagrange on a simplex.

    evalPhi(bary [Q, m+1]) -> [ndof, Q]
    evalGradPhi(bary [Q, m+1]) -> [ndof, Q, m+1]  (derivative wrt barycentric)
    localNodes: [ndof, m+1] barycentric interpolation points, ordered
    vertices -> edges -> cell.
    """
    if order == 0:
        nodes = np.full((1, mdim + 1), 1.0 / (mdim + 1))

        def phi(b):
            return np.ones((1, b.shape[0]))

        def dphi(b):
            return np.zeros((1, b.shape[0], mdim + 1))

        return phi, dphi, nodes

    # interpolation nodes in barycentric coordinates
    verts = np.eye(mdim + 1)
    nodes = [verts[i] for i in range(mdim + 1)]
    edges = []
    if mdim >= 2:
        if mdim == 2:
            edges = [(0, 1), (1, 2), (2, 0)]
        else:
            edges = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)]
    if mdim == 1:
        # "interior" nodes of the segment count as cell dofs
        if order == 2:
            nodes.append(np.array([0.5, 0.5]))
        elif order == 3:
            nodes.append(np.array([2 / 3, 1 / 3]))
            nodes.append(np.array([1 / 3, 2 / 3]))
    else:
        if order >= 2:
            for (i, j) in edges:
                if order == 2:
                    nodes.append((verts[i] + verts[j]) / 2)
                elif order == 3:
                    nodes.append((2 * verts[i] + verts[j]) / 3)
        if order == 3:
            for (i, j) in edges:
                nodes.append((verts[i] + 2 * verts[j]) / 3)
            # reorder: for order 3 we want per-edge pairs contiguous
        if order == 3 and mdim == 2:
            nodes.append(np.full(mdim + 1, 1.0 / (mdim + 1)))
        if order == 3 and mdim == 3:
            # one dof per face (barycenter); order matches LOCAL_FACES_3D
            for f in LOCAL_FACES_3D:
                nodes.append(sum(verts[i] for i in f) / 3.0)
    nodes = np.array(nodes)

    if order == 3 and mdim >= 2:
        # rearrange so edge dofs come in pairs per edge: (e0a,e0b,e1a,e1b,...)
        nv = mdim + 1
        ne = len(edges)
        nf = 1 if mdim == 2 else 4   # 2D: cell bubble; 3D: face dofs
        idx = list(range(nv))
        for k in range(ne):
            idx.extend([nv + k, nv + ne + k])
        idx.extend(range(nv + 2 * ne, nv + 2 * ne + nf))
        nodes = nodes[idx]

    # Lagrange basis via Vandermonde in barycentric monomials of degree=order
    from itertools import product as iproduct
    exps = [e for e in iproduct(range(order + 1), repeat=mdim + 1)
            if sum(e) == order]

    def monomials(b):
        # b [Q, m+1] -> [Q, nmono]
        cols = []
        for e in exps:
            c = np.ones(b.shape[0])
            for k, p in enumerate(e):
                if p:
                    c = c * b[:, k] ** p
            cols.append(c)
        return np.stack(cols, axis=1)

    V = monomials(nodes)           # [ndof, nmono]
    assert V.shape[0] == V.shape[1], (V.shape, order, mdim)
    Vinv = np.linalg.inv(V)
    expsArr = np.array(exps, dtype=np.float64)   # [nmono, m+1]

    def phi(b):
        return (monomials(b) @ Vinv).T          # [ndof, Q]

    def dphi(b):
        Q = b.shape[0]
        out = np.zeros((Q, len(exps), mdim + 1))
        for col, e in enumerate(exps):
            for k in range(mdim + 1):
                if e[k] == 0:
                    continue
                c = e[k] * np.ones(Q)
                for kk, p in enumerate(e):
                    pp = p - 1 if kk == k else p
                    if pp:
                        c = c * b[:, kk] ** pp
                out[:, col, k] = c
        # [Q, nmono, m+1] @ Vinv -> per dof
        return np.einsum('qmk,mn->nqk', out, Vinv)

    phi.monomialExps = expsArr
    phi.Vinv = Vinv
    return phi, dphi, nodes


class DoFMap:
    """Maps (cell, local dof) -> global dof; interior >= 0, boundary < 0."""

    polynomialOrder = None

    def __init__(self, mesh: simplexMesh, tag=None):
        self.mesh = mesh
        self.dim = mesh.dim
        mdim = mesh.manifold_dim
        if tag is None:
            tag = PHYSICAL
        self.tag = tag if isinstance(tag, list) else [tag]

        p = self.polynomialOrder
        self.evalPhi, self.evalGradPhi, self.localNodes = \
            _lagrange_shape_functions(p, mdim)

        if p == 0:
            self.dofs_per_vertex = 0
            self.dofs_per_edge = 0
            self.dofs_per_cell = 1
        elif mdim == 1:
            self.dofs_per_vertex = 1
            self.dofs_per_edge = 0
            self.dofs_per_cell = p - 1
        elif mdim == 2:
            self.dofs_per_vertex = 1
            self.dofs_per_edge = p - 1
            self.dofs_per_cell = 1 if p == 3 else 0
        elif mdim == 3:
            self.dofs_per_vertex = 1
            self.dofs_per_edge = p - 1
            self.dofs_per_cell = 0
        self.dofs_per_face = 1 if (mdim == 3 and p == 3) else 0
        nv = mdim + 1
        ne = {1: 0, 2: 3, 3: 6}[mdim]
        nf = 4 if mdim == 3 else 0
        self.dofs_per_element = (nv * self.dofs_per_vertex +
                                 ne * self.dofs_per_edge +
                                 nf * self.dofs_per_face + self.dofs_per_cell)
        assert self.dofs_per_element == self.localNodes.shape[0], \
            (self.dofs_per_element, self.localNodes.shape)

        self._buildDofNumbering()

    # ------------------------------------------------------------- numbering
    def _buildDofNumbering(self):
        """Number dofs: interior >= 0 (cell-traversal order), boundary < 0.

        tag may be:
          - int / list of ints: boundary parts of the mesh with these tags
            carry boundary dofs (ref DoFMaps.pyx:160-180)
          - a callable / function object: a dof is INTERIOR iff
            indicator(node) > 0.5 (used for volume constraints on
            interaction collars, ref DoFMaps.pyx function tags)
        """
        mesh = self.mesh
        mdim = mesh.manifold_dim
        cells = mesh.cells
        nc = mesh.num_cells

        dofs = np.full((nc, self.dofs_per_element), np.iinfo(np.int64).min,
                       dtype=np.int64)

        indicator = None
        tagval = self.tag[0] if len(self.tag) == 1 else None
        if callable(tagval) and not isinstance(tagval, (int, np.integer)):
            indicator = tagval

        if indicator is None:
            bVerts = set(mesh.getBoundaryVerticesByTag(
                None if self.tag == [None] else self.tag).tolist())
            if mdim >= 2 and self.dofs_per_edge > 0:
                bEdges = set(map(tuple, np.sort(mesh.getBoundaryEdgesByTag(
                    None if self.tag == [None] else self.tag), axis=1).tolist()))
            else:
                bEdges = set()
        else:
            # node positions per (cell, localdof)
            V = mesh.vertices[cells]
            pos = np.einsum('jk,ckd->cjd', self.localNodes, V)
            inside = indicator(pos.reshape(-1, mesh.dim)).reshape(nc, -1) > 0.5

        numDoFs = 0
        numBdofs = -1
        vertexDof = {}
        edgeDof = {}
        faceDof = {}

        if mdim >= 2 and self.dofs_per_edge > 0:
            # local edges per cell (order must match localNodes edge order)
            localEdges = [(0, 1), (1, 2), (2, 0)] if mdim == 2 else \
                [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)]
        if mdim == 3 and self.dofs_per_face > 0:
            if indicator is None:
                bFaces = set(map(tuple, np.sort(
                    mesh.boundaryFaces, axis=1).tolist()))

        for i in range(nc):
            k = 0
            if self.dofs_per_vertex:
                for lv in range(mdim + 1):
                    v = int(cells[i, lv])
                    if v not in vertexDof:
                        if indicator is None:
                            isB = v in bVerts
                        else:
                            isB = not inside[i, k]
                        if isB:
                            vertexDof[v] = numBdofs
                            numBdofs -= 1
                        else:
                            vertexDof[v] = numDoFs
                            numDoFs += 1
                    dofs[i, k] = vertexDof[v]
                    k += 1
            if mdim >= 2 and self.dofs_per_edge > 0:
                for le in localEdges:
                    a, b = int(cells[i, le[0]]), int(cells[i, le[1]])
                    key = (min(a, b), max(a, b))
                    flip = a > b  # orientation: dofs stored from low to high vertex
                    if key not in edgeDof:
                        if indicator is None:
                            isB = key in bEdges
                        else:
                            isB = not inside[i, k]
                        if isB:
                            ds = []
                            for _ in range(self.dofs_per_edge):
                                ds.append(numBdofs)
                                numBdofs -= 1
                        else:
                            ds = list(range(numDoFs, numDoFs + self.dofs_per_edge))
                            numDoFs += self.dofs_per_edge
                        edgeDof[key] = ds
                    ds = edgeDof[key]
                    ds_local = ds[::-1] if flip else ds
                    for d in ds_local:
                        dofs[i, k] = d
                        k += 1
            if mdim == 3 and self.dofs_per_face > 0:
                for lf in LOCAL_FACES_3D:
                    tri = tuple(sorted(int(cells[i, v]) for v in lf))
                    if tri not in faceDof:
                        if indicator is None:
                            isB = tri in bFaces
                        else:
                            isB = not inside[i, k]
                        if isB:
                            faceDof[tri] = numBdofs
                            numBdofs -= 1
                        else:
                            faceDof[tri] = numDoFs
                            numDoFs += 1
                    dofs[i, k] = faceDof[tri]
                    k += 1
            for _ in range(self.dofs_per_cell):
                if indicator is None or inside[i, k]:
                    dofs[i, k] = numDoFs
                    numDoFs += 1
                else:
                    dofs[i, k] = numBdofs
                    numBdofs -= 1
                k += 1

        self.dofs = dofs
        self.num_dofs = numDoFs
        self.num_boundary_dofs = -numBdofs - 1

    def cell2dof(self, cellNo, dofNo):
        return int(self.dofs[cellNo, dofNo])

    def jaxEvalPhi(self, bary):
        """Device shape-function evaluation phi[..., ndof] from barycentric
        coordinates bary [..., m+1] (used by cut-cell quadrature where nodes
        are data-dependent)."""
        import jax.numpy as jnp
        if self.polynomialOrder == 0:
            return jnp.ones(bary.shape[:-1] + (1,))
        exps = self.evalPhi.monomialExps          # [nmono, m+1]
        Vinv = self.evalPhi.Vinv                  # [nmono, ndof]
        mono = jnp.prod(bary[..., None, :] **
                        jnp.asarray(exps)[None, :, :], axis=-1)
        return mono @ jnp.asarray(Vinv)

    # ---------------------------------------------------------- interpolation
    def getDoFCoordinates(self):
        """Physical coordinates of interior dofs [num_dofs, dim]."""
        mesh = self.mesh
        coords = np.zeros((self.num_dofs, mesh.dim), dtype=REAL)
        seen = np.zeros(self.num_dofs, dtype=bool)
        V = mesh.vertices[mesh.cells]  # [C, m+1, dim]
        # physical position of local node j in cell c: localNodes[j] @ V[c]
        pos = np.einsum('jk,ckd->cjd', self.localNodes, V)
        d = self.dofs
        mask = d >= 0
        cc, jj = np.nonzero(mask)
        coords[d[cc, jj]] = pos[cc, jj]
        seen[d[cc, jj]] = True
        assert seen.all()
        return coords

    def getBoundaryDoFCoordinates(self):
        mesh = self.mesh
        nB = self.num_boundary_dofs
        coords = np.zeros((nB, mesh.dim), dtype=REAL)
        V = mesh.vertices[mesh.cells]
        pos = np.einsum('jk,ckd->cjd', self.localNodes, V)
        d = self.dofs
        mask = d < 0
        cc, jj = np.nonzero(mask)
        coords[-d[cc, jj] - 1] = pos[cc, jj]
        return coords

    def interpolate(self, fun):
        vals = fun(self.getDoFCoordinates())
        return fe_vector(jnp.asarray(vals), self)

    def zeros(self):
        return fe_vector(jnp.zeros(self.num_dofs, dtype=REAL), self)

    def ones(self):
        return fe_vector(jnp.ones(self.num_dofs, dtype=REAL), self)

    def fromArray(self, data):
        return fe_vector(jnp.asarray(data), self)

    # ------------------------------------------------------------- assembly
    def assembleMass(self, **kwargs):
        from .assembly import assembleMass
        return assembleMass(self, **kwargs)

    def assembleStiffness(self, **kwargs):
        from .assembly import assembleStiffness
        return assembleStiffness(self, **kwargs)

    def assembleRHS(self, fun, qOrder=None):
        from .assembly import assembleRHS
        return assembleRHS(self, fun, qOrder=qOrder)

    def assembleNonlocal(self, kernel, matrixFormat='dense', **kwargs):
        from ..nl.assembly import assembleNonlocal
        return assembleNonlocal(self, kernel, matrixFormat=matrixFormat, **kwargs)

    def getComplementDoFMap(self):
        """DoFMap over the complement: boundary dofs become the interior
        (ref DoFMaps.pyx:1170)."""
        comp = object.__new__(type(self))
        comp.__dict__.update(self.__dict__)
        comp.dofs = -self.dofs - 1  # swap roles
        comp.num_dofs, comp.num_boundary_dofs = \
            self.num_boundary_dofs, self.num_dofs
        return comp

    def getFullDoFMap(self):
        full = type(self)(self.mesh, tag=NO_BOUNDARY)
        return full

    def __eq__(self, other):
        return (type(self) is type(other) and self.mesh is other.mesh and
                self.tag == other.tag)

    def __hash__(self):
        return hash((type(self).__name__, id(self.mesh), tuple(self.tag)))

    def HDF5write(self, grp):
        from ..base.io import dofmapHDF5write
        dofmapHDF5write(self, grp)

    @staticmethod
    def HDF5read(grp):
        from ..base.io import dofmapHDF5read
        return dofmapHDF5read(grp)

    def __repr__(self):
        return (f'<{type(self).__name__} N={self.num_dofs} '
                f'NB={self.num_boundary_dofs} mesh={self.mesh!r}>')


class P0_DoFMap(DoFMap):
    polynomialOrder = 0


class P1_DoFMap(DoFMap):
    polynomialOrder = 1


class P2_DoFMap(DoFMap):
    polynomialOrder = 2


class P3_DoFMap(DoFMap):
    polynomialOrder = 3


str2DoFMap = {'P0': P0_DoFMap, 'P1': P1_DoFMap, 'P2': P2_DoFMap,
              'P3': P3_DoFMap}

dofmapFactory = factory()
for _n, _c in str2DoFMap.items():
    dofmapFactory.register(_n, _c)


class fe_vector:
    """A finite-element coefficient vector bound to its DoFMap."""

    def __init__(self, data, dm):
        self.data = jnp.asarray(data)
        self.dm = dm

    @property
    def shape(self):
        return self.data.shape

    def toarray(self):
        return np.asarray(self.data)

    def inner(self, other, *flags):
        o = other.data if isinstance(other, fe_vector) else jnp.asarray(other)
        return float(jnp.vdot(self.data, o))

    def norm(self):
        return float(jnp.linalg.norm(self.data))

    def __add__(self, other):
        o = other.data if isinstance(other, fe_vector) else other
        return fe_vector(self.data + o, self.dm)

    def __sub__(self, other):
        o = other.data if isinstance(other, fe_vector) else other
        return fe_vector(self.data - o, self.dm)

    def __mul__(self, a):
        return fe_vector(self.data * a, self.dm)

    __rmul__ = __mul__

    def __array__(self, dtype=None, copy=None):
        return np.asarray(self.data)

    def assign(self, other):
        o = other.data if isinstance(other, fe_vector) else jnp.asarray(other)
        self.data = o

    def max(self):
        return float(self.data.max())

    def min(self):
        return float(self.data.min())

    def __abs__(self):
        return fe_vector(jnp.abs(self.data), self.dm)

    def linearPart(self):
        return self

    def __repr__(self):
        return f'<fe_vector n={self.data.shape[0]} dm={type(self.dm).__name__}>'


def interiorToFullMaps(dmInterior):
    """(dmFull, interior->full indices, boundary->full indices): scatter an
    interior vector (plus boundary data) into the NO_BOUNDARY full space
    (replaces ref getFullDoFMap + R/P operators, DoFMaps.pyx:1256)."""
    dmFull = type(dmInterior)(dmInterior.mesh, tag=NO_BOUNDARY)
    nI = dmInterior.num_dofs
    nB = dmInterior.num_boundary_dofs
    i2f = np.full(nI, -1, dtype=np.int64)
    b2f = np.full(nB, -1, dtype=np.int64)
    dI = dmInterior.dofs
    dF = dmFull.dofs
    for c in range(dmInterior.mesh.num_cells):
        for l in range(dI.shape[1]):
            d = dI[c, l]
            f = dF[c, l]
            if d >= 0:
                i2f[d] = f
            else:
                b2f[-d - 1] = f
    assert (i2f >= 0).all() and (nB == 0 or (b2f >= 0).all())
    return dmFull, i2f, b2f
