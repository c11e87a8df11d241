"""Mesh and dofmap splitting for multi-domain problems.

Counterpart of /root/reference/fem/PyNucleus_fem/splitting.pyx
(meshSplitter:20, dofmapSplitter:178) and the restriction/prolongation
helpers in DoFMaps.pyx:2340-2440.  Everything is host-side numpy; the
resulting 0/1 restriction matrices are small and feed the dense interface
solves."""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..config import REAL, INDEX
from .meshes import simplexMesh, NO_BOUNDARY

__all__ = ['meshSplitter', 'dofmapSplitter']


def _selectionMatrix(rows, cols, numRows, numCols):
    return sp.coo_matrix((np.ones(len(rows)), (rows, cols)),
                         shape=(numRows, numCols)).tocsr()


class meshSplitter:
    """Split a mesh into submeshes by cell-barycenter indicators (a cell is
    selected iff indicator(barycenter) > 0.5, matching the reference's P0
    dofmap test)."""

    def __init__(self, mesh, indicators):
        self.mesh = mesh
        self.indicators = indicators
        self.selectedCells = {}
        self.submeshes = {}
        self.vertexMaps = {}

    def getSubMesh(self, label):
        if label not in self.submeshes:
            ind = self.indicators[label]
            centers = self.mesh.vertices[self.mesh.cells].mean(axis=1)
            vals = np.asarray([float(np.asarray(ind(c)).ravel()[0])
                               for c in centers])
            selected = np.nonzero(vals > 0.5)[0].astype(np.int64)
            self.selectedCells[label] = selected
            cells = self.mesh.cells[selected]
            usedV, inv = np.unique(cells.reshape(-1), return_inverse=True)
            newCells = inv.reshape(cells.shape).astype(INDEX)
            self.vertexMaps[label] = usedV
            self.submeshes[label] = simplexMesh(
                self.mesh.vertices[usedV], newCells, dim=self.mesh.dim)
        return self.submeshes[label]

    def getSubMap(self, label, dm):
        """Sub dofmap on the submesh, preserving the parent's
        interior/boundary split; interior dofs renumbered in traversal order
        over the selected cells (ref splitting.pyx:56-78)."""
        subMesh = self.getSubMesh(label)
        sub = type(dm)(subMesh, tag=NO_BOUNDARY)
        subDofs = np.full_like(sub.dofs, np.iinfo(np.int64).min)
        nextDof, nextB = 0, -1
        assigned = {}
        for subCellNo, cellNo in enumerate(self.selectedCells[label]):
            for dofNo in range(dm.dofs_per_element):
                dof = int(dm.dofs[cellNo, dofNo])
                if dof not in assigned:
                    if dof >= 0:
                        assigned[dof] = nextDof
                        nextDof += 1
                    else:
                        assigned[dof] = nextB
                        nextB -= 1
                subDofs[subCellNo, dofNo] = assigned[dof]
        sub.dofs = subDofs
        sub.num_dofs = nextDof
        sub.num_boundary_dofs = -nextB - 1
        return sub

    def getRestrictionProlongation(self, label, dm, subDm):
        """R [num_sub, num_global] 0/1; P = R^T (ref DoFMaps.pyx:2387)."""
        rows, cols = [], []
        seen = set()
        for subCellNo, cellNo in enumerate(self.selectedCells[label]):
            for dofNo in range(dm.dofs_per_element):
                dof = int(dm.dofs[cellNo, dofNo])
                sdof = int(subDm.dofs[subCellNo, dofNo])
                if dof >= 0 and sdof >= 0 and sdof not in seen:
                    seen.add(sdof)
                    rows.append(sdof)
                    cols.append(dof)
        R = _selectionMatrix(rows, cols, subDm.num_dofs, dm.num_dofs)
        return R, R.T.tocsr()


class dofmapSplitter:
    """Split an existing dofmap by dof-node indicators: the sub-map keeps the
    same mesh but only dofs with indicator(node) > 0.5 stay interior
    (ref splitting.pyx:178-233)."""

    def __init__(self, dm, indicators):
        self.dm = dm
        self.indicators = indicators
        self.submaps = {}

    def getSubMap(self, label):
        if label not in self.submaps:
            self.submaps[label] = type(self.dm)(
                self.dm.mesh, tag=self.indicators[label])
        return self.submaps[label]

    def getRestrictionProlongation(self, label):
        sub = self.getSubMap(label)
        dm = self.dm
        rows, cols = [], []
        seen = set()
        for cellNo in range(dm.mesh.num_cells):
            for dofNo in range(dm.dofs_per_element):
                dof = int(dm.dofs[cellNo, dofNo])
                sdof = int(sub.dofs[cellNo, dofNo])
                if dof >= 0 and sdof >= 0 and sdof not in seen:
                    seen.add(sdof)
                    rows.append(sdof)
                    cols.append(dof)
        R = _selectionMatrix(rows, cols, sub.num_dofs, dm.num_dofs)
        return R, R.T.tocsr()
