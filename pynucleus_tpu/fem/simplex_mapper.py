"""Vertex/edge/face enumeration within simplices.

Counterpart of /root/reference/fem/PyNucleus_fem/simplexMapper.pyx: local
sub-entity orderings of 1/2/3D simplices and lookup of a sub-entity's local
index within a cell (used by dof numbering and refinement logic).
"""
import numpy as np

__all__ = ['simplexMapper', 'LOCAL_EDGES_2D', 'LOCAL_EDGES_3D',
           'LOCAL_FACES_3D']

LOCAL_EDGES_2D = np.array([[0, 1], [1, 2], [2, 0]])
LOCAL_EDGES_3D = np.array([[0, 1], [1, 2], [2, 0], [0, 3], [1, 3], [2, 3]])
LOCAL_FACES_3D = np.array([[0, 1, 2], [0, 1, 3], [1, 2, 3], [2, 0, 3]])


class simplexMapper:
    """Sub-entity enumeration for a mesh's cells."""

    def __init__(self, mesh=None, dim=None):
        self.dim = mesh.manifold_dim if mesh is not None else dim
        self.mesh = mesh

    def getNumEdgesPerCell(self):
        return {1: 1, 2: 3, 3: 6}[self.dim]

    def getNumFacesPerCell(self):
        return {1: 0, 2: 0, 3: 4}[self.dim]

    def localEdges(self):
        if self.dim == 2:
            return LOCAL_EDGES_2D
        if self.dim == 3:
            return LOCAL_EDGES_3D
        return np.array([[0, 1]])

    def localFaces(self):
        assert self.dim == 3
        return LOCAL_FACES_3D

    def getEdgesOfCell(self, cellNo):
        cell = self.mesh.cells[cellNo]
        return cell[self.localEdges()]

    def getFacesOfCell(self, cellNo):
        cell = self.mesh.cells[cellNo]
        return cell[self.localFaces()]

    def findEdgeInCell(self, cellNo, edge):
        """Local edge index whose (sorted) global vertices match `edge`."""
        e = tuple(sorted(int(v) for v in edge))
        for k, le in enumerate(self.getEdgesOfCell(cellNo)):
            if tuple(sorted(int(v) for v in le)) == e:
                return k
        return -1

    def findFaceInCell(self, cellNo, face):
        f = tuple(sorted(int(v) for v in face))
        for k, lf in enumerate(self.getFacesOfCell(cellNo)):
            if tuple(sorted(int(v) for v in lf)) == f:
                return k
        return -1

    def findVertexInCell(self, cellNo, vertexNo):
        cell = self.mesh.cells[cellNo]
        pos = np.nonzero(cell == vertexNo)[0]
        return int(pos[0]) if len(pos) else -1
