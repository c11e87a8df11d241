"""Trilinos-style distributed index maps and import/export.

Counterpart of /root/reference/base/PyNucleus_base/io.pyx: `Map` (:16),
`DistributedMap` (:85), `Import` (:140), `DistMatrix` (:239),
`DistVector` (:326).  The MPI communicator becomes a device count; owned
index sets are padded to a common length so every exchange is a static
gather (what XLA wants), and the import is a single device-wide take.
"""
import numpy as np
import jax.numpy as jnp

from ..config import INDEX

__all__ = ['Map', 'Import', 'DistVector', 'DistMatrix']


class Map:
    """Partition of [0, numGlobal) over nParts owners
    (ref io.pyx:16-84).  ownedIdx is a padded [nParts, maxOwned] int array
    with -1 fill."""

    def __init__(self, ownedIdx, numGlobal):
        self.nParts = len(ownedIdx)
        self.numGlobal = numGlobal
        self.counts = np.array([len(o) for o in ownedIdx])
        self.maxOwned = int(self.counts.max()) if self.nParts else 0
        self.ownedIdx = np.full((self.nParts, self.maxOwned), -1,
                                dtype=np.int64)
        for p, o in enumerate(ownedIdx):
            self.ownedIdx[p, :len(o)] = np.sort(np.asarray(o))
        # owner of each global index
        self.owner = np.full(numGlobal, -1, dtype=np.int64)
        for p in range(self.nParts):
            self.owner[self.ownedIdx[p, :self.counts[p]]] = p

    @staticmethod
    def blockDistribution(numGlobal, nParts):
        """Contiguous block partition (ref Map default layout)."""
        bounds = np.linspace(0, numGlobal, nParts + 1).astype(np.int64)
        return Map([np.arange(bounds[p], bounds[p + 1])
                    for p in range(nParts)], numGlobal)

    def getLocalNumElements(self, part):
        return int(self.counts[part])

    def getGlobalElement(self, part, lid):
        return int(self.ownedIdx[part, lid])

    def getLocalElement(self, part, gid):
        pos = np.searchsorted(self.ownedIdx[part, :self.counts[part]], gid)
        if pos < self.counts[part] and \
                self.ownedIdx[part, pos] == gid:
            return int(pos)
        return -1

    def __repr__(self):
        return '<Map {} over {} parts>'.format(self.numGlobal, self.nParts)


class DistVector:
    """Vector laid out as padded per-part blocks [nParts, maxOwned]
    (ref io.pyx:326 DistVector)."""

    def __init__(self, map_, data=None):
        self.map = map_
        if data is None:
            data = jnp.zeros((map_.nParts, map_.maxOwned))
        self.data = data

    @staticmethod
    def fromGlobal(map_, x):
        x = np.asarray(x)
        out = np.zeros((map_.nParts, map_.maxOwned), dtype=x.dtype)
        for p in range(map_.nParts):
            n = map_.counts[p]
            out[p, :n] = x[map_.ownedIdx[p, :n]]
        return DistVector(map_, jnp.asarray(out))

    def toGlobal(self):
        x = np.zeros(self.map.numGlobal)
        d = np.asarray(self.data)
        for p in range(self.map.nParts):
            n = self.map.counts[p]
            x[self.map.ownedIdx[p, :n]] = d[p, :n]
        return x


class Import:
    """Import values for a target map from a source-distributed vector
    (ref io.pyx:140 Import): the exchange pattern is a STATIC gather
    (srcPart, srcSlot) per target slot, compiled once."""

    def __init__(self, sourceMap, targetMap):
        assert sourceMap.numGlobal == targetMap.numGlobal
        self.sourceMap = sourceMap
        self.targetMap = targetMap
        T, S = targetMap, sourceMap
        gatherPart = np.zeros((T.nParts, T.maxOwned), dtype=np.int64)
        gatherSlot = np.zeros((T.nParts, T.maxOwned), dtype=np.int64)
        for p in range(T.nParts):
            for l in range(T.counts[p]):
                g = T.ownedIdx[p, l]
                sp = S.owner[g]
                gatherPart[p, l] = sp
                gatherSlot[p, l] = S.getLocalElement(sp, g)
        self.gatherPart = jnp.asarray(gatherPart, dtype=INDEX)
        self.gatherSlot = jnp.asarray(gatherSlot, dtype=INDEX)

    def apply(self, distVec):
        """DistVector on sourceMap -> DistVector on targetMap (one take)."""
        vals = distVec.data[self.gatherPart, self.gatherSlot]
        return DistVector(self.targetMap, vals)

    __call__ = apply


class DistMatrix:
    """Row-distributed matrix: per-part row blocks of the global operator
    with a block-padded matvec y_p = A_p @ x_global
    (ref io.pyx:239 DistMatrix)."""

    def __init__(self, A, rowMap):
        self.rowMap = rowMap
        arr = jnp.asarray(A.toarray() if hasattr(A, 'toarray') else A)
        blocks = np.zeros((rowMap.nParts, rowMap.maxOwned, arr.shape[1]))
        a = np.asarray(arr)
        for p in range(rowMap.nParts):
            n = rowMap.counts[p]
            blocks[p, :n] = a[rowMap.ownedIdx[p, :n]]
        self.blocks = jnp.asarray(blocks)

    def matvec(self, xGlobal):
        """Global x -> DistVector of owned row results."""
        y = jnp.einsum('pmn,n->pm', self.blocks, jnp.asarray(xGlobal))
        return DistVector(self.rowMap, y)
