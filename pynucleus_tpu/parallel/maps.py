"""Trilinos-style distributed index maps and import/export.

Counterpart of /root/reference/base/PyNucleus_base/io.pyx: `Map` (:16),
`DistributedMap` (:85), `Import` (:140), `DistMatrix` (:239),
`DistVector` (:326).  The MPI communicator becomes a device count; owned
index sets are padded to a common length so every exchange is a static
gather (what XLA wants), and the import is a single device-wide take.
Setup is vectorized (no per-element Python), and `DistMatrix` keeps CSR
operators sparse per part instead of densifying row blocks.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..config import INDEX, toDevice as _jd

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
        # owner and local slot of each global index (vectorized fill)
        self.owner = np.full(numGlobal, -1, dtype=np.int64)
        self.slot = np.full(numGlobal, -1, dtype=np.int64)
        valid = self.ownedIdx >= 0
        rows = np.broadcast_to(np.arange(self.nParts)[:, None],
                               self.ownedIdx.shape)
        slots = np.broadcast_to(np.arange(self.maxOwned)[None, :],
                                self.ownedIdx.shape)
        self.owner[self.ownedIdx[valid]] = rows[valid]
        self.slot[self.ownedIdx[valid]] = slots[valid]

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
        if self.owner[gid] == part:
            return int(self.slot[gid])
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
        valid = map_.ownedIdx >= 0
        out = np.zeros((map_.nParts, map_.maxOwned), dtype=x.dtype)
        out[valid] = x[map_.ownedIdx[valid]]
        return DistVector(map_, jnp.asarray(out))

    def toGlobal(self):
        x = np.zeros(self.map.numGlobal)
        d = np.asarray(self.data)
        valid = self.map.ownedIdx >= 0
        x[self.map.ownedIdx[valid]] = d[valid]
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
        g = T.ownedIdx
        valid = g >= 0
        gc = np.clip(g, 0, S.numGlobal - 1)
        gatherPart = np.where(valid, S.owner[gc], 0)
        gatherSlot = np.where(valid, S.slot[gc], 0)
        self.gatherPart = _jd(gatherPart, INDEX)
        self.gatherSlot = _jd(gatherSlot, INDEX)

    def apply(self, distVec):
        """DistVector on sourceMap -> DistVector on targetMap (one take)."""
        vals = distVec.data[self.gatherPart, self.gatherSlot]
        return DistVector(self.targetMap, vals)

    __call__ = apply


class DistMatrix:
    """Row-distributed matrix: per-part row blocks with a block-padded
    matvec y_p = A_p @ x_global (ref io.pyx:239 DistMatrix).

    CSR operators stay SPARSE per part (padded nnz triples + a vmapped
    segment-sum matvec); only genuinely dense operators store dense
    blocks."""

    def __init__(self, A, rowMap):
        self.rowMap = rowMap
        P, R = rowMap.nParts, rowMap.maxOwned
        if hasattr(A, 'rowids') and getattr(A, 'rowids', None) is not None:
            rowids = np.asarray(A.rowids)
            cols = np.asarray(A.indices)
            data = np.asarray(A.data)
            pOf = rowMap.owner[rowids]
            slotOf = rowMap.slot[rowids]
            cnt = np.bincount(pOf, minlength=P)
            maxNnz = max(int(cnt.max()), 1)
            nr = np.full((P, maxNnz), R, dtype=np.int64)       # ghost row
            nc = np.zeros((P, maxNnz), dtype=np.int64)
            nd = np.zeros((P, maxNnz), dtype=data.dtype)
            srt = np.argsort(pOf, kind='stable')
            ps = pOf[srt]
            starts = np.searchsorted(ps, np.arange(P))
            pos = np.arange(len(rowids)) - starts[ps]
            nr[ps, pos] = slotOf[srt]
            nc[ps, pos] = cols[srt]
            nd[ps, pos] = data[srt]
            self._csr = (_jd(nr, INDEX),
                         _jd(nc, INDEX), jnp.asarray(nd))
            self.blocks = None
            R_ = R

            @jax.jit
            def mv(csr, x):
                nr_, nc_, nd_ = csr
                return jax.vmap(lambda r, c, d: jax.ops.segment_sum(
                    d * x[c], r, num_segments=R_ + 1)[:R_])(nr_, nc_, nd_)

            self._mv = mv
        else:
            arr = np.asarray(A.toarray() if hasattr(A, 'toarray') else A)
            valid = rowMap.ownedIdx >= 0
            blocks = np.zeros((P, R, arr.shape[1]), dtype=arr.dtype)
            blocks[valid] = arr[rowMap.ownedIdx[valid]]
            self.blocks = jnp.asarray(blocks)
            self._csr = None

    def matvec(self, xGlobal):
        """Global x -> DistVector of owned row results."""
        x = jnp.asarray(xGlobal)
        if self._csr is not None:
            y = self._mv(self._csr, x)
        else:
            y = jnp.einsum('pmn,n->pm', self.blocks, x)
        return DistVector(self.rowMap, y)
