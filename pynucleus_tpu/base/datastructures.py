"""Low-level index data structures.

Counterpart of /root/reference/base/PyNucleus_base/{tupleDict.pyx,
intTuple.pyx, sparsityPattern.pyx, sparseGraph.pyx, bitArray (linalg)}:
the reference uses hand-rolled C hash maps and bitsets inside its assembly
loops; here the assembly is vectorized, so these classes serve the same
API surface with numpy-backed implementations (set algebra, pattern
freezing) for host-side setup logic.
"""
import numpy as np
import scipy.sparse as sp

__all__ = ['bitArray', 'arrayIndexSet', 'tupleDictINDEX', 'sparsityPattern',
           'sparseGraph']


class bitArray:
    """Fixed-size bitset over [0, maxElement) (ref bitArray usage in
    tests/bitArray.py)."""

    def __init__(self, maxElement=0):
        self.maxElement = maxElement
        self._bits = np.zeros(maxElement, dtype=bool)

    def set(self, i):
        if i >= self.maxElement:
            grown = np.zeros(i + 1, dtype=bool)
            grown[:self.maxElement] = self._bits
            self._bits = grown
            self.maxElement = i + 1
        self._bits[i] = True

    def inSet(self, i):
        return bool(0 <= i < self.maxElement and self._bits[i])

    def fromSet(self, s):
        for i in s:
            self.set(int(i))

    def toSet(self):
        return set(np.nonzero(self._bits)[0].tolist())

    def toArray(self):
        return np.nonzero(self._bits)[0].astype(np.int64)

    def union(self, other):
        n = max(self.maxElement, other.maxElement)
        out = bitArray(n)
        out._bits[:self.maxElement] |= self._bits
        out._bits[:other.maxElement] |= other._bits
        return out

    def inter(self, other):
        n = min(self.maxElement, other.maxElement)
        out = bitArray(max(self.maxElement, other.maxElement))
        out._bits[:n] = self._bits[:n] & other._bits[:n]
        return out

    def getNumEntries(self):
        return int(self._bits.sum())

    def empty(self):
        self._bits[:] = False

    def __len__(self):
        return self.getNumEntries()


class arrayIndexSet:
    """Sorted index set (ref arrayIndexSet): set algebra over int arrays."""

    def __init__(self, indices=None):
        self.indices = np.unique(np.asarray(indices, dtype=np.int64)) \
            if indices is not None else np.zeros(0, dtype=np.int64)

    def fromSet(self, s):
        self.indices = np.array(sorted(int(i) for i in s), dtype=np.int64)
        return self

    def toSet(self):
        return set(self.indices.tolist())

    def toArray(self):
        return self.indices

    def inSet(self, i):
        pos = np.searchsorted(self.indices, i)
        return bool(pos < len(self.indices) and self.indices[pos] == i)

    def union(self, other):
        return arrayIndexSet(np.union1d(self.indices, other.indices))

    def inter(self, other):
        return arrayIndexSet(np.intersect1d(self.indices, other.indices))

    def setminus(self, other):
        return arrayIndexSet(np.setdiff1d(self.indices, other.indices))

    def getNumEntries(self):
        return len(self.indices)

    def __len__(self):
        return len(self.indices)

    def __iter__(self):
        return iter(self.indices.tolist())


class tupleDictINDEX:
    """Map keyed by (cell, cell) tuples -> int (ref tupleDict_INDEX;
    used for edge lookup during refinement and mask management)."""

    def __init__(self, num_dofs=0, deleteHits=False, logicalAndHits=False,
                 length_inc=0):
        self._d = {}
        self.deleteHits = deleteHits

    def enterValue(self, e, val):
        """Insert; if the key exists return the stored value (and delete it
        when deleteHits, mirroring the refinement edge pairing)."""
        key = (int(e[0]), int(e[1]))
        if key in self._d:
            old = self._d[key]
            if self.deleteHits:
                del self._d[key]
            return old
        self._d[key] = val
        return val

    def __contains__(self, e):
        return (int(e[0]), int(e[1])) in self._d

    def __getitem__(self, e):
        return self._d[(int(e[0]), int(e[1]))]

    def __len__(self):
        return len(self._d)

    def items(self):
        return self._d.items()


class sparsityPattern:
    """Dynamic sparsity builder: add (i, j) entries, then freeze to CSR
    (ref sparsityPattern.pyx:115 freeze)."""

    def __init__(self, num_dofs):
        self.num_dofs = num_dofs
        self._rows = []
        self._cols = []

    def add(self, i, j):
        self._rows.append(i)
        self._cols.append(j)

    def addMany(self, ii, jj):
        self._rows.append(np.asarray(ii, dtype=np.int64))
        self._cols.append(np.asarray(jj, dtype=np.int64))

    def freeze(self):
        """-> (indptr, indices) with sorted, deduplicated columns."""
        rows = np.concatenate([np.atleast_1d(r) for r in self._rows]) \
            if self._rows else np.zeros(0, dtype=np.int64)
        cols = np.concatenate([np.atleast_1d(c) for c in self._cols]) \
            if self._cols else np.zeros(0, dtype=np.int64)
        A = sp.coo_matrix((np.ones(len(rows)), (rows, cols)),
                          shape=(self.num_dofs, self.num_dofs)).tocsr()
        A.sum_duplicates()
        A.sort_indices()
        return A.indptr, A.indices


class sparseGraph:
    """CSR-shaped graph with transpose/symmetrize (ref sparseGraph.pyx)."""

    def __init__(self, indices, indptr, num_rows, num_columns):
        self.indices = np.asarray(indices, dtype=np.int64)
        self.indptr = np.asarray(indptr, dtype=np.int64)
        self.num_rows = num_rows
        self.num_columns = num_columns

    @property
    def nnz(self):
        return len(self.indices)

    def to_scipy(self):
        return sp.csr_matrix((np.ones(self.nnz), self.indices, self.indptr),
                             shape=(self.num_rows, self.num_columns))

    def transpose(self):
        T = self.to_scipy().T.tocsr()
        return sparseGraph(T.indices, T.indptr, self.num_columns,
                           self.num_rows)

    def symmetrize(self):
        S = self.to_scipy()
        S = ((S + S.T) > 0).tocsr()
        return sparseGraph(S.indices, S.indptr, self.num_rows,
                           self.num_columns)

    def getDegree(self, i):
        return int(self.indptr[i + 1] - self.indptr[i])

    def neighbors(self, i):
        return self.indices[self.indptr[i]:self.indptr[i + 1]]
