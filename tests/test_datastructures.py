"""Index data structures (ref tests/bitArray.py, tests/tupleDict.py,
sparsityPattern.pyx, sparseGraph.pyx)."""
import numpy as np

from pynucleus_tpu.base.datastructures import (
    bitArray, arrayIndexSet, tupleDictINDEX, sparsityPattern, sparseGraph)


def test_bit_array():
    b = bitArray(10)
    b.set(3)
    b.set(7)
    b.set(15)   # grows
    assert b.inSet(3) and b.inSet(15) and not b.inSet(4)
    assert b.getNumEntries() == 3
    assert b.toSet() == {3, 7, 15}
    b2 = bitArray()
    b2.fromSet({7, 9})
    assert b.union(b2).toSet() == {3, 7, 9, 15}
    assert b.inter(b2).toSet() == {7}
    b.empty()
    assert len(b) == 0


def test_array_index_set():
    s1 = arrayIndexSet([5, 1, 3, 3])
    assert list(s1) == [1, 3, 5]
    s2 = arrayIndexSet([3, 4])
    assert s1.union(s2).toSet() == {1, 3, 4, 5}
    assert s1.inter(s2).toSet() == {3}
    assert s1.setminus(s2).toSet() == {1, 5}
    assert s1.inSet(3) and not s1.inSet(2)


def test_tuple_dict():
    td = tupleDictINDEX(deleteHits=True)
    # refinement edge pairing: first insert returns the value, the second
    # (matching) insert returns the stored value and removes the key
    assert td.enterValue((2, 5), 10) == 10
    assert (2, 5) in td
    assert td.enterValue((2, 5), 99) == 10
    assert (2, 5) not in td
    td2 = tupleDictINDEX()
    td2.enterValue((1, 2), 7)
    assert td2[(1, 2)] == 7 and len(td2) == 1


def test_sparsity_pattern():
    p = sparsityPattern(4)
    p.add(0, 1)
    p.add(0, 1)
    p.add(2, 3)
    p.addMany([1, 1], [0, 2])
    indptr, indices = p.freeze()
    assert list(np.diff(indptr)) == [1, 2, 1, 0]
    assert list(indices) == [1, 0, 2, 3]


def test_sparse_graph():
    import scipy.sparse as sp
    A = sp.csr_matrix(np.array([[0, 1, 0], [0, 0, 1], [0, 0, 0]]))
    g = sparseGraph(A.indices, A.indptr, 3, 3)
    assert g.nnz == 2
    assert g.getDegree(0) == 1
    gt = g.transpose()
    assert list(gt.neighbors(1)) == [0]
    gs = g.symmetrize()
    assert gs.nnz == 4
