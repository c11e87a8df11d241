"""The C++ near-field enumerator must emit exactly the same
(cell pair, cluster pair, quadrature order) stream as the vectorized numpy
fallback (nl/assembly._runNearDistantTree emitChunk)."""
import numpy as np
import pytest

import pynucleus_tpu.nearfield_native as nfn
from pynucleus_tpu.fem import circle, simpleInterval, P1_DoFMap
from pynucleus_tpu.nl import getFractionalKernel
from pynucleus_tpu.nl import assembly as asm
from pynucleus_tpu.nl.h2 import buildClusterTree, admissibleClusters


@pytest.mark.parametrize('dim,noRef', [(1, 7), (2, 4)], ids=['1d', '2d'])
def test_native_matches_numpy(dim, noRef, monkeypatch):
    if nfn._lib() is None:
        pytest.skip('no native toolchain')
    m = simpleInterval(-1, 1) if dim == 1 else circle(n=8)
    for _ in range(noRef):
        m = m.refine()
    dm = P1_DoFMap(m)
    k = getFractionalKernel(dim, 0.75)
    b = asm.nonlocalBuilder(dm, k)
    captured = []

    def capLaunch(self, acc, runner, order, lo, hi, Inid, Jnid, offF, offB,
                  *a, **kw):
        captured.append((int(order), lo.copy(), hi.copy(), Inid.copy(),
                         Jnid.copy()))

    monkeypatch.setattr(asm.nonlocalBuilder, '_launchTreeBucket', capLaunch)
    monkeypatch.setattr(asm.nonlocalBuilder, '_runPairBuckets',
                        lambda self, acc, info, maskLookup=None: None)
    monkeypatch.setattr(asm.nonlocalBuilder, '_runUnionSurface',
                        lambda self, acc, *a, **kw: None)
    monkeypatch.setattr(asm.nonlocalBuilder, '_addZeroExterior',
                        lambda self, acc, sign=1.0: None)
    nodes = buildClusterTree(dm, 12)
    Pfar, Pnear = admissibleClusters(k, nodes, 3.0 if dim == 2 else 1.0,
                                     5, dim)

    results = {}
    for mode in ('native', 'numpy'):
        captured.clear()
        if mode == 'numpy':
            monkeypatch.setattr(nfn, '_BROKEN', True)
            monkeypatch.setattr(nfn, '_LIB', None)
        b._assembleNearField(Pnear, nodes)
        results[mode] = sorted(
            (o, tuple(l.tolist()), tuple(h.tolist()),
             tuple(I.tolist()), tuple(J.tolist()))
            for (o, l, h, I, J) in captured)
    assert results['native'] == results['numpy']
    assert sum(len(x[1]) for x in results['native']) > 0
