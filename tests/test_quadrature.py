"""Compact symmetric simplex rules (the Xiao-Gimbutas/Jaskowiec-Sukumar
role of ref quadrature.pyx:521, js_data.py): exactness + point economy."""
from itertools import product

import numpy as np

from pynucleus_tpu.fem.quadrature import (simplexCompact, simplexDuffy,
                                          simplexXiaoGimbutas,
                                          _exactSimplexMonomial)


def _checkExact(bary, w, order, mdim, tol=1e-12):
    x = bary[:, 1:]
    for exps in product(range(order + 1), repeat=mdim):
        if sum(exps) > order:
            continue
        got = float((w * np.prod(x ** np.asarray(exps), axis=1)).sum())
        assert abs(got - _exactSimplexMonomial(exps)) < tol, (exps, got)


def test_triangle_rules_exact():
    for o in range(1, 9):
        b, w = simplexCompact(o, 2)
        _checkExact(b, w, o, 2)


def test_tet_rules_exact():
    for o in range(1, 4):
        b, w = simplexCompact(o, 3)
        _checkExact(b, w, o, 3)


def test_fallback_to_duffy_beyond_tables():
    b, w = simplexCompact(12, 2)
    bd, wd = simplexDuffy(12, 2)
    assert len(w) == len(wd)
    _checkExact(b, w, 12, 2)


def test_point_economy():
    """The tables must beat the Duffy tensor rule (that is their point)."""
    for o in (2, 4, 6, 8):
        assert len(simplexCompact(o, 2)[1]) < len(simplexDuffy(o, 2)[1])
    for o in (2, 3):
        assert len(simplexCompact(o, 3)[1]) < len(simplexDuffy(o, 3)[1])


def test_parity_alias():
    assert simplexXiaoGimbutas is simplexCompact


def test_distant_rule_uses_compact():
    from pynucleus_tpu.nl.quad_singular import distantRule
    r = distantRule(4, 2)
    assert r.w.shape[0] == 6 * 6            # Dunavant order-4 squared
    # weights integrate 1 x 1 exactly
    assert np.isclose(r.w.sum(), 1.0)
