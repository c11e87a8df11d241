"""runNonlocalInterface regression tests (reference caches
cache_runNonlocalInterface.py--domaindoubleInterval--*).  The two-domain
interface assembly matches the reference to 5-7 digits; the cache tolerance
is rTol 1e-2."""
import numpy as np
import pytest

from drivers.runNonlocalInterface import main as runInterface


CACHES = {
    ('indicator', 'indicator', 0.2): (0.0017838334098848234,
                                      0.001783833409885085),
    ('indicator', 'indicator', 0.4): (0.0018003588615792473,
                                      0.0023101990389448736),
    ('indicator', 'fractional', 0.2): (0.0017591556706459599,
                                       0.0016001773438801912),
    ('indicator', 'fractional', 0.4): (0.001755760052429605,
                                       0.0020256157432627666),
    ('fractional', 'fractional', 0.2): (0.0016469739773018997,
                                        0.0015787413951850128),
    ('fractional', 'fractional', 0.4): (0.0016458100986975937,
                                        0.0019851544819771963),
}


def _check(k1, k2, h2):
    d = runInterface(['--domain', 'doubleInterval', '--kernel1Type', k1,
                      '--kernel2Type', k2, '--s11', '0.2', '--s12', '0.2',
                      '--s21', '0.4', '--s22', '0.4', '--horizon1', '0.2',
                      '--horizon2', str(h2),
                      '--problem', 'exact-sin-variableSolJump-fluxJump'])
    got = d.outputGroups['results'].toDict()
    e1, e2 = CACHES[(k1, k2, h2)]
    assert np.isclose(got['domain1L2err'], e1, rtol=1e-2), got
    assert np.isclose(got['domain2L2err'], e2, rtol=1e-2), got


def test_indicator_indicator():
    _check('indicator', 'indicator', 0.2)


def test_patch():
    d = runInterface(['--domain', 'doubleInterval', '--kernel1Type',
                      'indicator', '--kernel2Type', 'indicator',
                      '--horizon1', '0.2', '--horizon2', '0.2',
                      '--problem', 'patch-test'])
    got = d.outputGroups['results'].toDict()
    assert got['domain1L2err'] < 1e-12, got
    assert got['domain2L2err'] < 1e-12, got


@pytest.mark.slow
@pytest.mark.parametrize('k1,k2,h2', [
    ('indicator', 'indicator', 0.4),
    ('indicator', 'fractional', 0.2),
    ('indicator', 'fractional', 0.4),
    ('fractional', 'fractional', 0.2),
    ('fractional', 'fractional', 0.4),
])
def test_interface(k1, k2, h2):
    _check(k1, k2, h2)
