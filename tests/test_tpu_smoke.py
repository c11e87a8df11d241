"""On-TPU accuracy smoke (VERDICT r2 item 10 / r3 weak #7): assemble and
solve the 1D fractional Poisson problem in float32 ON THE REAL CHIP and
assert the same pinned accuracy as tests/test_f32_path.py.

The suite pins JAX_PLATFORMS=cpu (conftest), so this test launches a clean
subprocess without the pin.  It is opt-in (slow, needs the TPU tunnel):

    PYNUCLEUS_RUN_TPU_TESTS=1 pytest tests/test_tpu_smoke.py -m tpu
"""
import os
import subprocess
import sys

import pytest

_BODY = r"""
import numpy as np
import jax
import jax.numpy as jnp
import pynucleus_tpu
from pynucleus_tpu.fem import simpleInterval, P1_DoFMap, assembleRHS, constant
from pynucleus_tpu.nl import getFractionalKernel
from pynucleus_tpu.base.solvers import solverFactory
from pynucleus_tpu.nl.assembly import nonlocalBuilder

assert jax.devices()[0].platform != 'cpu', jax.devices()
m = simpleInterval(-1.0, 1.0)
for _ in range(6):
    m = m.refine()
dm = P1_DoFMap(m)
kernel = getFractionalKernel(1, 0.75)
A = nonlocalBuilder(dm, kernel, params={'dtype': np.float32}).getDense()
b = assembleRHS(dm, constant(1.0))
cg = solverFactory.build('cg', A=A, setup=True)
cg.tolerance = 1e-6
cg.maxIter = 500
u = cg.solve(jnp.asarray(np.asarray(b.data, dtype=np.float32)))
from scipy.special import gamma
s = 0.75
xs = np.asarray(dm.getDoFCoordinates())[:, 0]
uex = (2.0 ** (-2 * s) * np.sqrt(np.pi)
       / (gamma(s + 0.5) * gamma(1.0 + s))) * (1 - xs ** 2) ** s
err = float(np.abs(np.asarray(u) - uex).max())
print('TPU_SMOKE_ERR', err)
assert err < 2e-3, err
"""


@pytest.mark.tpu
@pytest.mark.slow
def test_tpu_f32_accuracy_smoke():
    if not os.environ.get('PYNUCLEUS_RUN_TPU_TESTS'):
        pytest.skip('opt-in: set PYNUCLEUS_RUN_TPU_TESTS=1 (needs the TPU)')
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    env['JAX_PLATFORMS'] = 'axon,tpu'
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, '-c', _BODY], env=env, cwd=here,
                       capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if 'TPU_SMOKE_ERR' in ln]
    assert line, r.stdout[-500:]
    err = float(line[0].split()[-1])
    assert err < 2e-3, err
