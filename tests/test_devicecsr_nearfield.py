"""The device-resident CSR near-field path (DeviceCSRAccumulator +
_bucket_tree_csr_scan — the accelerator fast path that the CPU-forced test
suite otherwise never exercises) must produce the same H2 operator as the
host path, cross-checked against dense."""
import numpy as np
import jax.numpy as jnp
import pytest

from pynucleus_tpu.fem import circle, simpleInterval, P1_DoFMap
from pynucleus_tpu.nl import getFractionalKernel
from pynucleus_tpu.nl.assembly import nonlocalBuilder


@pytest.mark.parametrize('dim,noRef', [
    (1, 6),
    # 2d: ~22 s on the CI box -> slow tier (1d covers the device-CSR path)
    pytest.param(2, 3, marks=pytest.mark.slow),
], ids=['1d', '2d'])
def test_devicecsr_h2_matches_dense(dim, noRef):
    m = simpleInterval(-1, 1) if dim == 1 else circle(n=8)
    for _ in range(noRef):
        m = m.refine()
    dm = P1_DoFMap(m)
    k = getFractionalKernel(dim, 0.75)
    H = nonlocalBuilder(dm, k, params={'forceDeviceCSR': True}).getH2()
    Hhost = nonlocalBuilder(dm, k).getH2()
    D = nonlocalBuilder(dm, k).getDense()
    x = jnp.asarray(np.random.default_rng(0).normal(size=dm.num_dofs))
    ref = D @ x
    e = float(jnp.linalg.norm(H.matvec(x) - ref) / jnp.linalg.norm(ref))
    assert e < 1e-5, e
    # device and host accumulators build the same operator (f64 on CPU)
    eh = float(jnp.linalg.norm(H.matvec(x) - Hhost.matvec(x))
               / jnp.linalg.norm(ref))
    assert eh < 1e-12, eh


@pytest.mark.parametrize('env', [
    {},                                     # block near field (default)
    {'PYNUCLEUS_TPU_BLOCK_NEAR': '0'},      # flat device-side enumeration
    {'PYNUCLEUS_TPU_HOST_ENUM': '1'},       # host enumeration fallback
], ids=['block', 'flat-enum', 'host-enum'])
@pytest.mark.parametrize('dim,noRef', [(1, 5), (2, 2)], ids=['1d', '2d'])
def test_near_engines_agree(dim, noRef, env, monkeypatch):
    """The three near-field engines (block MXU path, flat device
    enumeration, host enumeration) build identical operators."""
    for k_, v_ in env.items():
        monkeypatch.setenv(k_, v_)
    m = simpleInterval(-1, 1) if dim == 1 else circle(n=8)
    for _ in range(noRef):
        m = m.refine()
    dm = P1_DoFMap(m)
    k = getFractionalKernel(dim, 0.75)
    H = nonlocalBuilder(dm, k, params={'forceDeviceCSR': True}).getH2()
    Hhost = nonlocalBuilder(dm, k).getH2()
    x = jnp.asarray(np.random.default_rng(0).normal(size=dm.num_dofs))
    ref = Hhost.matvec(x)
    e = float(jnp.linalg.norm(H.matvec(x) - ref) / jnp.linalg.norm(ref))
    assert e < 1e-10, e
