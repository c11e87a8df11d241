#!/usr/bin/env python3
"""Distributed partition-first H2 assembly at scale on the 8-virtual-device
CPU mesh: 2D fractional disc at NOREF refinements (default 7 = 65k dofs).

Measures, per device, the restricted near-field assembly wall (the
real-deployment per-host cost is their MAX, since each host assembles its
own rows concurrently; this single-process demo runs them sequentially),
compares against the wrap-a-global-operator path's global build, and
checks matvec parity distributed-vs-single-device.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/dist_assemble_2d.py [NOREF]

(ref nonlocalAssembly pxi:2401 partitionDoFs, :2424 createLocalStuff)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

os.environ.setdefault('XLA_FLAGS',
                      '--xla_force_host_platform_device_count=8')

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np
import jax.numpy as jnp

import pynucleus_tpu  # noqa: F401
from pynucleus_tpu.fem import circle, P1_DoFMap
from pynucleus_tpu.nl import getFractionalKernel
from pynucleus_tpu.nl.assembly import nonlocalBuilder
from pynucleus_tpu.parallel import makeDeviceMesh
from pynucleus_tpu.parallel import dist_h2 as dh2


def main(noRef):
    m = circle(n=8)
    for _ in range(noRef):
        m = m.refine()
    dm = P1_DoFMap(m)
    kernel = getFractionalKernel(2, 0.75)
    nd = len(jax.devices())
    mesh = makeDeviceMesh(nd)
    print(f'N={dm.num_dofs} cells={m.num_cells} devices={nd}', flush=True)

    # instrument the per-device restricted assemblies
    perDev = []
    orig = dh2.DistributedH2Matrix.assemble.__func__

    t0 = time.time()
    builder = nonlocalBuilder(dm, kernel)
    import pynucleus_tpu.nl.assembly as asm
    nf = asm.nonlocalBuilder._assembleNearField

    def timedNF(self, *a, **kw):
        t = time.time()
        r = nf(self, *a, **kw)
        perDev.append(time.time() - t)
        return r

    asm.nonlocalBuilder._assembleNearField = timedNF
    try:
        t0 = time.time()
        Adir = dh2.DistributedH2Matrix.assemble(dm, kernel, mesh)
        tAssemble = time.time() - t0
    finally:
        asm.nonlocalBuilder._assembleNearField = nf
    print(f'partition-first assemble: total={tAssemble:.1f}s  per-device '
          f'restricted near-fields: {[round(t, 1) for t in perDev]}  '
          f'max={max(perDev):.1f}s (real multi-host wall)', flush=True)

    t0 = time.time()
    H = nonlocalBuilder(dm, kernel).getH2()
    tGlobal = time.time() - t0
    t0 = time.time()
    Awrap = dh2.DistributedH2Matrix(H, mesh)
    tWrap = time.time() - t0
    print(f'wrap path: global build={tGlobal:.1f}s + wrap={tWrap:.1f}s',
          flush=True)

    x = jnp.asarray(np.random.RandomState(0).rand(dm.num_dofs))
    yd = np.asarray(Adir.matvec(x))
    ys = np.asarray(H.matvec(x))
    yw = np.asarray(Awrap.matvec(x))
    scale = np.linalg.norm(ys)
    relDS = np.linalg.norm(yd - ys) / scale
    relDW = np.linalg.norm(yd - yw) / scale
    print(f'matvec parity: |dist-assemble - single|/|single| = {relDS:.2e}, '
          f'|dist-assemble - wrap| = {relDW:.2e}', flush=True)
    assert relDS < 1e-9 and relDW < 1e-10
    spd = tGlobal + tWrap
    print(f'summary: per-host wall {max(perDev):.1f}s vs global-then-wrap '
          f'{spd:.1f}s -> {spd / max(perDev):.1f}x', flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 7)
