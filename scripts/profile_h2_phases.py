"""Phase timers inside getH2 via monkeypatching."""
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

if os.environ.get('H2_CPU'):
    jax.config.update('jax_platforms', 'cpu')

import pynucleus_tpu  # noqa: F401
from pynucleus_tpu.fem import circle, P1_DoFMap
from pynucleus_tpu.nl import getFractionalKernel
from pynucleus_tpu.nl import assembly as asm
from pynucleus_tpu.nl import h2 as h2mod

times = defaultdict(float)
counts = defaultdict(int)


def timed(name, fn):
    def wrap(*a, **kw):
        t0 = time.perf_counter()
        r = fn(*a, **kw)
        try:
            jax.block_until_ready(r)
        except Exception:
            pass
        times[name] += time.perf_counter() - t0
        counts[name] += 1
        return r
    return wrap


def main():
    noRef = int(os.environ.get('BENCH_H2_NOREF2D', '6'))
    m = circle(n=8)
    for _ in range(noRef):
        m = m.refine()
    dm = P1_DoFMap(m)
    kernel = getFractionalKernel(2, 0.75)
    dev = jax.devices()[0]
    dtype = np.float32 if dev.platform != 'cpu' else np.float64

    for mod, name in [(h2mod, 'buildClusterTree'),
                      (h2mod, 'admissibleClusters'),
                      (h2mod, 'batchedChebyshevGrids'),
                      (h2mod, 'batchedLagrangeEval')]:
        setattr(mod, name, timed(name, getattr(mod, name)))
    for name in ['_assembleNearField', '_makeRules', '_runCutPairs',
                 'planH2', '_runNearDistantTree', '_runNearBlocks',
                 '_runNearDistantDeviceEnum', '_runUnionSurface',
                 '_runPairBuckets']:
        setattr(asm.nonlocalBuilder, name,
                timed(name, getattr(asm.nonlocalBuilder, name)))
    asm._farFieldBlocks = timed('_farFieldBlocks', asm._farFieldBlocks)
    from pynucleus_tpu.nl import panels
    panels.classifyPairList = timed('classifyPairList', panels.classifyPairList)
    try:
        asm.classifyPairList = panels.classifyPairList
    except Exception:
        pass
    for name in ['run', 'runNatural', 'runNaturalMaskedCSR', 'runRowsScan']:
        setattr(asm._BucketRunner, name,
                timed('bucket.' + name, getattr(asm._BucketRunner, name)))

    print(f'device={dev.platform} cells={m.num_cells} dofs={dm.num_dofs}',
          flush=True)
    nIter = int(os.environ.get('H2_PROFILE_ITERS', '2'))
    for it in range(nIter):
        times.clear()
        counts.clear()
        t0 = time.perf_counter()
        b = asm.nonlocalBuilder(dm, kernel, params={'dtype': dtype})
        H = b.getH2()
        try:
            jax.block_until_ready(H.Anear.dataZ)
        except Exception:
            pass
        tot = time.perf_counter() - t0
        print(f'iter{it}: build total={tot:.2f}s', flush=True)
        for k in sorted(times, key=lambda k: -times[k]):
            print(f'  {k:28s} {times[k]:8.2f}s  x{counts[k]}', flush=True)
    import jax.numpy as jnp
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=dm.num_dofs).astype(dtype))
    jax.block_until_ready(H.matvec(x))
    ts = []
    for _ in range(5):
        t1 = time.perf_counter()
        jax.block_until_ready(H.matvec(x))
        ts.append(time.perf_counter() - t1)
    print(f'matvec={min(ts)*1000:.1f}ms', flush=True)


if __name__ == '__main__':
    main()
