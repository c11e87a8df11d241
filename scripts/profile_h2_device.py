"""Per-launch DEVICE timing of the H2 build: block after every launch."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

if os.environ.get('H2_CPU'):
    jax.config.update('jax_platforms', 'cpu')

import pynucleus_tpu  # noqa: F401
from pynucleus_tpu.fem import circle, P1_DoFMap
from pynucleus_tpu.nl import getFractionalKernel
from pynucleus_tpu.nl import assembly as asm


def main():
    noRef = int(os.environ.get('BENCH_H2_NOREF2D', '6'))
    m = circle(n=8)
    for _ in range(noRef):
        m = m.refine()
    dm = P1_DoFMap(m)
    kernel = getFractionalKernel(2, 0.75)
    dev = jax.devices()[0]
    dtype = np.float32 if dev.platform != 'cpu' else np.float64
    print(f'device={dev.platform} cells={m.num_cells} dofs={dm.num_dofs}',
          flush=True)

    orig_launch = asm._launch
    T0 = time.perf_counter()

    def stamp(name, fn):
        def wrap(*a, **kw):
            t0 = time.perf_counter()
            r = fn(*a, **kw)
            print(f'  [t={time.perf_counter()-T0:8.1f}] HOST {name} '
                  f'{time.perf_counter()-t0:8.2f}s', flush=True)
            return r
        return wrap
    import pynucleus_tpu.nearfield_native as nfn
    nfn.enumerateNearPairs = stamp('enumNear', nfn.enumerateNearPairs)
    asm.nonlocalBuilder._assembleNearField = stamp(
        'assembleNearField', asm.nonlocalBuilder._assembleNearField)
    asm.nonlocalBuilder._runNearDistantTree = stamp(
        'runNearDistantTree', asm.nonlocalBuilder._runNearDistantTree)
    asm.nonlocalBuilder._runPairBuckets = stamp(
        'runPairBuckets', asm.nonlocalBuilder._runPairBuckets)
    asm.nonlocalBuilder._runUnionSurface = stamp(
        'runUnionSurface', asm.nonlocalBuilder._runUnionSurface)
    asm.DeviceCSRAccumulator.maskedSlots = stamp(
        'maskedSlots', asm.DeviceCSRAccumulator.maskedSlots)

    def launch(fn, *args, _statics=None, **kw):
        t0 = time.perf_counter()
        r = orig_launch(fn, *args, _statics=_statics, **kw)
        try:
            jax.block_until_ready(r)
        except Exception:
            pass
        dt = time.perf_counter() - t0
        shapes = [getattr(a, 'shape', None) for a in args[:4]]
        print(f'  [t={time.perf_counter()-T0:8.1f}] '
              f'{getattr(fn, "__name__", fn)} {dt:8.2f}s '
              f'shapes={shapes}', flush=True)
        return r
    asm._launch = launch

    t0 = time.perf_counter()
    b = asm.nonlocalBuilder(dm, kernel, params={'dtype': dtype})
    H = b.getH2()
    print(f'build total={time.perf_counter()-t0:.2f}s', flush=True)


if __name__ == '__main__':
    main()
