"""Phase-level profile of the dense 2D fractional assembly on the attached
device: classification (host), grid passes (device), bucket corrections
(device), accumulator finalize.  Run with BENCH_NOREF=5/6/7."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import pynucleus_tpu  # noqa: F401
from pynucleus_tpu.fem import circle, P1_DoFMap
from pynucleus_tpu.nl import getFractionalKernel
from pynucleus_tpu.nl.assembly import nonlocalBuilder


def main():
    noRef = int(os.environ.get('BENCH_NOREF', '5'))
    m = circle(n=8)
    for _ in range(noRef):
        m = m.refine()
    dm = P1_DoFMap(m)
    kernel = getFractionalKernel(2, 0.75)
    C = m.num_cells
    nPairs = C * (C + 1) // 2
    print(f'device={jax.devices()[0].platform} cells={C} dofs={dm.num_dofs} '
          f'pairs={nPairs/1e6:.1f}M', flush=True)
    dev = jax.devices()[0]
    dtype = np.float32 if dev.platform != 'cpu' else np.float64

    from pynucleus_tpu.nl.panels import classifyPairsDenseGrid

    for it in range(2):
        t0 = time.perf_counter()
        b = nonlocalBuilder(dm, kernel, params={'dtype': dtype})
        info = classifyPairsDenseGrid(dm, kernel)
        t1 = time.perf_counter()
        A = b.getDense()
        jax.block_until_ready(A.data)
        t2 = time.perf_counter()
        print(f'iter{it}: classifyGrid={t1-t0:.3f}s total_dense={t2-t1:.3f}s '
              f'rate={nPairs/(t2-t1)/1e6:.2f}M pairs/s', flush=True)
        stats = getattr(b, '_gridStats', None)
        print(f'  gridStats={stats}', flush=True)


if __name__ == '__main__':
    main()
