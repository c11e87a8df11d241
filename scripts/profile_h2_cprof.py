"""cProfile of getH2 (prints stats even when interrupted by SIGINT)."""
import cProfile
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

if os.environ.get('H2_CPU'):
    jax.config.update('jax_platforms', 'cpu')

import pynucleus_tpu  # noqa: F401
from pynucleus_tpu.fem import circle, P1_DoFMap
from pynucleus_tpu.nl import getFractionalKernel
from pynucleus_tpu.nl.assembly import nonlocalBuilder


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
    b = nonlocalBuilder(dm, kernel, params={'dtype': dtype})
    pr = cProfile.Profile()
    try:
        pr.enable()
        b.getH2()
        pr.disable()
        print('COMPLETED', flush=True)
    except KeyboardInterrupt:
        pr.disable()
        print('INTERRUPTED', flush=True)
    st = pstats.Stats(pr)
    st.sort_stats('cumulative').print_stats(35)


if __name__ == '__main__':
    main()
