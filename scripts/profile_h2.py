"""Profile H2 assembly + matvec at scale (north-star: 2D fractional, ~1M
dofs, BASELINE.md).  Usage: python scripts/profile_h2.py [nRef] [cpu|tpu]."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

nRef = int(sys.argv[1]) if len(sys.argv) > 1 else 5
plat = sys.argv[2] if len(sys.argv) > 2 else 'cpu'
if plat == 'cpu':
    import jax
    jax.config.update('jax_platforms', 'cpu')

import numpy as np                                           # noqa: E402
import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402
import pynucleus_tpu as pn                                   # noqa: E402
from pynucleus_tpu.fem import meshFactory, dofmapFactory     # noqa: E402
from pynucleus_tpu.nl.kernels import getFractionalKernel     # noqa: E402
from pynucleus_tpu.nl.assembly import nonlocalBuilder        # noqa: E402

mesh = meshFactory('square', N=2, ax=-1, ay=-1, bx=1, by=1)
for _ in range(nRef):
    mesh = mesh.refine()
dm = dofmapFactory('P1', mesh)
print(f'cells={mesh.num_cells} dofs={dm.num_dofs} platform={jax.devices()[0].platform}')

kernel = getFractionalKernel(2, s=0.75)
dtype = np.float32 if jax.devices()[0].platform != 'cpu' else np.float64
builder = nonlocalBuilder(dm, kernel, params={'dtype': dtype})

import cProfile, pstats                                      # noqa: E402
t0 = time.time()
prof = cProfile.Profile()
prof.enable()
A = builder.getH2()
prof.disable()
t1 = time.time()
print(f'getH2: {t1 - t0:.2f}s')
st = pstats.Stats(prof)
st.sort_stats('cumulative').print_stats(25)

x = jnp.asarray(np.random.RandomState(0).rand(dm.num_dofs))
y = A.matvec(x)
jax.block_until_ready(y)
t2 = time.time()
for _ in range(5):
    y = A.matvec(x)
jax.block_until_ready(y)
t3 = time.time()
print(f'matvec (compiled): {(t3 - t2) / 5 * 1e3:.2f} ms')
