#!/usr/bin/env python3
"""Scale ladder for the 2D fractional H2 build+solve (north-star probe).

Runs getH2 + cg-jacobi solve at increasing refinement and reports per-phase
wall time, far/near sizes, and HBM usage.  Usage:

    python scripts/h2_scale_ladder.py NOREF [NOREF ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def run(noRef):
    import numpy as np
    import jax
    import pynucleus_tpu  # noqa: F401
    from pynucleus_tpu.fem import circle, P1_DoFMap
    from pynucleus_tpu.nl import getFractionalKernel
    from pynucleus_tpu.nl.assembly import nonlocalBuilder
    from pynucleus_tpu.nl.h2 import (buildClusterTree, admissibleClusters,
                                     H2Matrix)

    dev = jax.devices()[0]
    dtype = np.float32 if dev.platform != 'cpu' else np.float64

    t0 = time.time()
    m = circle(n=int(os.environ.get('LADDER_CIRCLE_N', '8')))
    for _ in range(noRef):
        m = m.refine()
    dm = P1_DoFMap(m)
    kernel = getFractionalKernel(2, 0.75)
    print(f'[noRef={noRef}] N={dm.num_dofs} cells={m.num_cells} '
          f'mesh={time.time()-t0:.1f}s', flush=True)

    builder = nonlocalBuilder(dm, kernel, zeroExterior=True,
                              params={'dtype': dtype})

    # --- probe tree + admissibility alone first
    t0 = time.time()
    sing = kernel.max_singularity
    smin = 0.0
    mp_target = 0.5
    loggamma = abs(np.log(0.25))
    mI = max(int(np.ceil((2 * mp_target + max(-sing, 2))
                         * abs(np.log(m.hmin / m.diam)) / loggamma / 3.0)), 2)
    minSize = max(mI ** 2 // 2, 1)
    nodes = buildClusterTree(dm, minSize)
    tTree = time.time() - t0
    t0 = time.time()
    Pfar, Pnear = admissibleClusters(kernel, nodes, 3.0, mI, 2)
    tAdm = time.time() - t0
    nFar = sum(len(v) for v in Pfar.values())
    M = mI ** 2
    farGB = nFar * M * M * 4 / 1e9
    print(f'  m={mI} M={M} nodes={len(nodes)} tree={tTree:.1f}s '
          f'adm={tAdm:.1f}s far={nFar} near={len(Pnear)} '
          f'farK={farGB:.2f}GB', flush=True)

    if os.environ.get('LADDER_PROBE_ONLY'):
        return

    t0 = time.time()
    A = builder.getH2()
    tBuild = time.time() - t0
    print(f'  H2 build={tBuild:.1f}s nearNNZ={A.Anear.nnz if hasattr(A.Anear, "nnz") else "?"}',
          flush=True)

    import jax.numpy as jnp
    x = jnp.ones(dm.num_dofs, dtype=dtype)
    t0 = time.time()
    y = A.matvec(x)
    y.block_until_ready()
    tMv1 = time.time() - t0

    # steady state: device-side normalized power loop (no per-call tunnel
    # latency; this is how CG consumes the operator)
    iters = 64

    @jax.jit
    def loop(A, x):
        def body(i, y):
            y2 = A.matvec(y)
            return y2 / (1e-30 + jnp.max(jnp.abs(y2)))
        return jax.lax.fori_loop(0, iters, body, x)

    y = loop(A, x)
    float(jnp.sum(y))
    t0 = time.time()
    y = loop(A, x)
    float(jnp.sum(y))
    tMv = (time.time() - t0) / iters
    print(f'  matvec first={tMv1:.2f}s steady={tMv*1000:.2f}ms '
          f'(device loop x{iters})', flush=True)

    try:
        stats = dev.memory_stats()
        print(f'  HBM in use: {stats.get("bytes_in_use", 0)/1e9:.2f} GB',
              flush=True)
    except Exception:
        pass

    # solve: cold (includes jit compile) and warm timed separately
    from pynucleus_tpu.base.solvers import (cg_solver,
                                            Diagonal_LinearOperator)
    from pynucleus_tpu.fem.functions import constant
    b = dm.assembleRHS(constant(1.0))
    bD = jnp.asarray(b, dtype=dtype)
    t0 = time.time()
    s = cg_solver(A)
    s.setPreconditioner(Diagonal_LinearOperator(1.0 / A.diagonal))
    s.maxIter = 1000
    s.tolerance = 1e-6
    s.setup()
    u = s.solve(bD)
    u.block_until_ready()
    tCold = time.time() - t0
    t0 = time.time()
    u = s.solve(bD)
    u.block_until_ready()
    tWarm = time.time() - t0
    print(f'  CG-Jacobi solve cold={tCold:.1f}s warm={tWarm:.2f}s '
          f'iters={s.iterations} '
          f'res={s.residuals[-1] if s.residuals else float("nan"):.2e}',
          flush=True)

    if os.environ.get('LADDER_MG'):
        # cg-mg: geometric hierarchy with H2 fine levels, dense coarse
        # (ref drivers/runFractional.py solver default 'cg-mg')
        from pynucleus_tpu.base.solvers import solverFactory
        from pynucleus_tpu.multilevel.gmg import buildProlongation
        t0 = time.time()
        mgMeshes = [circle(n=int(os.environ.get('LADDER_CIRCLE_N', '8')))]
        for _ in range(noRef):
            mgMeshes.append(mgMeshes[-1].refine())
        coarsest = int(os.environ.get('LADDER_MG_COARSE', '2'))
        dms = [P1_DoFMap(mm) for mm in mgMeshes[coarsest:]]
        hierarchy = []
        for lvl, dml in enumerate(dms):
            entry = {}
            if lvl == len(dms) - 1:
                entry['A'] = A
            elif dml.num_dofs < 3000:
                entry['A'] = nonlocalBuilder(
                    dml, kernel, zeroExterior=True,
                    params={'dtype': dtype}).getDense()
            else:
                entry['A'] = nonlocalBuilder(
                    dml, kernel, zeroExterior=True,
                    params={'dtype': dtype}).getH2()
            if lvl > 0:
                P = buildProlongation(dms[lvl - 1], dml, dtype=dtype)
                entry['P'] = P
                entry['R'] = P.T
            hierarchy.append(entry)
        tHier = time.time() - t0
        t0 = time.time()
        smg = solverFactory.build('cg-mg', hierarchy=hierarchy, setup=True)
        smg.maxIter = 200
        smg.tolerance = 1e-6
        u2 = smg.solve(bD)
        u2.block_until_ready()
        tCold2 = time.time() - t0
        t0 = time.time()
        u2 = smg.solve(bD)
        u2.block_until_ready()
        tWarm2 = time.time() - t0
        rel = float(jnp.linalg.norm(u2 - u) / jnp.linalg.norm(u))
        print(f'  CG-MG hier={tHier:.1f}s solve cold={tCold2:.1f}s '
              f'warm={tWarm2:.2f}s iters={smg.iterations} '
              f'res={smg.residuals[-1] if smg.residuals else float("nan"):.2e} '
              f'|u_mg-u_jac|rel={rel:.2e}', flush=True)


if __name__ == '__main__':
    for arg in sys.argv[1:]:
        run(int(arg))
