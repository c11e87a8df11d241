"""Measured CPU baseline for the assembly benchmark.

The Cython reference (/root/reference) cannot be built in this image (no
Cython, no mpi4py), so the baseline is ``native/ref_pair_loop.cpp``: a C++
reimplementation of the reference's per-element-pair dense-assembly hot loop
(nonlocalAssembly_{SCALAR}.pxi:1387-1450) driven with the SAME pair lists and
quadrature tables as our assembly, compiled with g++ -O3 -march=native and
timed on this container's CPU.  Cython compiles to C with the same loop
structure, so this is the closest measurable stand-in for "the reference on
this machine".
"""
import ctypes
import os
import subprocess
import time

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_HERE, 'native', 'ref_pair_loop.cpp')
_SO = os.path.join(_HERE, 'native', 'ref_pair_loop.so')


def buildBaselineLib():
    """Compile the baseline loop (cached on mtime)."""
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) > os.path.getmtime(_SRC)):
        return _SO
    subprocess.run(['g++', '-O3', '-march=native', '-shared', '-fPIC',
                    '-o', _SO, _SRC], check=True)
    return _SO


def timeReferencePairLoop(dm, kernel, info, repeats=1):
    """Time the C++ per-pair loop over the SAME distant buckets our assembly
    runs (same pair lists, same tensor quadrature tables, same scatter).

    Returns (seconds, nPairsTimed)."""
    from .nl.quad_singular import distantRule
    lib = ctypes.CDLL(buildBaselineLib())
    fn = lib.assemble_distant_bucket
    fn.restype = ctypes.c_double
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_ip = ctypes.POINTER(ctypes.c_int64)
    fn.argtypes = [ctypes.c_int64, c_ip, c_ip, c_dp, c_ip, c_ip, c_dp,
                   ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                   c_dp, c_dp, c_dp, ctypes.c_int, c_dp,
                   ctypes.c_double, ctypes.c_double, c_dp]

    mesh = dm.mesh
    N = dm.num_dofs
    dim = mesh.dim
    mdim = mesh.manifold_dim
    dpe = dm.dofs_per_element
    vertices = np.ascontiguousarray(mesh.vertices, dtype=np.float64)
    cells = np.ascontiguousarray(mesh.cells, dtype=np.int64)
    dofs = np.ascontiguousarray(dm.dofs, dtype=np.int64)
    vols = np.ascontiguousarray(mesh.simplexVolumes(), dtype=np.float64)
    A = np.zeros((N + 1) * (N + 1), dtype=np.float64)

    s = float(kernel.sValue)
    Cnorm = float(kernel.scalingValue) if hasattr(kernel, 'scalingValue') \
        else 1.0
    exponent = -(mdim / 2.0 + s)

    di, dj, orders = info['distant']
    nPairs = len(di)

    def run():
        tot = 0.0
        for order in np.unique(orders):
            sel = orders == order
            ii = np.ascontiguousarray(di[sel], dtype=np.int64)
            jj = np.ascontiguousarray(dj[sel], dtype=np.int64)
            rule = distantRule(int(order), mdim)
            PSI = np.ascontiguousarray(
                rule.buildPSI(dm, nSharedVertices=0), dtype=np.float64)
            bx = np.ascontiguousarray(rule.bary_x, dtype=np.float64)
            by = np.ascontiguousarray(rule.bary_y, dtype=np.float64)
            w = np.ascontiguousarray(rule.w, dtype=np.float64)
            Q = rule.num_nodes
            t0 = time.perf_counter()
            fn(len(ii),
               ii.ctypes.data_as(c_ip), jj.ctypes.data_as(c_ip),
               vertices.ctypes.data_as(c_dp),
               cells.ctypes.data_as(c_ip), dofs.ctypes.data_as(c_ip),
               vols.ctypes.data_as(c_dp), N, dpe, mdim + 1, dim,
               bx.ctypes.data_as(c_dp), by.ctypes.data_as(c_dp),
               w.ctypes.data_as(c_dp), Q, PSI.ctypes.data_as(c_dp),
               exponent, Cnorm, A.ctypes.data_as(c_dp))
            tot += time.perf_counter() - t0
        return tot

    best = min(run() for _ in range(repeats))
    return best, nPairs
