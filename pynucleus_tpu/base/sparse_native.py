"""ctypes bindings for the native sparse-factorization kernels
(native/sparse_factor.cpp): incomplete Cholesky + triangular solves.

Counterpart of /root/reference/base/PyNucleus_base/linalg.pyx
(ichol_csr :44, forward/backward solves :201-300); the reference builds
these as Cython extensions, here they are a small C++ library compiled on
first use (g++ is in the image; no pip/pybind involved)."""
import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_HERE, 'native', 'sparse_factor.cpp')
_SO = os.path.join(_HERE, 'native', 'sparse_factor.so')

_lib = None


def _getLib():
    global _lib
    if _lib is not None:
        return _lib
    if not (os.path.exists(_SO)
            and os.path.getmtime(_SO) > os.path.getmtime(_SRC)):
        subprocess.run(['g++', '-O3', '-march=native', '-shared', '-fPIC',
                        '-o', _SO, _SRC], check=True)
    lib = ctypes.CDLL(_SO)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int64)
    lib.ichol_csr.restype = ctypes.c_int64
    lib.ichol_csr.argtypes = [ctypes.c_int64, ip, ip, dp, ip, ip, dp, dp]
    lib.forward_solve_lower.restype = None
    lib.forward_solve_lower.argtypes = [ctypes.c_int64, ip, ip, dp, dp,
                                        dp, dp]
    lib.backward_solve_lower_t.restype = None
    lib.backward_solve_lower_t.argtypes = [ctypes.c_int64, ip, ip, dp, dp,
                                           dp, dp]
    _lib = lib
    return lib


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class IChol:
    """IC(0) factors of a symmetric positive definite CSR matrix
    (A ~ L L^T on tril(A)'s sparsity).  apply() performs
    x = L^{-T} L^{-1} b."""

    def __init__(self, indptr, indices, data, n, shift=0.0):
        lib = _getLib()
        self.n = n
        indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        data = np.ascontiguousarray(data, dtype=np.float64)
        rows = np.repeat(np.arange(n), np.diff(indptr))
        lower = int((indices < rows).sum())
        self.Lindptr = np.zeros(n + 1, dtype=np.int64)
        self.Lindices = np.zeros(max(lower, 1), dtype=np.int64)
        self.Ldata = np.zeros(max(lower, 1), dtype=np.float64)
        self.diag = np.zeros(n, dtype=np.float64)
        attempt = data
        for k in range(8):
            rc = lib.ichol_csr(n, _ip(indptr), _ip(indices), _dp(attempt),
                               _ip(self.Lindptr), _ip(self.Lindices),
                               _dp(self.Ldata), _dp(self.diag))
            if rc == 0:
                return
            # breakdown: diagonal shift (standard remedy) and retry
            shift = max(2.0 * shift, 1e-3)
            attempt = data.copy()
            diagMask = indices == rows
            attempt[diagMask] *= (1.0 + shift)
        raise RuntimeError('ichol breakdown persists after shifts')

    def apply(self, b):
        lib = _getLib()
        b = np.ascontiguousarray(b, dtype=np.float64)
        y = np.zeros(self.n, dtype=np.float64)
        x = np.zeros(self.n, dtype=np.float64)
        lib.forward_solve_lower(self.n, _ip(self.Lindptr),
                                _ip(self.Lindices), _dp(self.Ldata),
                                _dp(self.diag), _dp(b), _dp(y))
        lib.backward_solve_lower_t(self.n, _ip(self.Lindptr),
                                   _ip(self.Lindices), _dp(self.Ldata),
                                   _dp(self.diag), _dp(y), _dp(x))
        return x
