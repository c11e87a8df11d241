"""ctypes driver for native/nearfield_enum.cpp — the C++ near-field
cell-pair enumerator (expansion + within-cluster-pair dedup + touching
exclusion + quadrature-order model).  ~20 ns/pair vs ~1 us/pair for the
vectorized numpy path; falls back silently if the toolchain is missing.

Reference counterpart: the per-cluster-pair cell loops of assembleClusters
(nonlocalAssembly_{SCALAR}.pxi:1663-1840)."""
import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_HERE, 'native', 'nearfield_enum.cpp')
_SO = os.path.join(_HERE, 'native', 'nearfield_enum.so')
_LIB = None
_BROKEN = False


def _lib():
    global _LIB, _BROKEN
    if _LIB is not None or _BROKEN:
        return _LIB
    try:
        if not (os.path.exists(_SO)
                and os.path.getmtime(_SO) > os.path.getmtime(_SRC)):
            subprocess.run(['g++', '-O3', '-march=native', '-shared',
                            '-fPIC', '-o', _SO, _SRC], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.nearfield_enumerate.restype = ctypes.c_int64
        lib.nearfield_enumerate.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,            # IJr, IJc
            ctypes.c_int64, ctypes.c_int64,              # p0, p1
            ctypes.c_void_p, ctypes.c_void_p,            # ncOff, ncArr
            ctypes.c_void_p, ctypes.c_int64,             # adjKeys, nAdj
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,  # centers,C,dim
            ctypes.c_void_p,                             # logh
            ctypes.c_int32, ctypes.c_float, ctypes.c_float,   # mdim,sval,s2
            ctypes.c_float, ctypes.c_float,              # cOrder, logH0
            ctypes.c_void_p, ctypes.c_void_p,            # outLo, outHi
            ctypes.c_void_p, ctypes.c_void_p,            # outPix, outOrd
            ctypes.c_int64,                              # cap
        ]
        _LIB = lib
    except Exception:                                    # noqa: BLE001
        _BROKEN = True
    return _LIB


def enumerateNearPairs(rIp, rJp, p0, p1, ncOff, ncArr, adjKeys,
                       centers, logh, manifold_dim, sval, s2, cOrder,
                       logH0, cap, C):
    """Returns (lo, hi, pidx, orders) int arrays, or None if the native
    library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    rIp = np.ascontiguousarray(rIp, dtype=np.int64)
    rJp = np.ascontiguousarray(rJp, dtype=np.int64)
    ncOff = np.ascontiguousarray(ncOff, dtype=np.int64)
    ncArr = np.ascontiguousarray(ncArr, dtype=np.int64)
    adjKeys = np.ascontiguousarray(adjKeys, dtype=np.int64)
    centers = np.ascontiguousarray(centers, dtype=np.float64)
    logh = np.ascontiguousarray(logh, dtype=np.float32)
    outLo = np.empty(cap, dtype=np.int32)
    outHi = np.empty(cap, dtype=np.int32)
    outPix = np.empty(cap, dtype=np.int32)
    outOrd = np.empty(cap, dtype=np.int32)
    n = lib.nearfield_enumerate(
        rIp.ctypes.data, rJp.ctypes.data,
        ctypes.c_int64(int(p0)), ctypes.c_int64(int(p1)),
        ncOff.ctypes.data, ncArr.ctypes.data,
        adjKeys.ctypes.data, ctypes.c_int64(len(adjKeys)),
        centers.ctypes.data, ctypes.c_int64(int(C)),
        ctypes.c_int32(centers.shape[1]),
        logh.ctypes.data,
        ctypes.c_int32(int(manifold_dim)), ctypes.c_float(float(sval)),
        ctypes.c_float(float(s2)), ctypes.c_float(float(cOrder)),
        ctypes.c_float(float(logH0)),
        outLo.ctypes.data, outHi.ctypes.data,
        outPix.ctypes.data, outOrd.ctypes.data,
        ctypes.c_int64(int(cap)))
    if n < 0:
        raise RuntimeError('nearfield_enumerate capacity overflow')
    n = int(n)
    return outLo[:n], outHi[:n], outPix[:n], outOrd[:n]
