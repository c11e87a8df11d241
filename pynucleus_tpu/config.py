"""Global configuration for the TPU-native nonlocal FEM framework.

The reference library (PyNucleus, see /root/reference/base/PyNucleus_base/myTypes64.pyx:10-13)
fixes REAL=float64, INDEX=int32.  We keep float64 for quadrature and solves
(discretization parity with the reference test caches) and enable JAX x64 at
import time.  Performance-critical paths may downcast locally.
"""
import os

# Must run before any jax array is created.
import jax

jax.config.update("jax_enable_x64", True)
# TPU matmuls default to bfloat16 passes; quadrature tables need true f32
# accumulation (singular-rule weights span many orders of magnitude)
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent XLA compilation cache: the assembly engine compiles one kernel
# per (panel shape, quadrature size) bucket; over the remote-TPU tunnel each
# compile costs 20-40s and dominates cold builds.  The cache survives
# processes, so drivers/benchmarks pay compiles once per mesh size.
_cacheDir = os.environ.get("PYNUCLEUS_TPU_COMPILE_CACHE",
                           os.path.expanduser("~/.cache/pynucleus_tpu_xla"))


def _machineKey():
    """Scope the persistent cache by host CPU fingerprint.

    XLA:CPU AOT executables embed the compile machine's feature set; loading
    them on a different host warns loudly and can SIGILL.  The XLA cache key
    does not include CPU features, so we key the directory instead."""
    import hashlib
    import platform
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha1(f"{platform.machine()}|{feats}".encode()).hexdigest()
    return h[:12]


if _cacheDir:
    _cacheDir = os.path.join(_cacheDir, _machineKey())
    try:
        jax.config.update("jax_compilation_cache_dir", _cacheDir)
        # persist even trivial programs: over the remote-TPU tunnel each
        # compile round-trip costs ~0.3 s regardless of program size
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

import numpy as np
import jax.numpy as jnp

REAL = np.float64
INDEX = np.int32
COMPLEX = np.complex128

JREAL = jnp.float64
JINDEX = jnp.int32
JCOMPLEX = jnp.complex128

# Tag conventions, mirroring the reference's DoF numbering convention
# (fem/PyNucleus_fem/DoFMaps.pyx: interior dofs >= 0, boundary dofs < 0).
PHYSICAL = 1
INTERIOR_NONOVERLAPPING = 2
INTERIOR = 3
NO_BOUNDARY = -1234


def is_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


_WARM_STARTED = []


def warmTransferChannel():
    """Open the device->host transfer channel in a background thread.

    Over the remote-TPU tunnel the FIRST device->host transfer of a process
    costs 17-500 s (measured; later ones ~25 ms).  Kicking it off on a
    daemon thread while host-side setup (tree build, pair enumeration,
    kernel lowering) proceeds makes the cost disappear into the build."""
    if _WARM_STARTED or not is_tpu():
        return
    _WARM_STARTED.append(1)
    import threading

    def _w():
        try:
            np.asarray(jnp.ones(8, jnp.float32))
        except Exception:
            pass

    threading.Thread(target=_w, daemon=True).start()


def toDevice(x, dtype):
    """Transfer host data to device at `dtype`, casting on the HOST.

    `jnp.asarray(np_arr, dtype=...)` with a dtype mismatch jit-compiles a
    per-shape convert_element_type program; over the remote-TPU tunnel each
    trivial compile costs ~0.3 s and their count scales with the number of
    distinct array shapes.  Casting with numpy first makes the transfer
    compile-free.  Device arrays / tracers keep the jnp path."""
    if isinstance(x, (np.ndarray, list, tuple, int, float)):
        return jnp.asarray(np.asarray(x, dtype))
    return jnp.asarray(x, dtype=dtype)
