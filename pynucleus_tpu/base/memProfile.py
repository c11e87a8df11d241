"""Memory snapshots for timers and drivers.

Counterpart of /root/reference/base/PyNucleus_base/memProfile.py: host RSS
via /proc (no psutil dependency in this image) plus device (HBM) live-buffer
totals from the JAX client when available.
"""
import os

__all__ = ['memoryUsage', 'deviceMemoryUsage', 'memorySnapshot']


def memoryUsage():
    """Resident set size of this process in MB."""
    try:
        with open('/proc/self/statm') as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf('SC_PAGE_SIZE') / 1024.0 ** 2
    except Exception:
        return float('nan')


def deviceMemoryUsage():
    """Total bytes of live device buffers in MB (per device dict)."""
    out = {}
    try:
        import jax
        for d in jax.live_arrays():
            dev = str(d.devices() if hasattr(d, 'devices') else 'dev')
            out[dev] = out.get(dev, 0.0) + d.nbytes / 1024.0 ** 2
    except Exception:
        pass
    return out


def memorySnapshot(label='', logger=None):
    """One-line host+device memory report; returns the string."""
    host = memoryUsage()
    dev = deviceMemoryUsage()
    devTotal = sum(dev.values())
    msg = '{}host RSS {:.1f} MB, device buffers {:.1f} MB'.format(
        (label + ': ') if label else '', host, devTotal)
    if logger is not None:
        logger.info(msg)
    return msg
