import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (the driver separately dry-runs multi-chip configs).
# NOTE: this image's sitecustomize force-selects the 'axon' TPU platform, so
# the env var alone is not enough — we must override the jax config directly
# before any backend is initialized.
os.environ['JAX_PLATFORMS'] = 'cpu'
# The persistent compile cache is machine-keyed (config._machineKey) so AOT
# executables from a different host CPU can no longer be loaded (that was the
# earlier segfault: stale cache entries compiled with mismatched machine
# features).  Keep a test-scoped subdir so suite entries don't churn the
# driver/bench cache.
os.environ.setdefault(
    'PYNUCLEUS_TPU_COMPILE_CACHE',
    os.path.expanduser('~/.cache/pynucleus_tpu_xla_tests'))
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import pynucleus_tpu  # noqa: E402,F401  (enables x64)

assert jax.devices()[0].platform == 'cpu'
