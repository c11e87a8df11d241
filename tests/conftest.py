import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (the driver separately dry-runs multi-chip configs).
# NOTE: this image's sitecustomize force-selects the 'axon' TPU platform, so
# the env var alone is not enough — we must override the jax config directly
# before any backend is initialized.
os.environ['JAX_PLATFORMS'] = 'cpu'
# CPU compiles are fast; the persistent compile-cache writer has segfaulted
# under pytest (zstd write inside put_executable_and_time), so disable it.
os.environ['PYNUCLEUS_TPU_COMPILE_CACHE'] = ''
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import pynucleus_tpu  # noqa: E402,F401  (enables x64)

assert jax.devices()[0].platform == 'cpu'
