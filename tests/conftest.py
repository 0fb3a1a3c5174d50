"""Test configuration: run everything on CPU with 8 virtual devices.

This emulates a pod slice in CI (the multi-device tests exercise real
jax.sharding meshes over these virtual devices), something the reference's
test suite never had. Must run before the first jax import.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')
