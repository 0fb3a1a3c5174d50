"""Test configuration: run everything on CPU with 8 virtual devices.

This emulates a pod slice in CI (the multi-device tests exercise real
jax.sharding meshes over these virtual devices), something the reference's
test suite never had. The XLA flag must be set before the first backend
initialization; the platform override goes through jax.config because the
environment may pin JAX_PLATFORMS to a hardware plugin.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache makes repeated test runs much faster.
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_test_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)


# Make the repo importable regardless of pytest's invocation directory.
import sys as _sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in _sys.path:
  _sys.path.insert(0, _REPO)
