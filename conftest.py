"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip hardware
in CI); the real-TPU path is exercised by bench.py / __graft_entry__.py.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

# Persistent compilation cache: model-level tests compile sizeable graphs and
# the CI box is a single core — cache across runs.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_cc')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
os.environ.setdefault(
    'JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '0')
