"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip hardware
in CI); the real-TPU path is exercised by bench.py / __graft_entry__.py.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    flags = (flags + ' --xla_force_host_platform_device_count=8').strip()
# XLA:CPU spends most of a model-sized compile in LLVM optimization passes a
# single-shot test never amortizes (measured: the full dryrun step 1555 s ->
# 92 s). Tests are compile-dominated on the 1-core CI box; e2e subprocesses
# inherit this via the environment.
if '--xla_backend_optimization_level' not in flags:
    flags = (flags + ' --xla_backend_optimization_level=0').strip()
os.environ['XLA_FLAGS'] = flags

# Persistent compilation cache: model-level tests compile sizeable graphs and
# the CI box is a single core — cache across runs.
import jax

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

# The axon TPU plugin (sitecustomize) force-sets jax_platforms='axon,cpu',
# overriding the env var — tests must run on the virtual-device CPU backend.
jax.config.update('jax_platforms', 'cpu')
