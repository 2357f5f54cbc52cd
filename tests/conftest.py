"""Test harness: run everything on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware.

Note: the environment's sitecustomize pre-imports jax and forces
``jax_platforms='axon,cpu'`` (remote TPU). We override back to pure CPU here,
before any backend is initialized, so tests are hermetic and fast.
"""
import os

xla_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

jax.config.update('jax_platforms', 'cpu')

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from fv2p_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

assert jax.devices()[0].platform == 'cpu', jax.devices()
