"""Persistent compile-cache behavior.

The committed warm bench cache (artifacts/bench_cache/, seeded by bench.py)
only works if cache keys are stable across processes AND across cache
directories. jax's default `jax_persistent_cache_enable_xla_caches` bakes an
autotune-cache path derived from the cache dir into debug_options, which the
key hashes without stripping — so the cache-dir path itself changed the key
and cross-process/cross-dir hits were impossible (the r3 "stale cache"
failure). enable_persistent_cache() disables that; these tests pin it.
"""
import subprocess
import sys

from .conftest import REPO_ROOT

_CHILD = r"""
import os, sys, pathlib
d = sys.argv[1]
os.environ['FV2P_JAX_CACHE_DIR'] = d
os.environ['JAX_PLATFORMS'] = 'cpu'
sys.path.insert(0, sys.argv[2])
from fv2p_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
# never gate on absolute compile speed: the tiny program below must always
# produce a cache entry even if a fast CPU compiles it in <0.2s (ADVICE r4)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
@jax.jit
def f(x):
    return jnp.sin(x) @ jnp.cos(x).T
f(jnp.ones((64, 64), jnp.float32)).block_until_ready()
print('\n'.join(sorted(p.name for p in pathlib.Path(d).iterdir())))
"""


def _entries(cache_dir):
    out = subprocess.run(
        [sys.executable, '-c', _CHILD, str(cache_dir), str(REPO_ROOT)],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    return [l for l in out.stdout.splitlines() if l.endswith('-cache')]

def test_xla_caches_disabled():
    import jax
    from fv2p_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    # '' (not the GPU autotune default) — a path-derived debug option would
    # otherwise poison every cache key with the cache-dir path
    assert jax.config.jax_persistent_cache_enable_xla_caches == ''


def test_cache_keys_stable_across_processes_and_dirs(tmp_path):
    a = tmp_path / 'scratch_a'
    b = tmp_path / 'scratch_b'
    a.mkdir(); b.mkdir()
    ents_a = _entries(a)
    ents_b = _entries(b)
    assert ents_a and ents_a == ents_b, (ents_a, ents_b)
