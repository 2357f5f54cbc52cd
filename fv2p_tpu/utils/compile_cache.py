"""Persistent XLA compilation cache.

The flagship programs take many minutes to compile cold (the round-1 bench
tail recorded a 901 s compile). Enabling jax's on-disk compilation cache
makes every second run of the same program — repeated bench runs, ``--eval_all``
watcher iterations, training restarts, and the test suite — hit the cache and
skip HLO->LLO compilation entirely.

Call ``enable_persistent_cache()`` before the first ``jax.jit`` execution in
every entry point (bench.py, tools/train.py, tools/test.py, tests/conftest.py).
"""
import os
from pathlib import Path

_DEFAULT_DIR = Path(__file__).resolve().parents[2] / '.jax_cache'

# resolved by enable_persistent_cache so seed_from_committed always targets
# the SAME directory (a caller passing cache_dir= to one but not the other
# would otherwise seed a dir jax never reads)
_RESOLVED_DIR = None


def enable_persistent_cache(cache_dir=None):
    """Point jax at an on-disk compilation cache (idempotent).

    The cache dir can be overridden with env FV2P_JAX_CACHE_DIR; set it to
    the empty string to disable.
    """
    global _RESOLVED_DIR
    env = os.environ.get('FV2P_JAX_CACHE_DIR')
    if env == '':
        _RESOLVED_DIR = None
        return None
    path = Path(env) if env else (Path(cache_dir) if cache_dir else _DEFAULT_DIR)
    path.mkdir(parents=True, exist_ok=True)

    import jax
    jax.config.update('jax_compilation_cache_dir', str(path))
    # default min-compile-time gate is 1 s; our test-suite programs are
    # mostly 0.1-5 s compiles, and caching them is the whole point
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.2)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    # jax defaults jax_persistent_cache_enable_xla_caches to the GPU-only
    # per-fusion autotune cache, whose directory is derived from THIS cache
    # dir and baked into debug_options — which the cache key hashes without
    # stripping. Net effect: the cache-dir PATH poisons every key, so two
    # processes (or a scratch dir vs the default dir) can never share
    # entries. That is the real reason the r3 committed bench cache "went
    # stale": entries harvested from a tmp scratch could not hit from
    # .jax_cache by construction. The feature is meaningless on TPU —
    # disable it so keys depend only on program + compiler + topology.
    jax.config.update('jax_persistent_cache_enable_xla_caches', '')
    _RESOLVED_DIR = path
    return path


def seed_from_committed(cache_dir=None):
    """Copy committed warm-cache entries (artifacts/bench_cache/, produced by
    tools/warm_bench_cache.py) into the live cache dir so first-run bench /
    CI programs skip the multi-minute cold compile. No-op if absent. Call
    after :func:`enable_persistent_cache` (whose resolved directory wins over
    any cache_dir passed here)."""
    src = Path(__file__).resolve().parents[2] / 'artifacts' / 'bench_cache'
    if not src.is_dir():
        return 0
    env = os.environ.get('FV2P_JAX_CACHE_DIR')
    if env == '':
        return 0
    if _RESOLVED_DIR is not None:
        dst = _RESOLVED_DIR
    else:
        dst = Path(env) if env else (Path(cache_dir) if cache_dir else _DEFAULT_DIR)
    dst.mkdir(parents=True, exist_ok=True)
    n = 0
    for f in src.iterdir():
        target = dst / f.name
        if f.is_file() and not target.exists():
            import shutil
            shutil.copyfile(f, target)
            n += 1
    return n
