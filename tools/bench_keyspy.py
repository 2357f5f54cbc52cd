"""Run bench.py with a persistent-cache spy: logs every cache lookup's
module name, key, hit/miss and read time to stderr, without changing bench
behavior. Ground truth for 'will the driver bench warm-hit?'.

Usage: python tools/bench_keyspy.py
"""
import runpy
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# patch must land before bench.py triggers any compile: bench.py imports jax
# inside main(), so importing jax here first and patching is safe
from jax._src import compiler  # noqa: E402

_orig = compiler._cache_read


def _spy(module_name, cache_key, compile_options, backend,
         executable_devices):
    t0 = time.monotonic()
    exe, secs = _orig(module_name, cache_key, compile_options, backend,
                      executable_devices)
    dt = time.monotonic() - t0
    print(f'# CACHE {"HIT " if exe is not None else "MISS"} {cache_key} '
          f'read={dt:.1f}s', file=sys.stderr, flush=True)
    return exe, secs


compiler._cache_read = _spy

sys.argv = ['bench.py']
runpy.run_path(str(REPO / 'bench.py'), run_name='__main__')
