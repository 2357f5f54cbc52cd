"""Verify from a clean process that the committed warm compile cache HITS.

BENCH_r03 recorded a 620 s MGAF compile despite "seeded 7 committed
warm-cache entries". Root cause (r4): jax's default
`jax_persistent_cache_enable_xla_caches` baked the cache-dir path into the
key (see fv2p_tpu/utils/compile_cache.py), so cross-process hits were
impossible. That is fixed; this tool is the regression check.

It verifies the DRIVER'S OWN scenario end to end: run ``bench.py`` — the
exact process the driver invokes — against a fresh scratch cache seeded
only from ``artifacts/bench_cache/``, then assert

  1. NO new ``jit_infer`` entries appeared (both flagship infer programs
     were pure cache hits), and
  2. each flagship compile took < 60 s (a hit is ~5-15 s incl. cache
     deserialization; a cold miss is ~30-90 s; the r3 anomaly was 620 s).

Reproducing the bench programs in-process is NOT equivalent: a program
containing Pallas kernels hashes differently when traced after a different
preceding trace sequence (name-uniquing state feeds the kernel payload), so
only bench.py itself can produce/verify bench.py's keys. Keep this tool and
tools/warm_bench_cache.py as the matched produce/verify pair.

Run on the real chip after tools/warm_bench_cache.py whenever the flagship
programs change. Exit code 0 = cache verified.

Usage:  python tools/verify_warm_cache.py
"""
import os
import re
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

COMPILE_BOUND_S = 60.0


def main():
    committed = REPO / 'artifacts' / 'bench_cache'
    entries = sorted(p.name for p in committed.iterdir()) \
        if committed.is_dir() else []
    if not entries:
        print('FAIL: no committed entries in artifacts/bench_cache/')
        return 1

    with tempfile.TemporaryDirectory(prefix='verify_cache_') as scratch:
        # seed exactly what bench.py's seed_from_committed would copy, then
        # SKIP its own seeding so the scratch holds only committed entries
        for name in entries:
            if (committed / name).is_file():
                shutil.copyfile(committed / name, Path(scratch) / name)
        print(f'seeded {len(entries)} committed entries')
        env = dict(os.environ, FV2P_JAX_CACHE_DIR=scratch,
                   FV2P_SKIP_CACHE_SEED='1')
        proc = subprocess.run([sys.executable, str(REPO / 'bench.py')],
                              env=env, capture_output=True, text=True,
                              timeout=3600)
        sys.stdout.write(proc.stdout)
        tail = [l for l in proc.stderr.splitlines() if l.startswith('#')]
        print('\n'.join(tail))
        if proc.returncode != 0:
            print(f'FAIL: bench.py rc={proc.returncode}\n'
                  + proc.stderr[-2000:])
            return 1

        ok = True
        new_infer = sorted(p.name for p in Path(scratch).iterdir()
                           if p.name.startswith('jit_infer')
                           and p.name not in entries)
        if new_infer:
            print(f'MISS: bench compiled new infer programs: {new_infer}')
            ok = False
        else:
            print('HIT: no new jit_infer entries — both flagship programs '
                  'served from the committed cache')

        # "# mgaf: compile=11.3s ... | fv2p: compile=5.2s ..."
        times = dict(re.findall(r'(mgaf|fv2p): compile=([0-9.]+)s',
                                proc.stderr))
        for name in ('mgaf', 'fv2p'):
            if name not in times:
                print(f'FAIL: could not parse {name} compile time from '
                      'bench stderr (output format changed?)')
                ok = False
                continue
            t = float(times[name])
            print(f'{name}: compile={t:.1f}s')
            if t >= COMPILE_BOUND_S:
                print(f'FAIL: {name} compile {t:.1f}s >= {COMPILE_BOUND_S}s')
                ok = False

    print('warm cache VERIFIED' if ok else 'warm cache STALE — rerun '
          'tools/warm_bench_cache.py and re-commit artifacts/bench_cache/')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
