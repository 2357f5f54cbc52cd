"""Harvest a LOCAL warm compile cache for repeated bench runs.

Runs ``bench.py`` against an empty scratch cache dir on the real chip, then
copies every entry it produced into ``artifacts/bench_cache/`` (NOT tracked
in git since r5: with the stage-boundary fusion barriers the flagship cold
compiles are 21.6 s / 46.6 s, while the axon-side LOAD of a cached 20 MB
MGAF executable measured 96.9 s — the committed binaries were both churn
and slower than compiling; see README "Known issues"). ``bench.py`` still
seeds from the directory when it exists, so harvest locally if you want
sub-10 s FV2P warm starts for repeated runs.

Usage:  python tools/warm_bench_cache.py
"""
import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main():
    dest = REPO / 'artifacts' / 'bench_cache'
    with tempfile.TemporaryDirectory(prefix='bench_cache_') as scratch:
        # FV2P_SKIP_CACHE_SEED: without it bench.py would seed the scratch
        # from the (possibly stale) committed cache and this tool would then
        # re-commit those stale entries alongside the fresh ones
        env = dict(os.environ, FV2P_JAX_CACHE_DIR=scratch,
                   FV2P_SKIP_CACHE_SEED='1')
        print(f'running bench.py with scratch cache {scratch} ...')
        rc = subprocess.call([sys.executable, str(REPO / 'bench.py')], env=env)
        if rc != 0:
            print(f'bench.py failed (rc={rc}); cache not updated')
            return rc
        entries = sorted(Path(scratch).iterdir())
        if dest.exists():
            shutil.rmtree(dest)
        dest.mkdir(parents=True)
        total = 0
        for f in entries:
            shutil.copyfile(f, dest / f.name)
            total += f.stat().st_size
        print(f'committed {len(entries)} entries, {total / 1e6:.1f} MB '
              f'-> {dest}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
