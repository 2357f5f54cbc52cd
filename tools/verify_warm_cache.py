"""Verify the driver bench's compile-time budget from a clean process.

r5: the committed warm-cache binaries are GONE (44.5 MB of git churn whose
axon-side executable load was measured SLOWER than a cold compile for MGAF:
96.9 s load vs 21.6 s cold once the stage-boundary fusion barriers landed —
see utils/compile_tame.py and README "Known issues"). This tool now runs
bench.py against an EMPTY scratch cache and asserts each flagship's cold
compile (which on the axon backend includes the deferred first-execution
backend compile) stays under COMPILE_BOUND_S, plus that the scratch gets
populated (the persistent cache still serves --eval_all loops and repeated
local runs from .jax_cache).

If artifacts/bench_cache/ exists (a local harvest via
tools/warm_bench_cache.py), it is seeded first and the same bound applies
to the warm path.

Usage: python tools/verify_warm_cache.py
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
        print('no committed cache (expected since r5): verifying the COLD '
              'compile budget')

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
        if entries and new_infer:
            print(f'MISS: bench compiled new infer programs: {new_infer}')
            ok = False
        elif entries:
            print('HIT: no new jit_infer entries — both flagship programs '
                  'served from the committed cache')
        elif not new_infer:
            print('FAIL: cold bench wrote no jit_infer cache entries')
            ok = False
        else:
            print(f'cold bench populated {len(new_infer)} infer entries')

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

    print('bench compile budget VERIFIED' if ok else
          'bench compile budget EXCEEDED — investigate with '
          'tools/exp_first_exec.py')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
