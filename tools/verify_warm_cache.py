"""Verify from a clean process that the committed warm compile cache HITS.

BENCH_r03 recorded a 620 s MGAF compile despite "seeded 7 committed
warm-cache entries" — the committed programs had gone stale relative to the
bench programs and nothing in the repo noticed. This tool is the check:

  1. creates an empty scratch cache dir,
  2. seeds it from artifacts/bench_cache/ (exactly what bench.py does),
  3. lowers + compiles BOTH flagship infer programs at the bench shapes,
  4. asserts NO NEW cache entries appeared in the scratch dir — i.e. every
     program's key matched a committed entry (a pure hit), and
  5. asserts each compile took < 60 s (the VERDICT r3 bound; a hit is ~5 s,
     a cold miss ~40 s, the r3 anomaly 620 s).

Run on the real chip after tools/warm_bench_cache.py whenever the flagship
programs change. Exit code 0 = cache verified.

Usage:  python tools/verify_warm_cache.py
"""
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

COMPILE_BOUND_S = 60.0


def main():
    scratch = tempfile.mkdtemp(prefix='verify_cache_')
    os.environ['FV2P_JAX_CACHE_DIR'] = scratch

    from fv2p_tpu.utils.compile_cache import (enable_persistent_cache,
                                              seed_from_committed)
    enable_persistent_cache()
    n = seed_from_committed()
    if n == 0:
        print('FAIL: no committed entries in artifacts/bench_cache/')
        return 1
    seeded = {p.name for p in Path(scratch).iterdir()}
    print(f'seeded {n} committed entries')

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    ok = True
    for cfg_path, n_points in [
            ('tools/cfgs/kitti_models/MGAF-3DSSD/mgaf-3dssd.yaml', 0),
            ('tools/cfgs/kitti_models/FV2P/fv2p.yaml', 18000)]:
        name = Path(cfg_path).stem
        cfg, model, variables, batch = ge._flagship(
            batch_size=4, n_cap=16000, n_fill=14000,
            compute_dtype=jnp.bfloat16, cfg_path=cfg_path, n_points=n_points)
        batch.pop('gt_boxes')

        @jax.jit
        def infer(variables, batch):
            out = model.apply(variables, dict(batch), train=False)
            return out['pred_boxes'], out['pred_scores'], out['pred_labels']

        t0 = time.time()
        infer.lower(variables, batch).compile()
        dt = time.time() - t0
        new = {p.name for p in Path(scratch).iterdir()
               if p.name.startswith('jit_infer')} - seeded
        hit = not new
        status = 'HIT' if hit else f'MISS (new entries: {sorted(new)})'
        print(f'{name}: compile={dt:.1f}s cache={status}')
        if not hit:
            ok = False
        if dt >= COMPILE_BOUND_S:
            print(f'FAIL: {name} compile {dt:.1f}s >= {COMPILE_BOUND_S}s')
            ok = False
        seeded |= new

    print('warm cache VERIFIED' if ok else 'warm cache STALE — rerun '
          'tools/warm_bench_cache.py and re-commit artifacts/bench_cache/')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
