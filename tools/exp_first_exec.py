"""Where do MGAF's ~800 s go on the FIRST infer call despite a 0.7 s
persistent-cache HIT?  (BENCH tails r3/r4/r5-pre: mgaf 'compile'=619.7 /
1477.9 / 796.2 s while the key-spy shows the entry warm-hitting.)

Phases timed separately:
  A. jit dispatch of call 1 (trace + cache read + executable handle)
  B. completion of call 1 (scalar fetch)
  C. call 2 dispatch+completion (steady state)

Usage: python tools/exp_first_exec.py [mgaf|fv2p]
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CFGS = {
    'mgaf': ('tools/cfgs/kitti_models/MGAF-3DSSD/mgaf-3dssd.yaml', 0),
    'fv2p': ('tools/cfgs/kitti_models/FV2P/fv2p.yaml', 18000),
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else 'mgaf'
    from fv2p_tpu.utils.compile_cache import (enable_persistent_cache,
                                              seed_from_committed)
    enable_persistent_cache()
    seed_from_committed()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    cfg_path, n_points = CFGS[name]
    t0 = time.time()
    cfg, model, variables, batch = ge._flagship(
        batch_size=4, n_cap=16000, n_fill=14000,
        compute_dtype=jnp.bfloat16, cfg_path=cfg_path, n_points=n_points)
    batch.pop('gt_boxes')
    print(f'build+init: {time.time() - t0:.1f}s', flush=True)

    import os
    outputs = os.environ.get('OUTPUTS', 'preds')

    @jax.jit
    def infer(variables, batch):
        out = model.apply(variables, dict(batch), train=False)
        if outputs == 'all':
            # ablation-style: keep every float intermediate live
            return {k: v for k, v in out.items()
                    if isinstance(v, jax.Array)
                    and jnp.issubdtype(v.dtype, jnp.floating)}
        if outputs == 'preds+bev':
            return (out['pred_boxes'], out['pred_scores'],
                    out['pred_labels'], out['spatial_features_2d'])
        return out['pred_boxes'], out['pred_scores'], out['pred_labels']

    def first(res):
        return res['pred_boxes'] if isinstance(res, dict) else res[0]

    t0 = time.time()
    res = infer(variables, batch)
    print(f'A dispatch call1: {time.time() - t0:.1f}s', flush=True)
    t0 = time.time()
    print(f'  sum={float(jnp.sum(first(res))):.3f}')
    print(f'B complete call1: {time.time() - t0:.1f}s', flush=True)
    for i in range(3):
        t0 = time.time()
        res = infer(variables, batch)
        s = float(jnp.sum(first(res)))
        print(f'C call{i + 2}: {time.time() - t0:.3f}s', flush=True)


if __name__ == '__main__':
    main()
