"""Flagship-resolution end-to-end smoke on the real chip (VERDICT r2 #7).

The learning gates train at 0.1 m voxels; this tool compiles and runs the
FULL-RESOLUTION flagship programs (mgaf-3dssd.yaml / fv2p.yaml, 0.05 m
grid, full voxel/level caps) against the real KITTI fixture pipeline —
dataset -> voxelize -> host rulebooks -> jitted train step (fwd+bwd+opt,
bf16) for a few steps, then one jitted eval batch through post-processing —
asserting no rulebook overflow and no TPU fault, and recording step/eval
times to a JSON artifact.

With --ckpt_<name> the eval phase restores trained gate weights and ASSERTS
the full-resolution program produces detections (eval_boxes > 0) — the r3
smoke only crash-tested eval and committed MGAF's 0 boxes as a pass
(VERDICT r3 weak 2).

--configs runs other yamls, e.g. the Waymo flagships against the synthetic
Waymo fixture (VERDICT r3 item 7).

Usage:
  cd tools && python smoke_flagship_res.py --out ../artifacts/smoke_flagship_r04.json \
      --ckpt_mgaf-3dssd <ckpt dir> --ckpt_fv2p <ckpt dir>
  cd tools && python smoke_flagship_res.py --out ../artifacts/smoke_waymo_r04.json \
      --configs cfgs/waymo_models/MGAF-3DSSD/waymo_mgaf-3dssd_e36.yaml,cfgs/waymo_models/FV2P/waymo_fv2p_e30.yaml
"""
import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _restore_params(ckpt_path):
    """Orbax-restore {params, batch_stats} to host numpy (same recipe as
    tools/test.py:_restore_variables)."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp
    path = Path(ckpt_path).resolve()
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata.tree
    restore_args = jax.tree_util.tree_map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta)
    restored = ckptr.restore(
        path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
    return restored


def run_one(cfg_path, n_train_steps=3, ckpt=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fv2p_tpu.config import cfg_from_yaml_file, EasyDict
    from fv2p_tpu.datasets import build_dataset, dataset_meta_from_cfg
    from fv2p_tpu.models import build_network
    from fv2p_tpu.ops.sparse import host_rulebook
    from fv2p_tpu.train_utils.optimization import build_optimizer
    from fv2p_tpu.train_utils.train_state import (create_train_state,
                                                  make_train_step)

    cfg = EasyDict()
    cfg_from_yaml_file(cfg_path, cfg)
    name = Path(cfg_path).stem
    batch_size = int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU)
    res = {'config': name, 'batch_size': batch_size}

    def sync(x):
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                             .astype(jnp.float32)))

    host_rulebook.reset_overflow_stats()

    # ---- train: real fixture pipeline at full resolution
    train_set = build_dataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=True)
    if cfg.MODEL.get('BACKBONE_3D') is not None:
        train_set.set_rulebook_spec(
            cfg.MODEL.BACKBONE_3D.NAME,
            caps_override=cfg.MODEL.BACKBONE_3D.get('LEVEL_CAPACITIES'))
    meta = dataset_meta_from_cfg(cfg.DATA_CONFIG, 'train')
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          class_names=cfg.CLASS_NAMES, dataset_meta=meta,
                          compute_dtype=jnp.bfloat16)

    def to_jnp(b):
        return {k: jnp.asarray(v) if isinstance(v, np.ndarray)
                else ({kk: jnp.asarray(vv) for kk, vv in v.items()}
                      if isinstance(v, dict) else v)
                for k, v in b.items() if isinstance(v, (np.ndarray, dict))}

    batches = [to_jnp(train_set.collate_batch(
        [train_set[(s * batch_size + j) % len(train_set)]
         for j in range(batch_size)])) for s in range(n_train_steps)]

    rngs = {'params': jax.random.PRNGKey(0),
            'sampling': jax.random.PRNGKey(1),
            'dropout': jax.random.PRNGKey(2)}
    t0 = time.time()
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(
        rngs, batches[0])
    tx = build_optimizer(cfg.OPTIMIZATION, 100)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model))
    state, metrics = step(state, batches[0])
    loss0 = float(metrics['loss'])
    res['train_compile_s'] = round(time.time() - t0, 1)
    res['train_loss_step0'] = round(loss0, 3)

    t0 = time.time()
    for b in batches[1:]:
        state, metrics = step(state, b)
    sync(metrics['loss'])
    res['train_step_ms'] = round(
        (time.time() - t0) / max(len(batches) - 1, 1) * 1e3, 1)
    assert np.isfinite(loss0), 'non-finite loss at full resolution'

    # ---- eval: one batch through the full eval program + post-processing
    test_set = build_dataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False)
    if cfg.MODEL.get('BACKBONE_3D') is not None:
        test_set.set_rulebook_spec(
            cfg.MODEL.BACKBONE_3D.NAME,
            caps_override=cfg.MODEL.BACKBONE_3D.get('LEVEL_CAPACITIES'))
    emeta = dataset_meta_from_cfg(cfg.DATA_CONFIG, 'test')
    emodel = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                           class_names=cfg.CLASS_NAMES, dataset_meta=emeta,
                           compute_dtype=jnp.bfloat16)
    ebatch = to_jnp(test_set.collate_batch(
        [test_set[j] for j in range(batch_size)]))
    if ckpt:
        restored = _restore_params(ckpt)
        evars = {'params': restored['params'],
                 'batch_stats': restored.get('batch_stats') or {}}
        res['eval_ckpt'] = str(ckpt)
    else:
        evars = {'params': state.params, 'batch_stats': state.batch_stats or {}}
    infer = jax.jit(lambda v, b: emodel.apply(v, dict(b), train=False))
    t0 = time.time()
    out = infer(evars, ebatch)
    sync(out['pred_scores'])
    res['eval_compile_plus_first_s'] = round(time.time() - t0, 1)
    t0 = time.time()
    out = infer(evars, ebatch)
    sync(out['pred_scores'])
    res['eval_batch_ms'] = round((time.time() - t0) * 1e3, 1)
    res['eval_boxes'] = int(np.asarray(out['pred_valid']).sum())
    if ckpt:
        # trained gate weights at full resolution MUST detect something
        assert res['eval_boxes'] > 0, (
            f'{name}: full-resolution eval with trained weights {ckpt} '
            f'produced ZERO boxes')

    of = host_rulebook.get_overflow_stats()
    n_over = sum(of['samples_over'].values())
    res['rulebook_overflow_samples'] = int(n_over)
    assert n_over == 0, f'rulebook overflow at full caps: {of}'
    res['max_active'] = {k: int(v) for k, v in of.get('max_active', {}).items()}
    return res


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', type=str, default=None)
    parser.add_argument(
        '--configs', type=str,
        default='cfgs/kitti_models/MGAF-3DSSD/mgaf-3dssd.yaml,'
                'cfgs/kitti_models/FV2P/fv2p.yaml')
    parser.add_argument('--n_train_steps', type=int, default=3)
    args, extra = parser.parse_known_args()
    # --ckpt_<config-stem> <path>: eval with trained weights + assert boxes
    ckpts = {}
    it = iter(extra)
    for tok in it:
        assert tok.startswith('--ckpt_'), f'unknown arg {tok}'
        ckpts[tok[len('--ckpt_'):]] = next(it)

    from fv2p_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    from fv2p_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax

    results = {'device': str(jax.devices()[0].device_kind)}
    for cfg_path in args.configs.split(','):
        stem = Path(cfg_path).stem
        r = run_one(cfg_path, n_train_steps=args.n_train_steps,
                    ckpt=ckpts.get(stem))
        results[r['config']] = r
        print(json.dumps(r))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2) + '\n')
        print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
