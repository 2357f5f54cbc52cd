"""Evaluation entry point (reference ``tools/test.py``): single-checkpoint
eval with recall stats + official KITTI AP."""
import argparse
import datetime
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def parse_config():
    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--cfg_file', type=str, default=None)
    parser.add_argument('--batch_size', type=int, default=None)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--set', dest='set_cfgs', default=None,
                        nargs=argparse.REMAINDER)
    parser.add_argument('--save_to_file', action='store_true', default=False)
    args = parser.parse_args()

    from fv2p_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = '/'.join(args.cfg_file.split('/')[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, cfg = parse_config()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from fv2p_tpu.datasets import dataset_meta_from_cfg
    from fv2p_tpu.datasets import build_dataset
    from fv2p_tpu.models import build_network
    from fv2p_tpu.utils import common_utils

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    output_dir = REPO / 'output' / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    eval_dir = output_dir / 'eval'
    eval_dir.mkdir(parents=True, exist_ok=True)
    logger = common_utils.create_logger(
        eval_dir / ('log_eval_%s.txt'
                    % datetime.datetime.now().strftime('%Y%m%d-%H%M%S')))

    test_set = build_dataset(
        cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES, training=False,
        logger=logger)
    if cfg.MODEL.get('BACKBONE_3D') is not None:
        test_set.set_rulebook_spec(cfg.MODEL.BACKBONE_3D.NAME)
    import torch.utils.data as torch_data
    loader = torch_data.DataLoader(
        test_set, batch_size=batch_size, num_workers=args.workers,
        shuffle=False, collate_fn=test_set.collate_batch, drop_last=False)

    meta = dataset_meta_from_cfg(cfg.DATA_CONFIG, 'test')
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          class_names=cfg.CLASS_NAMES, dataset_meta=meta,
                          compute_dtype=jnp.bfloat16)

    def to_jnp(batch):
        out = {}
        for k, v in batch.items():
            if k in ('image_shape',):
                continue
            if isinstance(v, np.ndarray):
                out[k] = jnp.asarray(v)
            elif isinstance(v, dict):
                out[k] = {kk: jnp.asarray(vv) for kk, vv in v.items()}
        return out

    # init + restore
    first = next(iter(loader))
    example = to_jnp(first)
    rngs = {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1),
            'dropout': jax.random.PRNGKey(2)}
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(rngs, example)
    if args.ckpt:
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(Path(args.ckpt).resolve())
        variables = {'params': restored['params'],
                     'batch_stats': restored.get('batch_stats', {})}
        logger.info(f'restored from {args.ckpt}')

    infer = jax.jit(lambda v, b: model.apply(v, dict(b), train=False))

    det_annos = []
    t_infer = 0.0
    n_scans = 0
    for i, batch_np in enumerate(loader):
        # drop ragged final batch (static shapes); reference pads instead
        if batch_np['voxels'].shape[0] != batch_size:
            continue
        batch = to_jnp(batch_np)
        t0 = time.time()
        out = infer(variables, batch)
        pred = {k: np.asarray(out[k]) for k in
                ('pred_boxes', 'pred_scores', 'pred_labels', 'pred_valid')}
        t_infer += time.time() - t0
        n_scans += batch_size
        annos = test_set.generate_prediction_dicts(
            batch_np, pred, cfg.CLASS_NAMES,
            output_path=eval_dir if args.save_to_file else None)
        det_annos += annos
        if i % 50 == 0:
            logger.info(f'eval batch {i}/{len(loader)}')

    logger.info('sec_per_example: %.4f' % (t_infer / max(n_scans, 1)))
    result_str, result_dict = test_set.evaluation(det_annos, cfg.CLASS_NAMES)
    logger.info(result_str)
    with open(eval_dir / 'result.json', 'w') as f:
        json.dump({k: float(v) for k, v in result_dict.items()}, f, indent=2)
    logger.info('**********************End evaluation**********************')


if __name__ == '__main__':
    main()
