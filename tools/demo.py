"""Single-scan inference demo (reference ``tools/demo.py``): load a .bin/.npy
point cloud, voxelize, run the detector, print boxes. Falls back to a
synthetic scan when no data file is given — usable as a smoke test."""
import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def parse_config():
    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--cfg_file', type=str,
                        default='cfgs/kitti_models/MGAF-3DSSD/mgaf-3dssd.yaml')
    parser.add_argument('--data_path', type=str, default=None,
                        help='point cloud .bin/.npy file (synthetic if absent)')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--vis', type=str, default=None,
                        help='save a BEV rendering PNG to this path')
    parser.add_argument('--set', dest='set_cfgs', default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()
    from fv2p_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    cfg_path = args.cfg_file
    if not Path(cfg_path).exists():
        cfg_path = str(REPO / 'tools' / cfg_path)
    cfg_from_yaml_file(cfg_path, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def load_points(args, cfg):
    if args.data_path:
        p = Path(args.data_path)
        if p.suffix == '.bin':
            return np.fromfile(str(p), dtype=np.float32).reshape(-1, 4)
        return np.load(str(p))
    rng = np.random.RandomState(0)
    pr = np.array(cfg.DATA_CONFIG.POINT_CLOUD_RANGE, np.float32)
    n = 18000
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(pr[0], pr[3], n)
    pts[:, 1] = rng.uniform(pr[1], pr[4], n)
    pts[:, 2] = rng.uniform(pr[2], pr[5], n)
    pts[:, 3] = rng.rand(n)
    # plant a car-shaped cluster
    m = 300
    pts[:m, 0] = rng.uniform(9, 13, m)
    pts[:m, 1] = rng.uniform(-0.9, 0.9, m)
    pts[:m, 2] = rng.uniform(-1.6, -0.3, m)
    return pts


def main():
    from fv2p_tpu.utils.platform import apply_platform_override
    apply_platform_override()
    args, cfg = parse_config()
    import jax
    import jax.numpy as jnp

    from fv2p_tpu.datasets import dataset_meta_from_cfg
    from fv2p_tpu.datasets.processor.data_processor import DataProcessor
    from fv2p_tpu.models import build_network

    points = load_points(args, cfg)
    print(f'loaded {points.shape[0]} points')

    proc = DataProcessor(cfg.DATA_CONFIG.DATA_PROCESSOR,
                         np.array(cfg.DATA_CONFIG.POINT_CLOUD_RANGE, np.float32),
                         training=False)
    data = proc.forward({'points': points, 'use_lead_xyz': True})
    data = proc.pad_to_fixed_shape(data)

    batch = {}
    if 'voxels' in data:
        batch.update(
            voxels=jnp.asarray(data['voxels'][None]),
            voxel_coords=jnp.asarray(data['voxel_coords'][None]),
            voxel_num_points=jnp.asarray(data['voxel_num_points'][None]),
            voxel_valid=jnp.asarray(data['voxel_valid'][None]))
    else:
        # point-only pipeline (PointRCNN family): fixed-size point batch
        pts = data['points']
        batch['points'] = jnp.asarray(pts[None, :, :])
        batch['points_valid'] = jnp.asarray(
            data.get('points_valid', np.ones(pts.shape[0], bool))[None])
    if 'voxels' in data and cfg.DATA_CONFIG.get('KEEP_RAW_POINTS', False):
        p_cap = int(cfg.DATA_CONFIG.get('MAX_POINTS_PER_SCAN', 24000))
        pts = np.zeros((p_cap, points.shape[1]), np.float32)
        pv = np.zeros((p_cap,), bool)
        n = min(points.shape[0], p_cap)
        pts[:n] = points[:n]
        pv[:n] = True
        batch['points'] = jnp.asarray(pts[None])
        batch['points_valid'] = jnp.asarray(pv[None])

    meta = dataset_meta_from_cfg(cfg.DATA_CONFIG, 'test')
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          class_names=cfg.CLASS_NAMES, dataset_meta=meta,
                          compute_dtype=jnp.bfloat16)
    rngs = {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1),
            'dropout': jax.random.PRNGKey(2)}
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(rngs, batch)
    if args.ckpt:
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(Path(args.ckpt).resolve())
        variables = {'params': restored['params'],
                     'batch_stats': restored.get('batch_stats', {})}
        print(f'restored {args.ckpt}')

    out = jax.jit(lambda v, b: model.apply(v, dict(b), train=False))(variables, batch)
    boxes = np.asarray(out['pred_boxes'][0])
    scores = np.asarray(out['pred_scores'][0])
    labels = np.asarray(out['pred_labels'][0])
    valid = np.asarray(out['pred_valid'][0])
    print(f'detections: {int(valid.sum())}')
    for b, s, l in zip(boxes[valid], scores[valid], labels[valid]):
        name = cfg.CLASS_NAMES[int(l) - 1]
        extra = ' vel [% .2f % .2f]' % tuple(b[7:9]) if b.shape[0] >= 9 else ''
        print(('  %-10s score %.3f  box [% .2f % .2f % .2f | %.2f %.2f %.2f '
               '| % .2f]' % (name, s, *b[:7])) + extra)
    if args.vis:
        from visual_utils.visualize_utils import draw_scenes_bev
        draw_scenes_bev(points[:, :3], ref_boxes=boxes[valid][:, :7],
                        ref_scores=scores[valid], ref_labels=labels[valid],
                        point_cloud_range=cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
                        output_path=args.vis)
        print(f'saved BEV rendering to {args.vis}')


if __name__ == '__main__':
    main()
