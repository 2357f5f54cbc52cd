"""Waymo pipeline skeleton on the synthetic fixture (no tensorflow): info
pkl -> __getitem__ -> fixed-shape batch -> large-grid FV2P forward ->
kitti-style eval. Reference surface: pcdet/datasets/waymo/waymo_dataset.py
(+ tools/cfgs/waymo_models/FV2P/waymo_fv2p_e30.yaml shapes)."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WAYMO_ROOT = REPO / 'data' / 'waymo'


@pytest.fixture(scope='module')
def waymo_cfg():
    if not (WAYMO_ROOT / 'ImageSets' / 'train.txt').exists():
        subprocess.check_call(
            [sys.executable, str(REPO / 'tools' / 'make_synthetic_waymo.py')])
    from fv2p_tpu.config import EasyDict, cfg_from_yaml_file
    cfg = EasyDict()
    cfg_from_yaml_file(
        str(REPO / 'tools/cfgs/waymo_models/FV2P/waymo_fv2p_e30.yaml'), cfg)
    return cfg


def _collate(ds, idxs):
    return ds.collate_batch([ds[i] for i in idxs])


def test_waymo_train_getitem_and_batch(waymo_cfg):
    """Training path: gt_sampling + world aug + voxelize -> fixed shapes."""
    from fv2p_tpu.datasets import build_dataset
    ds = build_dataset(waymo_cfg.DATA_CONFIG, waymo_cfg.CLASS_NAMES,
                       training=True, root_path=WAYMO_ROOT)
    assert len(ds) >= 1
    batch = _collate(ds, [0])
    cap = waymo_cfg.DATA_CONFIG.DATA_PROCESSOR[-1].MAX_NUMBER_OF_VOXELS['train']
    assert batch['voxels'].shape[1] == cap
    assert batch['voxel_coords'].shape == (1, cap, 3)
    assert batch['voxel_valid'].sum() > 1000
    assert batch['gt_boxes'].shape[0] == 1 and batch['gt_boxes'].shape[2] == 8
    # gt_sampling planted extra vehicles beyond the scene's own 3 objects
    nx, ny, nz = [int(round((waymo_cfg.DATA_CONFIG.POINT_CLOUD_RANGE[i + 3]
                             - waymo_cfg.DATA_CONFIG.POINT_CLOUD_RANGE[i])
                            / waymo_cfg.DATA_CONFIG.DATA_PROCESSOR[-1]
                            .VOXEL_SIZE[i])) for i in range(3)]
    assert (nx, ny, nz) == (1504, 1504, 40)
    coords = np.asarray(batch['voxel_coords'][0])
    valid = np.asarray(batch['voxel_valid'][0])
    assert coords[valid, 0].max() < nz
    assert coords[valid, 1].max() < ny
    assert coords[valid, 2].max() < nx


def test_waymo_val_batch_roundtrip_and_eval(waymo_cfg):
    """Val path + prediction dicts + kitti-style AP on the gt itself (must
    score a perfect detector nonzero)."""
    from fv2p_tpu.datasets import build_dataset
    ds = build_dataset(waymo_cfg.DATA_CONFIG, waymo_cfg.CLASS_NAMES,
                       training=False, root_path=WAYMO_ROOT)
    assert len(ds) >= 1
    batch = _collate(ds, list(range(len(ds))))

    # perfect detections: echo the gt boxes back. The official KITTI R11
    # sampling reads precision at threshold indices 0,4,8,...: with G gt
    # boxes there are only G thresholds, so perfect AP caps at
    # 100/11 * (floor((G-1)/4)+1) — the real evaluator has the same tiny-N
    # artifact. Assert the perfect detector hits that ceiling and an empty
    # detector scores 0.
    det_annos = []
    n_vehicle_gt = 0
    for i in range(len(ds)):
        gt = ds.infos[i]['annos']
        n = len(gt['name'])
        n_vehicle_gt += int((gt['name'] == 'Vehicle').sum())
        det_annos.append({
            'name': gt['name'].copy(),
            'score': 0.9 - 0.05 * np.arange(n) - 0.01 * i,
            'boxes_lidar': gt['gt_boxes_lidar'].copy(),
            'frame_id': ds.infos[i]['frame_id'],
        })
    result_str, result_dict = ds.evaluation(
        det_annos, waymo_cfg.CLASS_NAMES, eval_metric='kitti')
    aps = [v for k, v in result_dict.items()
           if '_3d/' in k and not k.endswith('_R40')]
    ceiling = 100.0 / 11.0 * ((n_vehicle_gt - 1) // 4 + 1)
    assert aps and abs(max(aps) - ceiling) < 1e-6, (result_str, ceiling)

    empty = [{'name': np.zeros(0), 'score': np.zeros(0),
              'boxes_lidar': np.zeros((0, 7)), 'frame_id': a['frame_id']}
             for a in det_annos]
    _, none_dict = ds.evaluation(empty, waymo_cfg.CLASS_NAMES,
                                 eval_metric='kitti')
    assert max(v for k, v in none_dict.items() if '_3d/' in k) == 0.0


@pytest.mark.slow
def test_waymo_fv2p_forward_at_scale(waymo_cfg):
    """Compile-and-run the full FV2P graph at the 1504x1504x40 Waymo grid
    (the compile-at-scale risk the KITTI-shaped tests never cover). Batch 1,
    real capacities from waymo_dataset.yaml."""
    import jax
    import jax.numpy as jnp

    from fv2p_tpu.datasets import build_dataset, dataset_meta_from_cfg
    from fv2p_tpu.models import build_network
    from fv2p_tpu.ops.sparse import host_rulebook

    ds = build_dataset(waymo_cfg.DATA_CONFIG, waymo_cfg.CLASS_NAMES,
                       training=False, root_path=WAYMO_ROOT)
    ds.set_rulebook_spec(
        waymo_cfg.MODEL.BACKBONE_3D.NAME,
        caps_override=waymo_cfg.MODEL.BACKBONE_3D.get('LEVEL_CAPACITIES'))
    batch_np = _collate(ds, [0])
    meta = dataset_meta_from_cfg(waymo_cfg.DATA_CONFIG, 'test')
    model = build_network(waymo_cfg.MODEL,
                          num_class=len(waymo_cfg.CLASS_NAMES),
                          class_names=waymo_cfg.CLASS_NAMES,
                          dataset_meta=meta)
    host_rulebook.reset_overflow_stats()
    batch = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else
                 {kk: jnp.asarray(vv) for kk, vv in v.items()})
             for k, v in batch_np.items() if k != 'metadata'
             and not isinstance(v, list)}
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False))(
            jax.random.PRNGKey(0), dict(batch))
    out = jax.jit(
        lambda v, b: model.apply(v, dict(b), train=False))(variables, batch)
    assert np.isfinite(np.asarray(out['pred_boxes'])).all()
    assert np.asarray(out['pred_scores']).shape[0] == 1
    # realistic-occupancy capacity check at Waymo scale (VERDICT r1 #5)
    of = host_rulebook.get_overflow_stats()
    assert not of['samples_over'], of
