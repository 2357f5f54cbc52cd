"""nuScenes pipeline skeleton on the synthetic fixture (no devkit): info
pkl -> CBGS balanced resampling -> __getitem__ -> fixed-shape batch ->
multihead forward. Reference surface:
pcdet/datasets/nuscenes/nuscenes_dataset.py + cbgs_second_multihead.yaml."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
NUSC_ROOT = REPO / 'data' / 'nuscenes'


@pytest.fixture(scope='module')
def nusc_cfg():
    if not (NUSC_ROOT / 'v1.0-trainval'
            / 'nuscenes_infos_10sweeps_train.pkl').exists():
        subprocess.check_call(
            [sys.executable,
             str(REPO / 'tools' / 'make_synthetic_nuscenes.py')])
    from fv2p_tpu.config import EasyDict, cfg_from_yaml_file
    cfg = EasyDict()
    cfg_from_yaml_file(
        str(REPO / 'tools/cfgs/nuscenes_models/cbgs_second_multihead.yaml'),
        cfg)
    return cfg


def test_nuscenes_cbgs_train_getitem_and_batch(nusc_cfg):
    from fv2p_tpu.datasets import build_dataset
    ds = build_dataset(nusc_cfg.DATA_CONFIG, nusc_cfg.CLASS_NAMES,
                      training=True, root_path=NUSC_ROOT)
    # CBGS duplicates frames of rare classes: resampled epoch > raw 4 frames
    assert len(ds) > 4
    item = ds[0]
    batch = ds.collate_batch([item, ds[1]])
    cap = nusc_cfg.DATA_CONFIG.DATA_PROCESSOR[-1].MAX_NUMBER_OF_VOXELS['train']
    assert batch['voxels'].shape[:2] == (2, cap)
    assert batch['voxel_valid'].sum() > 1000
    # velocity kept: gt rows are [x y z dx dy dz heading vx vy cls]
    assert batch['gt_boxes'].shape[2] == 10


def test_nuscenes_val_eval_native_fallback(nusc_cfg):
    """Without the devkit, evaluation() runs the native detection_cvpr_2019
    metrics against self.infos; a detector that nails every GT box must get
    mAP/NDS 1.0, and random boxes must not."""
    from fv2p_tpu.datasets import build_dataset
    ds = build_dataset(nusc_cfg.DATA_CONFIG, nusc_cfg.CLASS_NAMES,
                      training=False, root_path=NUSC_ROOT)
    assert len(ds) == 2
    batch = ds.collate_batch([ds[0]])
    assert batch['voxel_valid'].sum() > 1000
    det_perfect = [
        {'name': np.asarray(info['gt_names']),
         'score': np.full(len(info['gt_names']), 0.9),
         'boxes_lidar': np.asarray(info['gt_boxes'], np.float64),
         'metadata': {'token': info['token']}}
        for info in ds.infos]
    msg, d = ds.evaluation(det_perfect, nusc_cfg.CLASS_NAMES,
                           output_path=str(REPO / 'output' / 'nusc_eval'))
    assert d['mAP'] == pytest.approx(1.0, abs=1e-6), msg
    assert d['NDS'] == pytest.approx(1.0, abs=1e-6), msg
    det_junk = [{'name': np.array(['car']), 'score': np.array([0.9]),
                 'boxes_lidar': np.full((1, 9), 5.0),
                 'metadata': {'token': info['token']}}
                for info in ds.infos]
    _, d2 = ds.evaluation(det_junk, nusc_cfg.CLASS_NAMES,
                          output_path=str(REPO / 'output' / 'nusc_eval'))
    assert d2['mAP'] < 0.5


@pytest.mark.slow
def test_nuscenes_multihead_forward_at_scale(nusc_cfg):
    """Compile-and-run CBGS-SECOND-multihead at the 1024x1024x40 nuScenes
    grid with the real 60000-voxel capacity."""
    import jax
    import jax.numpy as jnp

    from fv2p_tpu.datasets import build_dataset, dataset_meta_from_cfg
    from fv2p_tpu.models import build_network

    import copy

    from fv2p_tpu.config import EasyDict

    # the synthetic fixture's 60000-voxel scenes dilate past the default
    # (KITTI-derived) level capacities; raise them via the designed override
    model_cfg = copy.deepcopy(nusc_cfg.MODEL)
    model_cfg.BACKBONE_3D.LEVEL_CAPACITIES = EasyDict(
        x_conv2=200000, x_conv3=140000, x_conv4=72000, out=72000)
    ds = build_dataset(nusc_cfg.DATA_CONFIG, nusc_cfg.CLASS_NAMES,
                      training=False, root_path=NUSC_ROOT)
    ds.set_rulebook_spec(model_cfg.BACKBONE_3D.NAME,
                         caps_override=model_cfg.BACKBONE_3D.LEVEL_CAPACITIES)
    batch_np = ds.collate_batch([ds[0]])
    meta = dataset_meta_from_cfg(nusc_cfg.DATA_CONFIG, 'test')
    model = build_network(model_cfg, num_class=len(nusc_cfg.CLASS_NAMES),
                          class_names=nusc_cfg.CLASS_NAMES,
                          dataset_meta=meta)
    batch = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else
                 {kk: jnp.asarray(vv) for kk, vv in v.items()})
             for k, v in batch_np.items()
             if k != 'metadata' and not isinstance(v, list)}
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False))(
            jax.random.PRNGKey(0), dict(batch))
    out = jax.jit(
        lambda v, b: model.apply(v, dict(b), train=False))(variables, batch)
    assert np.isfinite(np.asarray(out['pred_boxes'])).all()
