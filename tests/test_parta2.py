"""PartA2 family: UNetV2 decoder, roiaware pooling, part heads, detector."""
import jax
import jax.numpy as jnp
import numpy as np

from tests.jitu import jgrad, jinit, japply
from fv2p_tpu.config import EasyDict
from fv2p_tpu.models import build_network
from fv2p_tpu.models.detectors.detector3d_template import compute_training_loss
from fv2p_tpu.ops.roiaware_pool import roiaware_pool3d
from tests.test_model_zoo import _HEAD, _POST
from tests.test_mgaf_model import make_batch


def test_roiaware_pool_matches_oracle():
    rng = np.random.RandomState(0)
    n, r, s, c = 300, 4, 4, 5
    pts = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    feats = rng.randn(n, c).astype(np.float32)
    valid = rng.rand(n) > 0.1
    rois = np.stack([rng.uniform(-3, 3, r), rng.uniform(-3, 3, r),
                     rng.uniform(-1, 1, r), rng.uniform(2, 4, r),
                     rng.uniform(1, 3, r), rng.uniform(1, 2, r),
                     rng.uniform(-np.pi, np.pi, r)], 1).astype(np.float32)

    def oracle(method):
        out = np.zeros((r, s, s, s, c), np.float32)
        for ri in range(r):
            cx, cy, cz, dx, dy, dz, yaw = rois[ri]
            cells = {}
            for i in range(n):
                if not valid[i]:
                    continue
                px, py, pz = pts[i] - [cx, cy, cz]
                c_, s_ = np.cos(-yaw), np.sin(-yaw)
                lx, ly, lz = px * c_ - py * s_, px * s_ + py * c_, pz
                if (abs(lx) > dx / 2 + 1e-5 or abs(ly) > dy / 2 + 1e-5
                        or abs(lz) > dz / 2 + 1e-5):
                    continue
                ix = min(s - 1, max(0, int(np.floor((lx + dx / 2) / (dx / s)))))
                iy = min(s - 1, max(0, int(np.floor((ly + dy / 2) / (dy / s)))))
                iz = min(s - 1, max(0, int(np.floor((lz + dz / 2) / (dz / s)))))
                cells.setdefault((ix, iy, iz), []).append(feats[i])
            for (ix, iy, iz), fs in cells.items():
                fs = np.stack(fs)
                out[ri, ix, iy, iz] = fs.max(0) if method == 'max' else fs.mean(0)
        return out

    for method in ('max', 'avg'):
        got = np.asarray(roiaware_pool3d(
            jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(valid),
            jnp.asarray(rois), s, method))
        np.testing.assert_allclose(got, oracle(method), rtol=1e-5, atol=1e-5)


PARTA2_CFG = EasyDict({
    'NAME': 'PartA2Net',
    'VFE': {'NAME': 'MeanVFE'},
    'BACKBONE_3D': {'NAME': 'UNetV2'},
    'MAP_TO_BEV': {'NAME': 'HeightCompression', 'NUM_BEV_FEATURES': 256},
    'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1, 1],
                    'LAYER_STRIDES': [1, 2], 'NUM_FILTERS': [32, 64],
                    'UPSAMPLE_STRIDES': [1, 2],
                    'NUM_UPSAMPLE_FILTERS': [32, 32]},
    'DENSE_HEAD': _HEAD,
    'POINT_HEAD': {
        'NAME': 'PointIntraPartOffsetHead', 'CLS_FC': [], 'PART_FC': [],
        'CLASS_AGNOSTIC': True,
        'TARGET_CONFIG': {'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2]},
        'LOSS_CONFIG': {'LOSS_REG': 'smooth-l1',
                        'LOSS_WEIGHTS': {'point_cls_weight': 1.0,
                                         'point_part_weight': 1.0}},
    },
    'ROI_HEAD': {
        'NAME': 'PartA2FCHead', 'CLASS_AGNOSTIC': True,
        'SHARED_FC': [32, 32], 'CLS_FC': [16], 'REG_FC': [16],
        'DP_RATIO': 0.3, 'SEG_MASK_SCORE_THRESH': 0.3,
        'NMS_CONFIG': {
            'TRAIN': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                      'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16,
                      'NMS_THRESH': 0.8},
            'TEST': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                     'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16,
                     'NMS_THRESH': 0.7}},
        'ROI_AWARE_POOL': {'POOL_SIZE': 4, 'NUM_FEATURES': 32,
                           'MAX_POINTS_PER_VOXEL': 128},
        'TARGET_CONFIG': {
            'BOX_CODER': 'ResidualCoder', 'ROI_PER_IMAGE': 16,
            'FG_RATIO': 0.5, 'SAMPLE_ROI_BY_EACH_CLASS': True,
            'CLS_SCORE_TYPE': 'roi_iou', 'CLS_FG_THRESH': 0.75,
            'CLS_BG_THRESH': 0.25, 'CLS_BG_THRESH_LO': 0.1,
            'HARD_BG_RATIO': 0.8, 'REG_FG_THRESH': 0.65},
        'LOSS_CONFIG': {
            'CLS_LOSS': 'BinaryCrossEntropy', 'REG_LOSS': 'smooth-l1',
            'CORNER_LOSS_REGULARIZATION': True,
            'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                             'rcnn_corner_weight': 1.0,
                             'code_weights': [1.0] * 7}},
    },
    'POST_PROCESSING': _POST,
})


def test_parta2_inference_and_training():
    batch, meta = make_batch(batch_size=2, n_cap=128)
    model = build_network(PARTA2_CFG, num_class=1, class_names=['Car'],
                          dataset_meta=meta)
    rngs = {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1),
            'dropout': jax.random.PRNGKey(2)}
    variables = jinit(model, rngs, dict(batch))
    out = japply(model, variables, dict(batch))
    assert out['pred_boxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(out['pred_boxes'])).all()
    # part predictions surfaced for the second stage
    assert out['point_part_offset'].shape[-1] == 3

    params = variables['params']
    other = {k: v for k, v in variables.items() if k != 'params'}

    def loss_fn(params):
        o, _ = model.apply(
            {'params': params, **other}, dict(batch), train=True,
            mutable=['batch_stats'],
            rngs={'sampling': jax.random.PRNGKey(3),
                  'dropout': jax.random.PRNGKey(4)})
        loss, tb = compute_training_loss(model, o)
        return loss, tb

    (loss, tb), grads = jgrad(loss_fn, params)
    assert np.isfinite(float(loss)), {k: float(v) for k, v in tb.items()}
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0


PARTA2_FREE_CFG = EasyDict({
    'NAME': 'PointRCNN',
    'VFE': {'NAME': 'MeanVFE'},
    'BACKBONE_3D': {'NAME': 'UNetV2', 'RETURN_ENCODED_TENSOR': False},
    'POINT_HEAD': {
        'NAME': 'PointIntraPartOffsetHead', 'CLS_FC': [16], 'PART_FC': [16],
        'REG_FC': [16], 'CLASS_AGNOSTIC': False,
        'TARGET_CONFIG': {
            'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2],
            'BOX_CODER': 'PointResidualCoder',
            'BOX_CODER_CONFIG': {'use_mean_size': True,
                                 'mean_size': [[3.9, 1.6, 1.56]]}},
        'LOSS_CONFIG': {'LOSS_REG': 'WeightedSmoothL1Loss',
                        'LOSS_WEIGHTS': {'point_cls_weight': 1.0,
                                         'point_box_weight': 1.0,
                                         'point_part_weight': 1.0,
                                         'code_weights': [1.0] * 8}},
    },
    'ROI_HEAD': dict(PARTA2_CFG.ROI_HEAD, DISABLE_PART=True,
                     SEG_MASK_SCORE_THRESH=0.0),
    'POST_PROCESSING': _POST,
})


def test_parta2_free_inference_and_training():
    batch, meta = make_batch(batch_size=2, n_cap=128)
    model = build_network(PARTA2_FREE_CFG, num_class=1, class_names=['Car'],
                          dataset_meta=meta)
    rngs = {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1),
            'dropout': jax.random.PRNGKey(2)}
    variables = jinit(model, rngs, dict(batch))
    out = japply(model, variables, dict(batch))
    assert out['pred_boxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(out['pred_boxes'])).all()

    params = variables['params']
    other = {k: v for k, v in variables.items() if k != 'params'}

    def loss_fn(params):
        o, _ = model.apply(
            {'params': params, **other}, dict(batch), train=True,
            mutable=['batch_stats'],
            rngs={'sampling': jax.random.PRNGKey(3),
                  'dropout': jax.random.PRNGKey(4)})
        loss, tb = compute_training_loss(model, o)
        return loss, tb

    (loss, tb), grads = jgrad(loss_fn, params)
    assert np.isfinite(float(loss)), {k: float(v) for k, v in tb.items()}
    assert 'point_loss_part' in tb and 'point_loss_box' in tb
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
