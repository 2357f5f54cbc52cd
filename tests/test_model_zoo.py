"""Tiny-grid end-to-end tests for the stock model zoo (SECOND, PointPillar)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fv2p_tpu.config import EasyDict
from fv2p_tpu.models import build_network
from fv2p_tpu.models.detectors.detector3d_template import compute_training_loss
from tests.jitu import jinit, japply, jgrad
from tests.test_mgaf_model import TINY_DATA_CFG, make_batch

_ANCHOR_CFG = [
    {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
     'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
     'align_center': False, 'feature_map_stride': 8,
     'matched_threshold': 0.6, 'unmatched_threshold': 0.45},
]

_HEAD = {
    'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
    'USE_DIRECTION_CLASSIFIER': True, 'DIR_OFFSET': 0.78539,
    'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
    'ANCHOR_GENERATOR_CONFIG': _ANCHOR_CFG,
    'TARGET_ASSIGNER_CONFIG': {
        'NAME': 'AxisAlignedTargetAssigner', 'POS_FRACTION': -1.0,
        'SAMPLE_SIZE': 512, 'NORM_BY_NUM_EXAMPLES': False,
        'MATCH_HEIGHT': False, 'BOX_CODER': 'ResidualCoder'},
    'LOSS_CONFIG': {'LOSS_WEIGHTS': {
        'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
        'code_weights': [1.0] * 7}},
}

_POST = {
    'RECALL_THRESH_LIST': [0.3, 0.5, 0.7], 'SCORE_THRESH': 0.1,
    'OUTPUT_RAW_SCORE': False, 'EVAL_METRIC': 'kitti',
    'NMS_CONFIG': {'MULTI_CLASSES_NMS': False, 'NMS_TYPE': 'nms_gpu',
                   'NMS_THRESH': 0.01, 'NMS_PRE_MAXSIZE': 64,
                   'NMS_POST_MAXSIZE': 16},
}

SECOND_CFG = EasyDict({
    'NAME': 'SECONDNet',
    'VFE': {'NAME': 'MeanVFE'},
    'BACKBONE_3D': {'NAME': 'VoxelBackBone8x'},
    'MAP_TO_BEV': {'NAME': 'HeightCompression', 'NUM_BEV_FEATURES': 256},
    'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1, 1],
                    'LAYER_STRIDES': [1, 2], 'NUM_FILTERS': [32, 64],
                    'UPSAMPLE_STRIDES': [1, 2],
                    'NUM_UPSAMPLE_FILTERS': [32, 32]},
    'DENSE_HEAD': _HEAD, 'POST_PROCESSING': _POST,
})

PILLAR_CFG = EasyDict({
    'NAME': 'PointPillar',
    'VFE': {'NAME': 'PillarVFE', 'WITH_DISTANCE': False,
            'USE_ABSLOTE_XYZ': True, 'USE_NORM': True, 'NUM_FILTERS': [32]},
    'MAP_TO_BEV': {'NAME': 'PointPillarScatter', 'NUM_BEV_FEATURES': 32},
    'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1, 1],
                    'LAYER_STRIDES': [2, 2], 'NUM_FILTERS': [32, 64],
                    'UPSAMPLE_STRIDES': [1, 2],
                    'NUM_UPSAMPLE_FILTERS': [32, 32]},
    'DENSE_HEAD': dict(_HEAD, ANCHOR_GENERATOR_CONFIG=[
        dict(_ANCHOR_CFG[0], feature_map_stride=2)]),
    'POST_PROCESSING': _POST,
})


@pytest.mark.parametrize('cfg', [SECOND_CFG, PILLAR_CFG],
                         ids=['second', 'pointpillar'])
def test_zoo_inference_and_training(cfg):
    batch, meta = make_batch(batch_size=2, n_cap=128)
    model = build_network(cfg, num_class=1, class_names=['Car'],
                         dataset_meta=meta)
    variables = jinit(model, jax.random.PRNGKey(0), dict(batch))
    out = japply(model, variables, dict(batch))
    assert out['pred_boxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(out['pred_boxes'])).all()

    params = variables['params']
    other = {k: v for k, v in variables.items() if k != 'params'}

    def loss_fn(params):
        o, _ = model.apply({'params': params, **other}, dict(batch),
                           train=True, mutable=['batch_stats'])
        loss, tb = compute_training_loss(model, o)
        return loss, tb

    (loss, tb), grads = jgrad(loss_fn, params)
    assert np.isfinite(float(loss)), tb
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0


PVRCNN_CFG = EasyDict({
    'NAME': 'PVRCNN',
    'VFE': {'NAME': 'MeanVFE'},
    'BACKBONE_3D': {'NAME': 'VoxelBackBone8x'},
    'MAP_TO_BEV': {'NAME': 'HeightCompression', 'NUM_BEV_FEATURES': 256},
    'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1, 1],
                    'LAYER_STRIDES': [1, 2], 'NUM_FILTERS': [32, 64],
                    'UPSAMPLE_STRIDES': [1, 2],
                    'NUM_UPSAMPLE_FILTERS': [32, 32]},
    'DENSE_HEAD': _HEAD,
    'PFE': {
        'NAME': 'VoxelSetAbstraction', 'POINT_SOURCE': 'raw_points',
        'NUM_KEYPOINTS': 64, 'NUM_OUTPUT_FEATURES': 32,
        'SAMPLE_METHOD': 'FPS',
        'FEATURES_SOURCE': ['bev', 'x_conv3', 'x_conv4', 'raw_points'],
        'SA_LAYER': {
            'raw_points': {'MLPS': [[8, 8], [8, 8]],
                           'POOL_RADIUS': [0.4, 0.8], 'NSAMPLE': [4, 4]},
            'x_conv3': {'DOWNSAMPLE_FACTOR': 4, 'MLPS': [[8, 8], [8, 8]],
                        'POOL_RADIUS': [1.2, 2.4], 'NSAMPLE': [4, 4]},
            'x_conv4': {'DOWNSAMPLE_FACTOR': 8, 'MLPS': [[8, 8], [8, 8]],
                        'POOL_RADIUS': [2.4, 4.8], 'NSAMPLE': [4, 4]},
        },
    },
    'POINT_HEAD': {
        'NAME': 'PointHeadSimple', 'CLS_FC': [16], 'CLASS_AGNOSTIC': True,
        'USE_POINT_FEATURES_BEFORE_FUSION': True,
        'TARGET_CONFIG': {'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2]},
        'LOSS_CONFIG': {'LOSS_REG': 'smooth-l1',
                        'LOSS_WEIGHTS': {'point_cls_weight': 1.0}},
    },
    'ROI_HEAD': {
        'NAME': 'PVRCNNHead', 'CLASS_AGNOSTIC': True,
        'SHARED_FC': [32, 32], 'CLS_FC': [16, 16], 'REG_FC': [16, 16],
        'DP_RATIO': 0.3,
        'NMS_CONFIG': {
            'TRAIN': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                      'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 24,
                      'NMS_THRESH': 0.8},
            'TEST': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                     'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 12,
                     'NMS_THRESH': 0.7}},
        'ROI_GRID_POOL': {'GRID_SIZE': 3, 'MLPS': [[8, 8], [8, 8]],
                          'POOL_RADIUS': [0.8, 1.6], 'NSAMPLE': [4, 4],
                          'POOL_METHOD': 'max_pool'},
        'TARGET_CONFIG': {
            'BOX_CODER': 'ResidualCoder', 'ROI_PER_IMAGE': 16, 'FG_RATIO': 0.5,
            'SAMPLE_ROI_BY_EACH_CLASS': True, 'CLS_SCORE_TYPE': 'roi_iou',
            'CLS_FG_THRESH': 0.75, 'CLS_BG_THRESH': 0.25,
            'CLS_BG_THRESH_LO': 0.1, 'HARD_BG_RATIO': 0.8,
            'REG_FG_THRESH': 0.55},
        'LOSS_CONFIG': {
            'CLS_LOSS': 'BinaryCrossEntropy', 'REG_LOSS': 'smooth-l1',
            'CORNER_LOSS_REGULARIZATION': True,
            'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                             'rcnn_corner_weight': 1.0,
                             'code_weights': [1.0] * 7}},
    },
    'POST_PROCESSING': _POST,
})


def test_pvrcnn_inference_and_training():
    from tests.test_fv2p_model import make_fv2p_batch
    batch, meta = make_fv2p_batch(batch_size=2, n_cap=128)
    model = build_network(PVRCNN_CFG, num_class=1, class_names=['Car'],
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
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


POINTRCNN_CFG = EasyDict({
    'NAME': 'PointRCNN',
    'BACKBONE_3D': {
        'NAME': 'PointNet2MSG',
        'SA_CONFIG': {
            'NPOINTS': [64, 16],
            'RADIUS': [[0.4, 0.8], [0.8, 1.6]],
            'NSAMPLE': [[8, 8], [8, 8]],
            'MLPS': [[[8, 8], [8, 8]], [[16, 16], [16, 16]]],
        },
        'FP_MLPS': [[32, 32], [32, 32]],
    },
    'POINT_HEAD': {
        'NAME': 'PointHeadBox', 'CLS_FC': [16], 'REG_FC': [16],
        'CLASS_AGNOSTIC': False, 'USE_POINT_FEATURES_BEFORE_FUSION': False,
        'TARGET_CONFIG': {
            'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2],
            'BOX_CODER': 'PointResidualCoder',
            'BOX_CODER_CONFIG': {'use_mean_size': True,
                                 'mean_size': [[3.9, 1.6, 1.56]]}},
        'LOSS_CONFIG': {'LOSS_REG': 'WeightedSmoothL1Loss',
                        'LOSS_WEIGHTS': {'point_cls_weight': 1.0,
                                         'point_box_weight': 1.0,
                                         'code_weights': [1.0] * 8}},
    },
    'ROI_HEAD': {
        'NAME': 'PointRCNNHead', 'CLASS_AGNOSTIC': True,
        'ROI_POINT_POOL': {'POOL_EXTRA_WIDTH': [0.0, 0.0, 0.0],
                           'NUM_SAMPLED_POINTS': 32, 'DEPTH_NORMALIZER': 70.0},
        'XYZ_UP_LAYER': [16, 16], 'CLS_FC': [16], 'REG_FC': [16],
        'DP_RATIO': 0.0, 'USE_BN': False,
        'SA_CONFIG': {'NPOINTS': [16, 8, -1], 'RADIUS': [0.2, 0.4, 100],
                      'NSAMPLE': [4, 4, 4],
                      'MLPS': [[16, 16], [16, 32], [32, 32]]},
        'NMS_CONFIG': {
            'TRAIN': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                      'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 24,
                      'NMS_THRESH': 0.8},
            'TEST': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                     'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 12,
                     'NMS_THRESH': 0.85}},
        'TARGET_CONFIG': {
            'BOX_CODER': 'ResidualCoder', 'ROI_PER_IMAGE': 16, 'FG_RATIO': 0.5,
            'SAMPLE_ROI_BY_EACH_CLASS': True, 'CLS_SCORE_TYPE': 'cls',
            'CLS_FG_THRESH': 0.6, 'CLS_BG_THRESH': 0.45,
            'CLS_BG_THRESH_LO': 0.1, 'HARD_BG_RATIO': 0.8,
            'REG_FG_THRESH': 0.55},
        'LOSS_CONFIG': {
            'CLS_LOSS': 'BinaryCrossEntropy', 'REG_LOSS': 'smooth-l1',
            'CORNER_LOSS_REGULARIZATION': True,
            'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                             'rcnn_corner_weight': 1.0,
                             'code_weights': [1.0] * 7}},
    },
    'POST_PROCESSING': _POST,
})


def test_pointrcnn_inference_and_training():
    from tests.test_fv2p_model import make_fv2p_batch
    batch, meta = make_fv2p_batch(batch_size=2, n_cap=128)
    model = build_network(POINTRCNN_CFG, num_class=1, class_names=['Car'],
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
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


VOXELRCNN_CFG = EasyDict({
    'NAME': 'VoxelRCNN',
    'VFE': {'NAME': 'MeanVFE'},
    'BACKBONE_3D': {'NAME': 'VoxelBackBone8x'},
    'MAP_TO_BEV': {'NAME': 'HeightCompression', 'NUM_BEV_FEATURES': 256},
    'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1, 1],
                    'LAYER_STRIDES': [1, 2], 'NUM_FILTERS': [32, 64],
                    'UPSAMPLE_STRIDES': [1, 2],
                    'NUM_UPSAMPLE_FILTERS': [32, 32]},
    'DENSE_HEAD': _HEAD,
    'ROI_HEAD': {
        'NAME': 'VoxelRCNNHead', 'CLASS_AGNOSTIC': True,
        'SHARED_FC': [32, 32], 'CLS_FC': [16, 16], 'REG_FC': [16, 16],
        'DP_RATIO': 0.3,
        'NMS_CONFIG': {
            'TRAIN': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                      'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 24,
                      'NMS_THRESH': 0.8},
            'TEST': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                     'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 12,
                     'NMS_THRESH': 0.7}},
        'ROI_GRID_POOL': {
            'FEATURES_SOURCE': ['x_conv3', 'x_conv4'], 'PRE_MLP': True,
            'GRID_SIZE': 3,
            'POOL_LAYERS': {
                'x_conv3': {'MLPS': [[8, 8]], 'QUERY_RANGES': [[4, 4, 4]],
                            'POOL_RADIUS': [0.8], 'NSAMPLE': [4],
                            'POOL_METHOD': 'max_pool'},
                'x_conv4': {'MLPS': [[8, 8]], 'QUERY_RANGES': [[4, 4, 4]],
                            'POOL_RADIUS': [1.6], 'NSAMPLE': [4],
                            'POOL_METHOD': 'max_pool'},
            }},
        'TARGET_CONFIG': {
            'BOX_CODER': 'ResidualCoder', 'ROI_PER_IMAGE': 16, 'FG_RATIO': 0.5,
            'SAMPLE_ROI_BY_EACH_CLASS': True, 'CLS_SCORE_TYPE': 'roi_iou',
            'CLS_FG_THRESH': 0.75, 'CLS_BG_THRESH': 0.25,
            'CLS_BG_THRESH_LO': 0.1, 'HARD_BG_RATIO': 0.8,
            'REG_FG_THRESH': 0.55},
        'LOSS_CONFIG': {
            'CLS_LOSS': 'BinaryCrossEntropy', 'REG_LOSS': 'smooth-l1',
            'CORNER_LOSS_REGULARIZATION': True,
            'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                             'rcnn_corner_weight': 1.0,
                             'code_weights': [1.0] * 7}},
    },
    'POST_PROCESSING': _POST,
})


def test_voxelrcnn_inference_and_training():
    batch, meta = make_batch(batch_size=2, n_cap=128)
    model = build_network(VOXELRCNN_CFG, num_class=1, class_names=['Car'],
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
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_atss_assigner_second():
    """SECOND with ATSSTargetAssigner (reference atss_target_assigner.py)."""
    import copy
    cfg = EasyDict(copy.deepcopy(dict(SECOND_CFG)))
    cfg.DENSE_HEAD = dict(copy.deepcopy(dict(_HEAD)))
    cfg.DENSE_HEAD['TARGET_ASSIGNER_CONFIG'] = {
        'NAME': 'ATSSTargetAssigner', 'TOPK': 9, 'MATCH_HEIGHT': False,
        'BOX_CODER': 'ResidualCoder'}
    batch, meta = make_batch(batch_size=2, n_cap=128)
    model = build_network(cfg, num_class=1, class_names=['Car'],
                          dataset_meta=meta)
    variables = jinit(model, jax.random.PRNGKey(0), dict(batch))

    def loss_fn(params):
        o, _ = model.apply(
            {'params': params, **{k: v for k, v in variables.items()
                                  if k != 'params'}},
            dict(batch), train=True, mutable=['batch_stats'])
        return compute_training_loss(model, o)

    (loss, tb), grads = jgrad(loss_fn, variables['params'])
    assert np.isfinite(float(loss)), {k: float(v) for k, v in tb.items()}
    # the two planted gt cars must produce positive anchors (force match)
    o, _ = japply(model, variables, dict(batch), train=True,
                  mutable=['batch_stats'])
    labels = np.asarray(o['anchor_head_ret']['box_cls_labels'])
    assert (labels > 0).sum() >= 2 * labels.shape[0]
