"""End-to-end FromVoxelToPoint model tests on a tiny grid (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.jitu import jgrad, jinit, japply

from fv2p_tpu.config import EasyDict
from fv2p_tpu.models import build_network
from fv2p_tpu.models.detectors.detector3d_template import compute_training_loss
from tests.test_mgaf_model import TINY_DATA_CFG, make_batch

TINY_FV2P_CFG = EasyDict({
    'NAME': 'FromVoxelToPoint',
    'VFE': {'NAME': 'MeanVFE'},
    'BACKBONE_3D': {'NAME': 'VoxelResBackBone8x'},
    'MAP_TO_BEV': {'NAME': 'HeightCompression', 'NUM_BEV_FEATURES': 256},
    'BACKBONE_2D': {
        'NAME': 'BaseBEVBackbone',
        'LAYER_NUMS': [1, 1], 'LAYER_STRIDES': [1, 2],
        'NUM_FILTERS': [32, 64],
        'UPSAMPLE_STRIDES': [1, 2], 'NUM_UPSAMPLE_FILTERS': [32, 32],
    },
    'DENSE_HEAD': {
        'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
        'USE_DIRECTION_CLASSIFIER': True, 'DIR_OFFSET': 0.78539,
        'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
        'ANCHOR_GENERATOR_CONFIG': [
            {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
             'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
             'align_center': False, 'feature_map_stride': 8,
             'matched_threshold': 0.6, 'unmatched_threshold': 0.45},
        ],
        'TARGET_ASSIGNER_CONFIG': {
            'NAME': 'AxisAlignedTargetAssigner', 'POS_FRACTION': -1.0,
            'SAMPLE_SIZE': 512, 'NORM_BY_NUM_EXAMPLES': False,
            'MATCH_HEIGHT': False, 'BOX_CODER': 'ResidualCoder'},
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {
            'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
            'code_weights': [1.0] * 7}},
    },
    'POST_PFE': {
        'NAME': 'ResidualVoxelToPointDecoder', 'POINT_SOURCE': 'raw_points',
        'NUM_KEYPOINTS': 128, 'NUM_OUTPUT_FEATURES': 32,
        'SAMPLE_METHOD': 'FPS',
        'FEATURES_SOURCE': ['x_conv4', 'x_conv3', 'x_conv2', 'x_conv1'],
        'INIT_BLOCK': {'SOURCE': 'x_conv4', 'LATERAL_DOWNSAMPLE_FACTOR': 8,
                       'BOTTOM_DOWNSAMPLE_FACTOR': 1, 'LATERAL_CHANNELS': 128,
                       'OUT_CHANNELS': 128, 'NSAMPLE': 3},
        'DECODE_BLOCKS': {
            'x_conv4': {'LATERAL_DOWNSAMPLE_FACTOR': 8, 'BOTTOM_DOWNSAMPLE_FACTOR': 1,
                        'LATERAL_CHANNELS': 128, 'OUT_CHANNELS': 64, 'NSAMPLE': 3},
            'x_conv3': {'LATERAL_DOWNSAMPLE_FACTOR': 4, 'BOTTOM_DOWNSAMPLE_FACTOR': 1,
                        'LATERAL_CHANNELS': 64, 'OUT_CHANNELS': 48, 'NSAMPLE': 3},
            'x_conv2': {'LATERAL_DOWNSAMPLE_FACTOR': 2, 'BOTTOM_DOWNSAMPLE_FACTOR': 1,
                        'LATERAL_CHANNELS': 32, 'OUT_CHANNELS': 40, 'NSAMPLE': 3},
            'x_conv1': {'LATERAL_DOWNSAMPLE_FACTOR': 1, 'BOTTOM_DOWNSAMPLE_FACTOR': 1,
                        'LATERAL_CHANNELS': 16, 'OUT_CHANNELS': 32, 'NSAMPLE': 3},
        },
        'OUT_BLOCK': {'OUT_CHANNELS': 32, 'NSAMPLE': 3},
        'NUM_POINT_BEV_FEATURES': 32,
    },
    'POINT_HEAD': {
        'NAME': 'PointHeadSimple', 'CLS_FC': [16, 16], 'CLASS_AGNOSTIC': True,
        'USE_POINT_FEATURES_BEFORE_FUSION': False,
        'TARGET_CONFIG': {'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2]},
        'LOSS_CONFIG': {'LOSS_REG': 'smooth-l1',
                        'LOSS_WEIGHTS': {'point_cls_weight': 4.0}},
    },
    'ROI_HEAD': {
        'NAME': 'IoUGuidedRoIHead', 'CLASS_AGNOSTIC': True,
        'ROI_POINT_POOL': {'POOL_EXTRA_WIDTH': [3.2, 3.2, 3.2],
                           'NUM_SAMPLED_POINTS': 32, 'DEPTH_NORMALIZER': 70.0},
        'XYZ_UP_LAYER': [16, 16], 'CLS_FC': [32, 32], 'REG_FC': [32, 32],
        'DP_RATIO': 0.3, 'USE_BN': False,
        'ROI_GRID_POOL': {'GRID_SIZE': 3, 'SA_CONFIG': {
            'NPOINTS': [27], 'RADIUS': [[0.8, 1.6]], 'NSAMPLE': [[4, 8]],
            'MLPS': [[[16, 16], [16, 16]]]}},
        'BEV_GRID_POOL': {'IN_CHANNELS': 64, 'OUT_CHANNELS': 16},
        'GRID_INTERACT': {'INTERACT_FILTERS': [32, 32]},
        'CGE_MODULE': {'UP_FILTERS': [8, 8], 'INTERACT_FILTERS': [16]},
        'FUSE_FILTERS': [32],
        'NMS_CONFIG': {
            'TRAIN': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                      'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 24,
                      'NMS_THRESH': 0.8},
            'TEST': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                     'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 12,
                     'NMS_THRESH': 0.85}},
        'TARGET_CONFIG': {
            'BOX_CODER': 'ResidualCoder', 'ROI_PER_IMAGE': 16, 'FG_RATIO': 0.5,
            'SAMPLE_ROI_BY_EACH_CLASS': True, 'CLS_SCORE_TYPE': 'roi_iou',
            'CLS_FG_THRESH': 0.75, 'CLS_BG_THRESH': 0.25,
            'CLS_BG_THRESH_LO': 0.1, 'HARD_BG_RATIO': 0.8,
            'REG_FG_THRESH': 0.55},
        'LOSS_CONFIG': {
            'CLS_LOSS': 'BinaryCrossEntropy', 'REG_LOSS': 'smooth-l1',
            'IOUSCORE_LOSS': 'smooth-l1', 'CORNER_LOSS_REGULARIZATION': True,
            'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                             'rcnn_corner_weight': 1.0,
                             'code_weights': [1.0] * 7,
                             'rcnn_iouscore_weight': 1.0}},
    },
    'POST_PROCESSING': {
        'RECALL_THRESH_LIST': [0.3, 0.5, 0.7], 'SCORE_THRESH': 0.3,
        'OUTPUT_RAW_SCORE': False, 'EVAL_METRIC': 'kitti',
        'NMS_CONFIG': {'MULTI_CLASSES_NMS': False, 'NMS_TYPE': 'nms_gpu',
                       'NMS_THRESH': 0.1, 'NMS_PRE_MAXSIZE': 12,
                       'NMS_POST_MAXSIZE': 8}},
})


def make_fv2p_batch(batch_size=2, n_cap=128, p_cap=256, seed=0):
    batch, meta = make_batch(batch_size=batch_size, n_cap=n_cap, seed=seed)
    rng = np.random.RandomState(seed + 7)
    lo = np.array([0, -3.2, -3], np.float32)
    hi = np.array([6.4, 3.2, 1], np.float32)
    pts = np.zeros((batch_size, p_cap, 4), np.float32)
    pv = np.zeros((batch_size, p_cap), bool)
    for b in range(batch_size):
        n = p_cap - 16
        pts[b, :n, :3] = rng.uniform(lo, hi, (n, 3))
        pts[b, :n, 3] = rng.rand(n)
        pv[b, :n] = True
    batch['points'] = jnp.asarray(pts)
    batch['points_valid'] = jnp.asarray(pv)
    return batch, meta


@pytest.fixture(scope='module')
def fv2p_setup():
    batch, meta = make_fv2p_batch()
    model = build_network(TINY_FV2P_CFG, num_class=1, class_names=['Car'],
                         dataset_meta=meta)
    variables = jinit(
        model, {'params': jax.random.PRNGKey(0),
                'sampling': jax.random.PRNGKey(1),
                'dropout': jax.random.PRNGKey(2)}, dict(batch))
    return model, variables, batch


def test_fv2p_inference_end_to_end(fv2p_setup):
    model, variables, batch = fv2p_setup
    out = japply(model, variables, dict(batch))
    # two-pass outputs with TEST post size
    assert out['batch_box_preds'].shape == (2, 12, 7)
    assert out['pred_boxes'].shape == (2, 8, 7)
    assert np.isfinite(np.asarray(out['pred_boxes'])).all()
    assert np.isfinite(np.asarray(out['batch_iouscore_preds'])).all()


def test_fv2p_training_loss_and_grads(fv2p_setup):
    model, variables, batch = fv2p_setup
    params = variables['params']
    other = {k: v for k, v in variables.items() if k != 'params'}

    def loss_fn(params):
        out, _ = model.apply(
            {'params': params, **other}, dict(batch), train=True,
            mutable=['batch_stats'],
            rngs={'sampling': jax.random.PRNGKey(3),
                  'dropout': jax.random.PRNGKey(4)})
        loss, tb = compute_training_loss(model, out)
        return loss, tb

    (loss, tb), grads = jgrad(loss_fn, params)
    assert np.isfinite(float(loss)), {k: float(v) for k, v in tb.items()}
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0
    for k in ['rpn_loss', 'point_loss_cls', 'rcnn_loss', 'rcnn_loss_corner',
              'rcnn_loss_iouscore']:
        assert np.isfinite(float(tb[k])), k
