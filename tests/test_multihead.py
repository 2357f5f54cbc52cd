"""AnchorHeadMulti (nuScenes CBGS multihead) on a tiny grid."""
import jax
import jax.numpy as jnp
import numpy as np

from tests.jitu import jgrad, jinit, japply
from fv2p_tpu.config import EasyDict
from fv2p_tpu.models import build_network
from fv2p_tpu.models.detectors.detector3d_template import compute_training_loss
from tests.test_mgaf_model import make_batch

_ANCHORS = [
    {'class_name': 'car', 'anchor_sizes': [[4.6, 1.9, 1.7]],
     'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-0.95],
     'align_center': False, 'feature_map_stride': 8,
     'matched_threshold': 0.6, 'unmatched_threshold': 0.45},
    {'class_name': 'truck', 'anchor_sizes': [[6.9, 2.5, 2.8]],
     'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-0.6],
     'align_center': False, 'feature_map_stride': 8,
     'matched_threshold': 0.55, 'unmatched_threshold': 0.4},
    {'class_name': 'pedestrian', 'anchor_sizes': [[0.7, 0.7, 1.8]],
     'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-0.9],
     'align_center': False, 'feature_map_stride': 8,
     'matched_threshold': 0.6, 'unmatched_threshold': 0.4},
]

MULTIHEAD_CFG = EasyDict({
    'NAME': 'SECONDNet',
    'VFE': {'NAME': 'MeanVFE'},
    'BACKBONE_3D': {'NAME': 'VoxelResBackBone8x'},
    'MAP_TO_BEV': {'NAME': 'HeightCompression', 'NUM_BEV_FEATURES': 256},
    'BACKBONE_2D': {'NAME': 'BaseBEVBackbone', 'LAYER_NUMS': [1, 1],
                    'LAYER_STRIDES': [1, 2], 'NUM_FILTERS': [32, 64],
                    'UPSAMPLE_STRIDES': [1, 2],
                    'NUM_UPSAMPLE_FILTERS': [32, 32]},
    'DENSE_HEAD': {
        'NAME': 'AnchorHeadMulti', 'CLASS_AGNOSTIC': False,
        'DIR_OFFSET': 0.78539, 'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
        'USE_MULTIHEAD': True, 'SEPARATE_MULTIHEAD': True,
        'USE_DIRECTION_CLASSIFIER': True,
        'ANCHOR_GENERATOR_CONFIG': _ANCHORS,
        'SHARED_CONV_NUM_FILTER': 16,
        'RPN_HEAD_CFGS': [
            {'HEAD_CLS_NAME': ['car']},
            {'HEAD_CLS_NAME': ['truck', 'pedestrian']},
        ],
        'SEPARATE_REG_CONFIG': {
            'NUM_MIDDLE_CONV': 1, 'NUM_MIDDLE_FILTER': 16,
            'REG_LIST': ['reg:2', 'height:1', 'size:3', 'angle:2', 'velo:2']},
        'TARGET_ASSIGNER_CONFIG': {
            'NAME': 'AxisAlignedTargetAssigner', 'POS_FRACTION': -1.0,
            'SAMPLE_SIZE': 512, 'NORM_BY_NUM_EXAMPLES': False,
            'MATCH_HEIGHT': False, 'BOX_CODER': 'ResidualCoder',
            'BOX_CODER_CONFIG': {'code_size': 9,
                                 'encode_angle_by_sincos': True}},
        'LOSS_CONFIG': {
            'REG_LOSS_TYPE': 'WeightedL1Loss',
            'LOSS_WEIGHTS': {
                'pos_cls_weight': 1.0, 'neg_cls_weight': 2.0,
                'cls_weight': 1.0, 'loc_weight': 0.25, 'dir_weight': 0.2,
                'code_weights': [1.0] * 8 + [0.2, 0.2]}},
    },
    'POST_PROCESSING': {
        'RECALL_THRESH_LIST': [0.3, 0.5, 0.7], 'SCORE_THRESH': 0.1,
        'OUTPUT_RAW_SCORE': False, 'EVAL_METRIC': 'kitti',
        'NMS_CONFIG': {'MULTI_CLASSES_NMS': True, 'NMS_TYPE': 'nms_gpu',
                       'NMS_THRESH': 0.2, 'NMS_PRE_MAXSIZE': 64,
                       'NMS_POST_MAXSIZE': 8},
    },
})


def test_multihead_inference_and_training():
    batch, meta = make_batch(batch_size=2, n_cap=128)
    # nuScenes-style gt: 9 box dims (with vx, vy) + class
    gt = np.zeros((2, 10, 10), np.float32)
    gt[:, 0] = [3.0, 0.0, -1.0, 4.6, 1.9, 1.7, 0.3, 0.5, -0.2, 1]
    gt[:, 1] = [1.5, -1.5, -1.0, 6.9, 2.5, 2.8, -0.5, 0.0, 0.0, 2]
    gt[:, 2] = [2.5, 1.0, -1.0, 0.7, 0.7, 1.8, 0.1, 0.0, 0.0, 3]
    batch['gt_boxes'] = jnp.asarray(gt)

    classes = ['car', 'truck', 'pedestrian']
    model = build_network(MULTIHEAD_CFG, num_class=3, class_names=classes,
                          dataset_meta=meta)
    variables = jinit(model, jax.random.PRNGKey(0), dict(batch))
    out = japply(model, variables, dict(batch))
    # multi-class NMS: (B, C*post) slots, 9-dim boxes with velocity
    assert out['pred_boxes'].shape == (2, 3 * 8, 9)
    assert out['pred_labels'].shape == (2, 24)
    assert np.isfinite(np.asarray(out['pred_boxes'])).all()
    # label slots are per class: first 8 are class 1, etc.
    labels = np.asarray(out['pred_labels'])
    assert (labels[:, :8] == 1).all() and (labels[:, 8:16] == 2).all()

    params = variables['params']
    other = {k: v for k, v in variables.items() if k != 'params'}

    def loss_fn(params):
        o, _ = model.apply({'params': params, **other}, dict(batch),
                           train=True, mutable=['batch_stats'])
        loss, tb = compute_training_loss(model, o)
        return loss, tb

    (loss, tb), grads = jgrad(loss_fn, params)
    assert np.isfinite(float(loss)), {k: float(v) for k, v in tb.items()}
    assert 'rpn_loss_dir' in tb
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0


def test_multihead_no_separate_reg():
    """1x1-conv head path (KITTI second_multihead.yaml: no
    SEPARATE_REG_CONFIG, 7-dim code)."""
    import copy
    cfg = EasyDict(copy.deepcopy(dict(MULTIHEAD_CFG)))
    del cfg.DENSE_HEAD['SEPARATE_REG_CONFIG']
    cfg.DENSE_HEAD.TARGET_ASSIGNER_CONFIG = {
        'NAME': 'AxisAlignedTargetAssigner', 'POS_FRACTION': -1.0,
        'SAMPLE_SIZE': 512, 'NORM_BY_NUM_EXAMPLES': False,
        'MATCH_HEIGHT': False, 'BOX_CODER': 'ResidualCoder'}
    cfg.DENSE_HEAD.LOSS_CONFIG = {
        'LOSS_WEIGHTS': {'cls_weight': 1.0, 'loc_weight': 2.0,
                         'dir_weight': 0.2, 'code_weights': [1.0] * 7}}
    batch, meta = make_batch(batch_size=2, n_cap=128)
    gt = np.zeros((2, 10, 8), np.float32)
    gt[:, 0] = [3.0, 0.0, -1.0, 4.6, 1.9, 1.7, 0.3, 1]
    gt[:, 1] = [1.5, -1.5, -1.0, 6.9, 2.5, 2.8, -0.5, 2]
    batch['gt_boxes'] = jnp.asarray(gt)
    model = build_network(cfg, num_class=3,
                          class_names=['car', 'truck', 'pedestrian'],
                          dataset_meta=meta)
    variables = jinit(model, jax.random.PRNGKey(0), dict(batch))
    out = japply(model, variables, dict(batch))
    assert out['pred_boxes'].shape[-1] == 7

    def loss_fn(params):
        o, _ = model.apply(
            {'params': params, **{k: v for k, v in variables.items()
                                  if k != 'params'}},
            dict(batch), train=True, mutable=['batch_stats'])
        return compute_training_loss(model, o)

    (loss, tb), grads = jgrad(loss_fn, variables['params'])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
