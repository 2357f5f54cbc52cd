"""End-to-end MGAF-3DSSD model tests on a tiny grid (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.jitu import jgrad, jinit, japply

from fv2p_tpu.config import EasyDict
from fv2p_tpu.models import build_network
from fv2p_tpu.models.detectors.detector3d_template import compute_training_loss

TINY_DATA_CFG = EasyDict({
    'POINT_CLOUD_RANGE': [0, -3.2, -3, 6.4, 3.2, 1],
    'POINT_FEATURE_ENCODING': {
        'used_feature_list': ['x', 'y', 'z', 'intensity'],
    },
    'DATA_PROCESSOR': [
        {'NAME': 'transform_points_to_voxels',
         'VOXEL_SIZE': [0.1, 0.1, 0.1],
         'MAX_POINTS_PER_VOXEL': 5,
         'MAX_NUMBER_OF_VOXELS': {'train': 256, 'test': 256}},
    ],
})

TINY_MODEL_CFG = EasyDict({
    'NAME': 'MGAF3DSSD',
    'VFE': {'NAME': 'MeanVFE'},
    'BACKBONE_3D': {'NAME': 'VoxelResBackBone8x'},
    'MAP_TO_BEV': {'NAME': 'HeightCompression', 'NUM_BEV_FEATURES': 256},
    'BACKBONE_2D': {
        'NAME': 'DCNBEVBackbone',
        'LAYER_NUMS': [1, 1], 'LAYER_STRIDES': [1, 2],
        'NUM_FILTERS': [32, 64], 'USE_DCN': True,
        'UPSAMPLE_STRIDES': [1, 2], 'NUM_UPSAMPLE_FILTERS': [32, 32],
    },
    'DENSE_HEAD': {
        'NAME': 'CenterAFHeadSingle', 'CLASS_AGNOSTIC': False,
        'NUM_IOUSCORE_TRAINING_SAMPLES': 8, 'NUM_INFERENCE_SAMPLES': 10,
        'SHARED_FC': [32], 'SHARED_KS': [3], 'USE_DCN': 'MDCN', 'DP_RATIO': 0,
        'HEADS_CONFIG': [
            {'name': 'hm', 'mod_bn': True, 'use_bn': True, 'dp_ratio': 0,
             'out_channel': 1, 'final_kernel': 1, 'head_conv': 16},
            {'name': 'offset', 'mod_bn': True, 'use_bn': True, 'dp_ratio': 0,
             'out_channel': 2, 'final_kernel': 1, 'head_conv': 16},
            {'name': 'height', 'mod_bn': True, 'use_bn': True, 'dp_ratio': 0,
             'out_channel': 1, 'final_kernel': 1, 'head_conv': 16},
            {'name': 'dim', 'mod_bn': True, 'use_bn': True, 'dp_ratio': 0,
             'out_channel': 3, 'final_kernel': 1, 'head_conv': 16},
            {'name': 'rot', 'mod_bn': True, 'use_bn': True, 'dp_ratio': 0,
             'num_bins': 12, 'out_channel': 24, 'final_kernel': 1, 'head_conv': 16},
            {'name': 'segm', 'mod_bn': True, 'use_bn': True, 'dp_ratio': 0,
             'out_channel': 1, 'final_kernel': 1, 'head_conv': 16},
            {'name': 'iouscore', 'mod_bn': True, 'use_bn': True, 'dp_ratio': 0,
             'out_channel': 1, 'final_kernel': 1, 'head_conv': 16},
        ],
        'TARGET_ASSIGNER_CONFIG': {
            'NAME': 'CenterTargetAssigner', 'FEATURE_MAP_STRIDE': 8,
            'GAUSSIAN_MINOVERLAP': 0.01, 'GAUSSIAN_MINRADIUS': 2,
            'MAX_OBJS': 10,
        },
        'LOSS_CONFIG': {
            'HM_LOSS_CONFIG': {'weight': 1.0},
            'OFFSET_LOSS_CONFIG': {'weight': 1.0, 'res_func': 'l1'},
            'HEIGHT_LOSS_CONFIG': {'weight': 1.0, 'res_func': 'l1'},
            'DIM_LOSS_CONFIG': {'weight': 1.0, 'res_func': 'l1'},
            'ROT_LOSS_CONFIG': {'weight': 1.0, 'num_bins': 12},
            'SEGM_LOSS_CONFIG': {'weight': 1.0},
            'CORNER_LOSS_CONFIG': {'weight': 1.0},
            'IOUSCORE_LOSS_CONFIG': {'weight': 1.0, 'iou_fg_thresh': 0.75,
                                     'iou_bg_thresh': 0.25},
        },
    },
    'POST_PROCESSING': {
        'RECALL_THRESH_LIST': [0.3, 0.5, 0.7], 'SCORE_THRESH': 0.501,
        'OUTPUT_RAW_SCORE': False, 'EVAL_METRIC': 'kitti',
        'NMS_CONFIG': {'MULTI_CLASSES_NMS': False, 'NMS_TYPE': 'nms_gpu',
                       'NMS_THRESH': 0.1, 'NMS_PRE_MAXSIZE': 10,
                       'NMS_POST_MAXSIZE': 5},
    },
})


def make_batch(batch_size=2, n_cap=256, seed=0):
    from fv2p_tpu.datasets import dataset_meta_from_cfg
    meta = dataset_meta_from_cfg(TINY_DATA_CFG, 'train')
    rng = np.random.RandomState(seed)
    nx, ny, nz = meta['grid_size']
    voxels, coords, nums, valid = [], [], [], []
    for b in range(batch_size):
        n = n_cap // 2
        lin = rng.choice(nx * ny * nz, n, replace=False)
        z = lin % nz
        y = (lin // nz) % ny
        x = lin // (nz * ny)
        c = np.zeros((n_cap, 3), np.int32)
        c[:n] = np.stack([z, y, x], 1)
        v = np.zeros((n_cap, 5, 4), np.float32)
        v[:n] = rng.rand(n, 5, 4)
        voxels.append(v)
        coords.append(c)
        num = np.zeros((n_cap,), np.int32)
        num[:n] = rng.randint(1, 6, n)
        nums.append(num)
        vv = np.zeros(n_cap, bool)
        vv[:n] = True
        valid.append(vv)
    gt = np.zeros((batch_size, 10, 8), np.float32)
    gt[:, 0] = [3.0, 0.0, -1.0, 3.7, 1.6, 1.5, 0.3, 1]
    gt[:, 1] = [1.5, -1.5, -1.0, 3.9, 1.6, 1.4, -0.5, 1]
    batch = {
        'voxels': jnp.asarray(np.stack(voxels)),
        'voxel_coords': jnp.asarray(np.stack(coords)),
        'voxel_num_points': jnp.asarray(np.stack(nums)),
        'voxel_valid': jnp.asarray(np.stack(valid)),
        'gt_boxes': jnp.asarray(gt),
    }
    return batch, meta


@pytest.fixture(scope='module')
def model_and_vars():
    batch, meta = make_batch()
    model = build_network(TINY_MODEL_CFG, num_class=1, class_names=['Car'],
                         dataset_meta=meta)
    variables = jinit(model, jax.random.PRNGKey(0), dict(batch))
    return model, variables, batch


def test_inference_shapes(model_and_vars):
    model, variables, batch = model_and_vars
    out = japply(model, variables, dict(batch))
    assert out['batch_box_preds'].shape == (2, 10, 7)
    assert out['batch_cls_preds'].shape == (2, 10, 1)
    assert out['pred_boxes'].shape == (2, 5, 7)
    assert out['pred_scores'].shape == (2, 5)
    assert np.isfinite(np.asarray(out['batch_box_preds'])).all()


def test_inference_jittable(model_and_vars):
    model, variables, batch = model_and_vars

    @jax.jit
    def infer(variables, batch):
        return model.apply(variables, dict(batch), train=False)

    out = infer(variables, batch)
    assert np.isfinite(np.asarray(out['pred_boxes'])).all()


def test_training_loss_finite_and_grads(model_and_vars):
    model, variables, batch = model_and_vars
    params = variables['params']
    other = {k: v for k, v in variables.items() if k != 'params'}

    def loss_fn(params):
        out, _ = model.apply({'params': params, **other}, dict(batch),
                             train=True, mutable=['batch_stats'])
        loss, tb = compute_training_loss(model, out)
        return loss, tb

    (loss, tb), grads = jgrad(loss_fn, params)
    assert np.isfinite(float(loss)), tb
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0
    for k in ['rpn_hm_loss', 'rpn_offset_loss', 'rpn_dim_loss', 'rpn_rot_loss',
              'rpn_segm_loss', 'rpn_corner_loss', 'rpn_iouscore_loss']:
        assert np.isfinite(float(tb[k])), k


def test_decode_geometry_sane(model_and_vars):
    """Decoded boxes must land inside (an expanded) point cloud range."""
    model, variables, batch = model_and_vars
    out = japply(model, variables, dict(batch))
    boxes = np.asarray(out['batch_box_preds'])
    # with random weights offsets are small; centers must be within range+-2m
    assert (boxes[..., 0] > -3).all() and (boxes[..., 0] < 10).all()
    assert (boxes[..., 6] >= -np.pi - 1e-4).all() and (boxes[..., 6] <= np.pi + 1e-4).all()
