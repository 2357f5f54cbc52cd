"""Golden-parity A/B with transplanted weights: our flax BEV backbone and
CenterAF head vs the PyTorch reference modules executing on CPU, on identical
inputs with identical (ported) weights.

Covers: BaseBEVBackbone forward; CenterAFHeadSingle eval forward (shared conv
-> segm -> mask-guided attention -> 7 heads -> maxpool-NMS top-k decode);
head train forward + all 8 loss terms vs reference get_loss.
"""
import numpy as np
import pytest
import torch

from tests import ref_loader

import jax
import jax.numpy as jnp

ref_bev = ref_loader.load('pcdet.models.backbones_2d.base_bev_backbone')
ref_head_mod = ref_loader.load(
    'pcdet.models.dense_heads.center_af_head_single')
ref_riou = ref_loader.load(
    'pcdet.datasets.kitti.kitti_object_eval_python.rotate_iou')
ref_iou3d_utils = ref_loader.load('pcdet.ops.iou3d_nms.iou3d_nms_utils')

from easydict import EasyDict  # the ref_loader stub

from fv2p_tpu.models.backbones_2d.base_bev_backbone import BaseBEVBackbone
from fv2p_tpu.config import StaticConfig
from fv2p_tpu.models.dense_heads.center_af_head import (CenterAFHeadSingle,
                                                        center_af_head_loss)

import sys
sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent.parent
                       / 'tools'))
import port_reference_weights as port

torch.Tensor.cuda = lambda self, *a, **k: self
torch.cuda.FloatTensor = torch.FloatTensor
torch.manual_seed(0)


def _boxes_iou3d_torch(a, b):
    """CPU stand-in for the reference's boxes_iou3d_gpu, built on the
    reference's own rotated-BEV geometry (devRotateIoUEval criterion=2 raw
    intersection; lidar headings are CW-negated as in rotate_iou)."""
    a_np = a.detach().numpy()
    b_np = b.detach().numpy()
    n, m = len(a_np), len(b_np)
    inter_bev = np.zeros((n, m), np.float32)
    for i in range(n):
        bi = np.array([a_np[i, 0], a_np[i, 1], a_np[i, 3], a_np[i, 4],
                       -a_np[i, 6]], np.float32)
        for j in range(m):
            qj = np.array([b_np[j, 0], b_np[j, 1], b_np[j, 3], b_np[j, 4],
                           -b_np[j, 6]], np.float32)
            inter_bev[i, j] = ref_riou.devRotateIoUEval(qj, bi, 2)
    za1 = a_np[:, 2] - a_np[:, 5] / 2
    za2 = a_np[:, 2] + a_np[:, 5] / 2
    zb1 = b_np[:, 2] - b_np[:, 5] / 2
    zb2 = b_np[:, 2] + b_np[:, 5] / 2
    zh = np.clip(np.minimum(za2[:, None], zb2[None])
                 - np.maximum(za1[:, None], zb1[None]), 0, None)
    inter = inter_bev * zh
    vol_a = (a_np[:, 3] * a_np[:, 4] * a_np[:, 5])[:, None]
    vol_b = (b_np[:, 3] * b_np[:, 4] * b_np[:, 5])[None]
    iou = inter / np.clip(vol_a + vol_b - inter, 1e-6, None)
    return torch.from_numpy(iou)


ref_iou3d_utils.boxes_iou3d_gpu = _boxes_iou3d_torch
# center_af_head_template imported iou3d_nms_utils by module ref, patch there
ref_head_template = ref_loader.load(
    'pcdet.models.dense_heads.center_af_head_template')
ref_head_template.iou3d_nms_utils.boxes_iou3d_gpu = _boxes_iou3d_torch


# ---------------------------------------------------------------- backbone

def test_bev_backbone_forward_matches_reference():
    cfg = EasyDict({'LAYER_NUMS': [2, 2], 'LAYER_STRIDES': [1, 2],
                    'NUM_FILTERS': [16, 32],
                    'UPSAMPLE_STRIDES': [1, 2],
                    'NUM_UPSAMPLE_FILTERS': [24, 24]})
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 24, 20).astype(np.float32)   # NCHW

    ref = ref_bev.BaseBEVBackbone(cfg, input_channels=8)
    # randomize BN stats so the A/B actually exercises them
    for m in ref.modules():
        if type(m).__name__ == 'BatchNorm2d':
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.2))
            m.running_var.copy_(torch.from_numpy(
                rng.rand(m.num_features).astype(np.float32) + 0.5))
    ref.eval()
    with torch.no_grad():
        out_ref = ref({'spatial_features': torch.from_numpy(x)})[
            'spatial_features_2d'].numpy()

    ours = BaseBEVBackbone(model_cfg=cfg, input_channels=8)
    variables = ours.init(jax.random.PRNGKey(0),
                          {'spatial_features': jnp.asarray(
                              x.transpose(0, 2, 3, 1))}, train=False)
    params, stats = port.port_bev_backbone(ref)
    variables = {'params': port.as_jnp_tree(params),
                 'batch_stats': port.as_jnp_tree(stats)}
    out = ours.apply(variables, {'spatial_features': jnp.asarray(
        x.transpose(0, 2, 3, 1))}, train=False)['spatial_features_2d']
    out_got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out_got, out_ref, rtol=1e-4, atol=1e-4)


# -------------------------------------------------------------------- head

VOXEL_SIZE = [0.05, 0.05, 0.1]
PC_RANGE = np.array([0., -40., -3., 70.4, 40., 1.], np.float32)
GRID_SIZE = np.array([1408, 1600, 40])
FM_H, FM_W = 40, 44       # reduced map for test speed (stride 8 semantics)


def _head_cfg(k_train=8, k_infer=10):
    def head(name, out_ch, head_conv=16, num_bins=None):
        d = {'name': name, 'mod_bn': True, 'use_bn': True, 'dp_ratio': 0,
             'out_channel': out_ch, 'final_kernel': 1, 'head_conv': head_conv}
        if num_bins:
            d['num_bins'] = num_bins
        return d

    return EasyDict({
        'NUM_IOUSCORE_TRAINING_SAMPLES': k_train,
        'NUM_INFERENCE_SAMPLES': k_infer,
        'SHARED_FC': [24],
        'SHARED_KS': [3],
        'USE_DCN': False,
        'DP_RATIO': 0,
        'HEADS_CONFIG': [
            head('hm', 1), head('offset', 2), head('height', 1),
            head('dim', 3), head('rot', 24, num_bins=12), head('segm', 1),
            head('iouscore', 1),
        ],
        'TARGET_ASSIGNER_CONFIG': EasyDict({
            'NAME': 'CenterTargetAssigner', 'FEATURE_MAP_STRIDE': 8,
            'GAUSSIAN_MINOVERLAP': 0.01, 'GAUSSIAN_MINRADIUS': 2,
            'MAX_OBJS': 12}),
        'LOSS_CONFIG': EasyDict({
            'HM_LOSS_CONFIG': {'weight': 1.0},
            'OFFSET_LOSS_CONFIG': {'weight': 1.0, 'res_func': 'l1'},
            'HEIGHT_LOSS_CONFIG': {'weight': 1.0, 'res_func': 'l1'},
            'DIM_LOSS_CONFIG': {'weight': 1.0, 'res_func': 'l1'},
            'ROT_LOSS_CONFIG': {'weight': 1.0, 'num_bins': 12},
            'SEGM_LOSS_CONFIG': {'weight': 1.0},
            'CORNER_LOSS_CONFIG': {'weight': 1.0},
            'IOUSCORE_LOSS_CONFIG': {'weight': 1.0, 'iou_fg_thresh': 0.75,
                                     'iou_bg_thresh': 0.25},
        }),
    })


def _build_pair(cfg, in_ch=12):
    """Reference head (random weights) + our head with ported weights."""
    # the reference head's pc_range/fm sizes derive from the assigner args;
    # use a pc_range whose fm is (FM_H, FM_W) at stride 8 and 0.05 voxels
    pc_range = np.array([0., -FM_H * 0.05 * 8 / 2, -3.,
                         FM_W * 0.05 * 8, FM_H * 0.05 * 8 / 2, 1.],
                        np.float32)
    ref = ref_head_mod.CenterAFHeadSingle(
        model_cfg=cfg, input_channels=in_ch, num_class=1,
        class_names=['Car'], voxel_size=VOXEL_SIZE, grid_size=GRID_SIZE,
        point_cloud_range=pc_range, predict_boxes_when_training=True)
    rng = np.random.RandomState(1)
    for m in ref.modules():
        if type(m).__name__ == 'BatchNorm2d':
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                rng.rand(m.num_features).astype(np.float32) + 0.5))
    # lift the hm bias above zero: with the untrained -2.19 focal bias every
    # logit is negative, so the maxpool-NMS zeros tie for top-k and the
    # selection order is arbitrary on both sides; positive distinct peaks
    # make the decode comparison meaningful
    with torch.no_grad():
        list(getattr(ref, 'hm'))[-1].bias.copy_(torch.tensor([1.0]))

    ours = CenterAFHeadSingle(
        model_cfg=StaticConfig(cfg), input_channels=in_ch, num_class=1,
        class_names=['Car'], voxel_size=tuple(VOXEL_SIZE),
        point_cloud_range=tuple(float(v) for v in pc_range))
    params, stats = port.port_center_af_head(ref, cfg.HEADS_CONFIG,
                                             num_class=1)
    variables = {'params': port.as_jnp_tree(params),
                 'batch_stats': port.as_jnp_tree(stats)}
    return ref, ours, variables, pc_range


def test_center_af_head_eval_forward_matches_reference():
    cfg = _head_cfg()
    ref, ours, variables, pc_range = _build_pair(cfg)
    rng = np.random.RandomState(2)
    feat = rng.randn(2, 12, FM_H, FM_W).astype(np.float32)

    ref.eval()
    with torch.no_grad():
        out_ref = ref({'spatial_features_2d': torch.from_numpy(feat)})

    batch = {'spatial_features_2d': jnp.asarray(feat.transpose(0, 2, 3, 1))}
    out = ours.apply(variables, batch, train=False)

    np.testing.assert_allclose(
        np.asarray(out['batch_box_preds']),
        out_ref['batch_box_preds'].numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out['batch_cls_preds']),
        out_ref['batch_cls_preds'].numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out['batch_iouscore_preds']),
        out_ref['batch_iouscore_preds'].numpy(), rtol=1e-4, atol=1e-4)


def test_end_to_end_box_ranking_matches_reference():
    """Composite chain BEV backbone -> CenterAF head with transplanted
    weights on one 'scan': the decoded top-k boxes and their score ranking
    must match the reference stack exactly (the deepest reference chain that
    runs on CPU — the sparse backbone needs the spconv CUDA extension)."""
    bev_cfg = EasyDict({'LAYER_NUMS': [1, 1], 'LAYER_STRIDES': [1, 2],
                        'NUM_FILTERS': [16, 32],
                        'UPSAMPLE_STRIDES': [1, 2],
                        'NUM_UPSAMPLE_FILTERS': [6, 6]})
    head_cfg = _head_cfg(k_infer=15)
    rng = np.random.RandomState(5)
    x = rng.randn(1, 8, FM_H, FM_W).astype(np.float32)

    ref_bb = ref_bev.BaseBEVBackbone(bev_cfg, input_channels=8)
    ref_hd, ours_hd, head_vars, pc_range = _build_pair(head_cfg, in_ch=12)
    ref_bb.eval()
    ref_hd.eval()
    with torch.no_grad():
        d = ref_bb({'spatial_features': torch.from_numpy(x)})
        out_ref = ref_hd(d)

    ours_bb = BaseBEVBackbone(model_cfg=bev_cfg, input_channels=8)
    bb_params, bb_stats = port.port_bev_backbone(ref_bb)
    bb_vars = {'params': port.as_jnp_tree(bb_params),
               'batch_stats': port.as_jnp_tree(bb_stats)}
    d2 = ours_bb.apply(bb_vars, {'spatial_features': jnp.asarray(
        x.transpose(0, 2, 3, 1))}, train=False)
    out_got = ours_hd.apply(head_vars, d2, train=False)

    boxes_ref = out_ref['batch_box_preds'].numpy()
    boxes_got = np.asarray(out_got['batch_box_preds'])
    cls_ref = out_ref['batch_cls_preds'].numpy()
    cls_got = np.asarray(out_got['batch_cls_preds'])
    np.testing.assert_allclose(boxes_got, boxes_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(cls_got, cls_ref, rtol=1e-3, atol=1e-4)
    # ranking identical (top-k order IS the score ranking)
    np.testing.assert_array_equal(np.argsort(-cls_got[0, :, 0]),
                                  np.argsort(-cls_ref[0, :, 0]))


def test_center_af_head_train_losses_match_reference():
    cfg = _head_cfg()
    ref, ours, variables, pc_range = _build_pair(cfg)
    rng = np.random.RandomState(3)
    feat = rng.randn(2, 12, FM_H, FM_W).astype(np.float32)

    # gt boxes inside the reduced range
    b, m = 2, 6
    gt = np.zeros((b, m, 8), np.float32)
    for k in range(b):
        n = 4 if k == 0 else 2
        gt[k, :n, 0] = rng.uniform(2, FM_W * 0.4 - 2, n)
        gt[k, :n, 1] = rng.uniform(-FM_H * 0.2 + 2, FM_H * 0.2 - 2, n)
        gt[k, :n, 2] = rng.uniform(-1.5, 0.0, n)
        gt[k, :n, 3] = rng.uniform(2.5, 4.5, n)
        gt[k, :n, 4] = rng.uniform(1.4, 2.0, n)
        gt[k, :n, 5] = rng.uniform(1.3, 1.8, n)
        gt[k, :n, 6] = rng.uniform(-np.pi, np.pi, n)
        gt[k, :n, 7] = 1
    # scale gt x/y into the reduced pc_range
    gt[..., 0] = np.clip(gt[..., 0], 0.5, FM_W * 0.05 * 8 - 0.5)
    gt[..., 1] = np.clip(gt[..., 1], -FM_H * 0.05 * 8 / 2 + 0.5,
                         FM_H * 0.05 * 8 / 2 - 0.5)
    gt[gt[..., 7] == 0] = 0

    ref.train()
    ref({'spatial_features_2d': torch.from_numpy(feat),
         'gt_boxes': torch.from_numpy(gt)})
    loss_ref, tb_ref = ref.get_loss()

    batch = {'spatial_features_2d': jnp.asarray(feat.transpose(0, 2, 3, 1)),
             'gt_boxes': jnp.asarray(gt)}
    out = ours.apply(variables, batch, train=True,
                     mutable=['batch_stats'])[0]
    loss_got, tb_got = center_af_head_loss(StaticConfig(cfg),
                                           out['head_ret'])

    for term in ['rpn_hm_loss', 'rpn_offset_loss', 'rpn_height_loss',
                 'rpn_dim_loss', 'rpn_rot_loss', 'rpn_corner_loss',
                 'rpn_iouscore_loss']:
        r = tb_ref[term]
        r = r.item() if torch.is_tensor(r) else float(r)
        np.testing.assert_allclose(float(tb_got[term]), r, rtol=2e-3,
                                   err_msg=term)

    # segm loss: its target raster differs from cv2.fillPoly in a 1-px
    # boundary band (test_ref_parity_assigner), so (a) end-to-end within 3%
    # and (b) exact loss math when fed the reference's own raster
    r_segm = float(tb_ref['rpn_segm_loss'])
    np.testing.assert_allclose(float(tb_got['rpn_segm_loss']), r_segm,
                               rtol=3e-2)
    from fv2p_tpu.models.dense_heads.center_af_head import _segm_loss
    ref_raster = ref.forward_ret_dict['segm_target'].numpy().transpose(
        0, 2, 3, 1)
    exact = _segm_loss({'segm_pred': out['head_ret']['segm_pred'],
                        'segm_target': jnp.asarray(ref_raster)})
    np.testing.assert_allclose(float(exact), r_segm, rtol=2e-4)

    np.testing.assert_allclose(float(loss_got), float(loss_ref.item()),
                               rtol=1e-2)
