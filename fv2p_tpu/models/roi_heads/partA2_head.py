"""Part-aggregation RoI head for PartA2 (reference
``pcdet/models/roi_heads/partA2_head.py:11-225``).

TPU re-design of the second stage: the reference RoI-aware-pools point part
and RPN features into per-RoI 12^3 grids, converts the sparse occupied cells
to ``spconv`` tensors and runs two small submanifold conv stacks. Here the
pooled grids are kept DENSE — at 12^3 x 64ch the full grid convolutions map
straight onto the MXU and cost less than sparse bookkeeping — and
submanifold semantics are preserved exactly by (a) empty cells being
all-zero inputs (zero contribution to neighbors) and (b) masking conv
outputs and BatchNorm statistics to occupied cells (``MaskedBatchNorm``).
"""
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roiaware_pool import roiaware_pool3d_batch
from ...ops.sparse.conv import MaskedBatchNorm
from ...utils import box_coder_utils, common_utils
from .iouguided_roi_head import assign_targets, proposal_layer
from .pvrcnn_head import pvrcnn_head_loss

_BN = dict(momentum=0.99, epsilon=1e-3)

parta2_head_loss = pvrcnn_head_loss


class _MaskedConvBlock(nn.Module):
    """k3 dense 3D conv + masked BN + ReLU, outputs zeroed off-occupancy
    (submanifold semantics on a dense grid)."""
    out_channels: int

    @nn.compact
    def __call__(self, x, mask, *, train: bool):
        # x: (N, S, S, S, C); mask: (N, S, S, S)
        y = nn.Conv(self.out_channels, (3, 3, 3),
                    padding=((1, 1), (1, 1), (1, 1)), use_bias=False,
                    name='conv')(x)
        n = y.shape[0]
        flat = y.reshape(-1, self.out_channels)
        flat = MaskedBatchNorm(name='bn')(flat, mask.reshape(-1),
                                          use_running_average=not train)
        y = nn.relu(flat).reshape(y.shape)
        return y * mask[..., None]


class PartA2FCHead(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    point_cloud_range: Tuple[float, ...]
    voxel_size: Tuple[float, float, float]

    def _box_coder(self):
        return getattr(box_coder_utils, self.model_cfg.TARGET_CONFIG.BOX_CODER)()

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        cfg = self.model_cfg
        rois, roi_scores, roi_labels, roi_valid = proposal_layer(
            batch_dict['batch_box_preds'], batch_dict['batch_cls_preds'],
            cfg.NMS_CONFIG['TRAIN' if train else 'TEST'])
        batch_dict.update(rois=rois, roi_scores=roi_scores,
                          roi_labels=roi_labels, roi_valid=roi_valid)

        ret = {}
        if train:
            key = self.make_rng('sampling')
            targets = assign_targets(key, batch_dict, cfg.TARGET_CONFIG)
            batch_dict['rois'] = targets['rois']
            batch_dict['roi_labels'] = targets['roi_labels']
            ret.update(targets)

        batch_rois = batch_dict['rois']
        b, r = batch_rois.shape[0], batch_rois.shape[1]
        s = int(cfg.ROI_AWARE_POOL.POOL_SIZE)
        c0 = int(cfg.ROI_AWARE_POOL.NUM_FEATURES) // 2

        points = batch_dict['point_coords']          # (B, K, 3)
        point_feats = batch_dict['point_features']   # (B, K, C)
        point_valid = batch_dict.get(
            'point_valid', jnp.ones(points.shape[:2], bool))
        scores = jax.lax.stop_gradient(
            batch_dict['point_cls_scores'])[..., None]      # (B, K, 1)
        if cfg.get('DISABLE_PART', False):
            offsets = points                    # PartA2-free (reference :124)
        else:
            offsets = batch_dict['point_part_offset']
        # zero part offsets of low-score points (reference :124-126)
        keep = scores >= float(cfg.SEG_MASK_SCORE_THRESH)
        part_feats = jnp.concatenate([jnp.where(keep, offsets, 0.0), scores],
                                     axis=-1)               # (B, K, 4)

        pooled_part = roiaware_pool3d_batch(
            points, part_feats, point_valid, batch_rois[..., :7], s, 'avg')
        pooled_rpn = roiaware_pool3d_batch(
            points, point_feats, point_valid, batch_rois[..., :7], s, 'max')
        pooled_part = pooled_part.reshape(b * r, s, s, s, -1)
        pooled_rpn = pooled_rpn.reshape(b * r, s, s, s, -1)

        # occupancy from the part grid (reference sparse_idx :188)
        occ = jnp.abs(pooled_part).sum(-1) > 0               # (BR, S, S, S)

        x_part = _MaskedConvBlock(64, name='part_conv1')(
            pooled_part, occ, train=train)
        x_part = _MaskedConvBlock(c0, name='part_conv2')(
            x_part, occ, train=train)
        x_rpn = _MaskedConvBlock(64, name='rpn_conv1')(
            pooled_rpn, occ, train=train)
        x_rpn = _MaskedConvBlock(c0, name='rpn_conv2')(
            x_rpn, occ, train=train)

        merged = jnp.concatenate([x_rpn, x_part], axis=-1)   # (BR,S,S,S,2c0)
        x = merged.reshape(b * r, -1)

        for k, ch in enumerate(cfg.SHARED_FC):
            x = nn.Dense(ch, use_bias=False, name=f'shared_fc{k}')(x)
            x = nn.BatchNorm(use_running_average=not train, **_BN,
                             name=f'shared_bn{k}')(x)
            x = nn.relu(x)
            if k != len(cfg.SHARED_FC) - 1 and float(cfg.DP_RATIO) > 0:
                x = nn.Dropout(float(cfg.DP_RATIO), deterministic=not train)(x)

        def head(xx, fc_list, out_ch, name, init_std=0.0):
            for k2, ch in enumerate(fc_list):
                xx = nn.Dense(ch, use_bias=False, name=f'{name}_fc{k2}')(xx)
                xx = nn.BatchNorm(use_running_average=not train, **_BN,
                                  name=f'{name}_bn{k2}')(xx)
                xx = nn.relu(xx)
                if k2 == 0 and float(cfg.DP_RATIO) > 0:
                    xx = nn.Dropout(float(cfg.DP_RATIO),
                                    deterministic=not train)(xx)
            init = nn.initializers.normal(init_std) if init_std > 0 \
                else nn.initializers.lecun_normal()
            return nn.Dense(out_ch, kernel_init=init, name=f'{name}_out')(xx)

        rcnn_cls = head(x, cfg.CLS_FC, self.num_class, 'cls')
        rcnn_reg = head(x, cfg.REG_FC,
                        self._box_coder().code_size * self.num_class, 'reg',
                        init_std=0.001)

        if train:
            ret['rcnn_cls'] = rcnn_cls
            ret['rcnn_reg'] = rcnn_reg
            ret['rois_sampled'] = batch_dict['rois']
            batch_dict['roi_head_ret'] = ret
        else:
            coder = self._box_coder()
            cls_preds = rcnn_cls.reshape(b, r, -1)
            box_preds = rcnn_reg.reshape(b, r, coder.code_size)
            local_rois = batch_rois.at[..., 0:3].set(0.0)
            decoded = coder.decode(box_preds, local_rois)
            flat = decoded.reshape(b * r, 1, -1)
            flat = common_utils.rotate_points_along_z(
                flat, batch_rois[..., 6].reshape(-1))
            decoded = flat.reshape(b, r, -1).at[..., 0:3].add(
                batch_rois[..., 0:3])
            batch_dict['batch_cls_preds'] = cls_preds
            batch_dict['batch_box_preds'] = decoded
            batch_dict['has_class_labels'] = True
            batch_dict['cls_preds_normalized'] = False
        return batch_dict
