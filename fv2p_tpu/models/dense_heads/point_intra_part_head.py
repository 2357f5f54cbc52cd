"""Intra-object part-location head for PartA2 (reference
``pcdet/models/dense_heads/point_intra_part_head.py:7-127``).

Per-point FG/BG classification plus a 3-dim sigmoid regression of the
point's normalized location inside its gt box (reference
``point_head_template.assign_stack_targets:116-124``: rotate into the box
frame, divide by dims, +0.5). Fixed-shape (B, K) layout; padding rows carry
label -1 (ignored) via the ``point_valid`` mask.
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pointops
from ...utils import box_coder_utils, common_utils, loss_utils
from .point_head_box import assign_point_box_targets
from .point_head_simple import assign_point_targets

_BN = dict(momentum=0.99, epsilon=1e-3)


def assign_part_targets(point_coords, gt_boxes_with_cls):
    """Normalized intra-box coords for FG points (0 elsewhere).

    point_coords (B, K, 3); gt (B, M, 8). Returns (B, K, 3) in [0, 1].
    """

    def single(points, gt):
        boxes = gt[:, :7]
        valid = gt[:, 7] > 0
        idx = pointops.points_in_boxes_index(points, boxes, valid)
        box = boxes[jnp.maximum(idx, 0)]                       # (K, 7)
        local = common_utils.rotate_points_along_z(
            (points - box[:, 0:3])[:, None, :], -box[:, 6])[:, 0, :]
        part = local / jnp.maximum(box[:, 3:6], 1e-4) + 0.5
        return jnp.where((idx >= 0)[:, None], part, 0.0)

    return jax.vmap(single)(point_coords, gt_boxes_with_cls)


def point_intra_part_head_loss(model_cfg, ret):
    """Focal seg loss + part BCE (reference
    ``point_intra_part_head.get_loss:71-80`` +
    ``point_head_template.get_cls_layer_loss/get_part_layer_loss:176-214``)."""
    from .point_head_simple import point_head_loss
    w = model_cfg.LOSS_CONFIG.LOSS_WEIGHTS
    labels = ret['point_cls_labels']                # (B, K) -1/0/1
    pos = labels > 0
    normalizer = jnp.clip(jnp.sum(pos.astype(jnp.float32)), min=1.0)
    loss_cls, _ = point_head_loss(model_cfg, ret)

    part_preds = ret['point_part_preds']            # (B, K, 3)
    part_labels = ret['point_part_labels']
    p = jax.nn.sigmoid(part_preds)
    eps = 1e-7
    bce = -(part_labels * jnp.log(jnp.clip(p, eps, 1.0))
            + (1 - part_labels) * jnp.log(jnp.clip(1 - p, eps, 1.0)))
    loss_part = jnp.sum(jnp.sum(bce, axis=-1) * pos.astype(jnp.float32))
    loss_part = loss_part / (3.0 * normalizer) * float(w['point_part_weight'])

    total = loss_cls + loss_part
    tb = {'point_loss_cls': loss_cls, 'point_loss_part': loss_part}
    if 'point_box_preds' in ret:
        box_preds = ret['point_box_preds'].reshape(
            -1, ret['point_box_preds'].shape[-1])
        box_labels = ret['point_box_labels'].reshape(-1, box_preds.shape[-1])
        fg = pos.reshape(-1).astype(jnp.float32)
        code_w = jnp.asarray(w['code_weights'], jnp.float32) \
            if 'code_weights' in w else 1.0
        l1 = loss_utils.smooth_l1(box_preds - box_labels, beta=1.0 / 9.0)
        l1 = l1 * code_w
        loss_box = jnp.sum(l1 * (fg / normalizer)[:, None]) \
            * float(w.get('point_box_weight', 1.0))
        total = total + loss_box
        tb['point_loss_box'] = loss_box
    return total, tb


class PointIntraPartOffsetHead(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        cfg = self.model_cfg
        feats = batch_dict['point_features']        # (B, K, C)
        b, k, c = feats.shape
        x = feats.reshape(-1, c)

        def fc_stack(xx, fcs, out_ch, name):
            for i, ch in enumerate(fcs):
                xx = nn.Dense(ch, use_bias=False, name=f'{name}_fc{i}')(xx)
                xx = nn.BatchNorm(use_running_average=not train, **_BN,
                                  name=f'{name}_bn{i}')(xx)
                xx = nn.relu(xx)
            return nn.Dense(out_ch, name=f'{name}_out')(xx)

        n_cls = 1 if cfg.get('CLASS_AGNOSTIC', True) else self.num_class
        cls_logits = fc_stack(x, cfg.CLS_FC, n_cls, 'cls').reshape(b, k, n_cls)
        part_preds = fc_stack(x, cfg.PART_FC, 3, 'part').reshape(b, k, 3)

        # optional per-point box branch (PartA2-free, reference
        # point_intra_part_head.py:26-37,105-111)
        coder = None
        if cfg.TARGET_CONFIG.get('BOX_CODER', None) is not None:
            tc = cfg.TARGET_CONFIG
            coder = getattr(box_coder_utils, tc.BOX_CODER)(
                **dict(tc.get('BOX_CODER_CONFIG', {})))
            box_preds = fc_stack(x, cfg.REG_FC, coder.code_size,
                                 'box').reshape(b, k, -1)

        batch_dict['point_cls_scores'] = jnp.max(
            jax.nn.sigmoid(cls_logits), axis=-1)
        batch_dict['point_part_offset'] = jax.nn.sigmoid(part_preds)

        if train:
            labels = assign_point_targets(
                batch_dict['point_coords'], batch_dict['gt_boxes'],
                tuple(cfg.TARGET_CONFIG.GT_EXTRA_WIDTH), n_cls)
            if 'point_valid' in batch_dict:
                labels = jnp.where(batch_dict['point_valid'], labels, -1)
            part_labels = assign_part_targets(batch_dict['point_coords'],
                                              batch_dict['gt_boxes'])
            ret = {
                'point_cls_preds': cls_logits,
                'point_cls_labels': labels,
                'point_part_preds': part_preds,
                'point_part_labels': part_labels,
            }
            if coder is not None:
                _, box_labels = assign_point_box_targets(
                    batch_dict['point_coords'], batch_dict['gt_boxes'],
                    tuple(cfg.TARGET_CONFIG.GT_EXTRA_WIDTH), n_cls, coder)
                ret['point_box_preds'] = box_preds
                ret['point_box_labels'] = box_labels
            batch_dict['point_head_ret'] = ret
        if coder is not None:
            pred_classes = jnp.argmax(cls_logits, axis=-1) + 1
            decoded = coder.decode(box_preds, batch_dict['point_coords'],
                                   pred_classes)
            batch_dict['batch_cls_preds'] = cls_logits
            batch_dict['batch_box_preds'] = decoded
            batch_dict['cls_preds_normalized'] = False
        return batch_dict
