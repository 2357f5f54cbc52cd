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
from ...utils import common_utils
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

    return loss_cls + loss_part, {'point_loss_cls': loss_cls,
                                  'point_loss_part': loss_part}


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
            batch_dict['point_head_ret'] = {
                'point_cls_preds': cls_logits,
                'point_cls_labels': labels,
                'point_part_preds': part_preds,
                'point_part_labels': part_labels,
            }
        return batch_dict
