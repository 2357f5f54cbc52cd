"""Point-wise 3D box head for PointRCNN (reference
``pcdet/models/dense_heads/point_head_box.py``): per-point cls + box
regression (PointResidualCoder), proposals decoded from foreground points."""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pointops
from ...utils import box_coder_utils, loss_utils
from .point_head_simple import assign_point_targets

_BN = dict(momentum=0.99, epsilon=1e-3)


def assign_point_box_targets(point_coords, gt_boxes_with_cls, extra_width,
                             num_class, coder):
    """cls labels (B, K) (-1 ignore) + box labels (B, K, code) at fg points."""

    def single(points, gt):
        boxes = gt[:, :7]
        cls = gt[:, 7].astype(jnp.int32)
        valid = cls > 0
        idx = pointops.points_in_boxes_index(points, boxes, valid)
        enlarged = boxes.at[:, 3:6].add(jnp.asarray(extra_width, boxes.dtype))
        idx_ext = pointops.points_in_boxes_index(points, enlarged, valid)
        fg = idx >= 0
        ignore = (~fg) & (idx_ext >= 0)
        labels = jnp.where(fg, cls[jnp.maximum(idx, 0)], 0)
        labels = jnp.where(ignore, -1, labels).astype(jnp.int32)

        gt_of_pts = gt[jnp.maximum(idx, 0)]
        box_labels = coder.encode(gt_of_pts[:, :7], points,
                                  gt_of_pts[:, 7].astype(jnp.int32))
        box_labels = jnp.where(fg[:, None], box_labels, 0.0)
        return labels, box_labels

    return jax.vmap(single)(point_coords, gt_boxes_with_cls)


class PointHeadBox(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int

    def _coder(self):
        tc = self.model_cfg.TARGET_CONFIG
        return getattr(box_coder_utils, tc.BOX_CODER)(
            **dict(tc.get('BOX_CODER_CONFIG', {})))

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        cfg = self.model_cfg
        feats = batch_dict['point_features']        # (B, K, C)
        b, k, c = feats.shape
        x = feats.reshape(-1, c)

        def mlp_head(xx, fc_list, out_ch, name):
            for i, ch in enumerate(fc_list):
                xx = nn.Dense(ch, use_bias=False, name=f'{name}_fc{i}')(xx)
                xx = nn.BatchNorm(use_running_average=not train, **_BN,
                                  name=f'{name}_bn{i}')(xx)
                xx = nn.relu(xx)
            return nn.Dense(out_ch, name=f'{name}_out')(xx)

        coder = self._coder()
        cls_preds = mlp_head(x, cfg.CLS_FC, self.num_class, 'cls').reshape(b, k, -1)
        box_preds = mlp_head(x, cfg.REG_FC, coder.code_size, 'box').reshape(b, k, -1)

        scores = jax.nn.sigmoid(cls_preds)
        batch_dict['point_cls_scores'] = jnp.max(scores, axis=-1)

        ret = {'point_cls_preds': cls_preds, 'point_box_preds': box_preds}
        if train:
            labels, box_labels = assign_point_box_targets(
                batch_dict['point_coords'], batch_dict['gt_boxes'],
                tuple(cfg.TARGET_CONFIG.GT_EXTRA_WIDTH), self.num_class,
                coder)
            ret['point_cls_labels'] = labels
            ret['point_box_labels'] = box_labels

        # decode proposals at every point (reference generate_predicted_boxes)
        pred_classes = jnp.argmax(cls_preds, axis=-1) + 1
        decoded = coder.decode(box_preds, batch_dict['point_coords'],
                               pred_classes)
        batch_dict['batch_cls_preds'] = cls_preds
        batch_dict['batch_box_preds'] = decoded
        batch_dict['cls_preds_normalized'] = False
        batch_dict['point_head_ret'] = ret
        return batch_dict


def point_head_box_loss(model_cfg, ret):
    """Focal cls + weighted smooth-l1 box loss (reference
    point_head_template.get_cls_layer_loss + get_box_layer_loss)."""
    lw = model_cfg.LOSS_CONFIG.LOSS_WEIGHTS
    logits = ret['point_cls_preds']
    labels = ret['point_cls_labels']
    n_cls = logits.shape[-1]
    flat_logits = logits.reshape(-1, n_cls)
    flat_labels = labels.reshape(-1)

    positives = flat_labels > 0
    negatives = flat_labels == 0
    cls_weights = (negatives * 1.0 + positives * 1.0).astype(jnp.float32)
    pos_norm = jnp.clip(jnp.sum(positives.astype(jnp.float32)), min=1.0)
    cls_weights = cls_weights / pos_norm
    one_hot = jax.nn.one_hot(jnp.clip(flat_labels, 0, None), n_cls + 1)[..., 1:]
    cls_loss = jnp.sum(loss_utils.sigmoid_focal_loss(
        flat_logits, one_hot, cls_weights)) * lw['point_cls_weight']

    box_preds = ret['point_box_preds'].reshape(-1, ret['point_box_preds'].shape[-1])
    box_labels = ret['point_box_labels'].reshape(-1, box_preds.shape[-1])
    fg = positives.astype(jnp.float32)
    code_w = jnp.asarray(lw['code_weights'], jnp.float32)
    l1 = loss_utils.smooth_l1(box_preds - box_labels, beta=1.0 / 9.0) * code_w
    box_loss = jnp.sum(l1 * (fg / pos_norm)[:, None]) * lw['point_box_weight']

    total = cls_loss + box_loss
    return total, {'point_loss_cls': cls_loss, 'point_loss_box': box_loss,
                   'point_loss': total}
