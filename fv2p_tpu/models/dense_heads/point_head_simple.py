"""Per-keypoint FG/BG segmentation head (reference
``point_head_simple.py`` + ``point_head_template.py``).

Targets: points inside a gt box are FG; points inside the enlarged box but
outside the original are ignored (-1) — reference
point_head_template.assign_stack_targets (:84-104) re-expressed with
fixed-shape containment masks."""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pointops
from ...utils import loss_utils

_BN = dict(momentum=0.99, epsilon=1e-3)


def assign_point_targets(point_coords, gt_boxes_with_cls, extra_width,
                         num_class):
    """point_coords (B, K, 3); gt (B, M, 8). Returns labels (B, K) int32."""

    def single(points, gt):
        boxes = gt[:, :7]
        cls = gt[:, 7].astype(jnp.int32)
        valid = cls > 0
        idx = pointops.points_in_boxes_index(points, boxes, valid)
        enlarged = boxes.at[:, 3:6].add(jnp.asarray(extra_width, boxes.dtype))
        idx_ext = pointops.points_in_boxes_index(points, enlarged, valid)
        fg = idx >= 0
        ignore = (~fg) & (idx_ext >= 0)
        if num_class == 1:
            labels = jnp.where(fg, 1, 0)
        else:
            labels = jnp.where(fg, cls[jnp.maximum(idx, 0)], 0)
        return jnp.where(ignore, -1, labels).astype(jnp.int32)

    return jax.vmap(single)(point_coords, gt_boxes_with_cls)


class PointHeadSimple(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        cfg = self.model_cfg
        if cfg.get('USE_POINT_FEATURES_BEFORE_FUSION', False):
            feats = batch_dict['point_features_before_fusion']
        else:
            feats = batch_dict['point_features']    # (B, K, C)
        b, k, c = feats.shape
        x = feats.reshape(-1, c)
        for i, ch in enumerate(cfg.CLS_FC):
            x = nn.Dense(ch, use_bias=False, dtype=self.compute_dtype,
                         name=f'cls_fc{i}')(x)
            x = nn.BatchNorm(use_running_average=not train, **_BN,
                             name=f'cls_bn{i}')(x)
            x = nn.relu(x)
        n_out = 1 if cfg.get('CLASS_AGNOSTIC', True) else self.num_class
        logits = nn.Dense(n_out, name='cls_out')(x).reshape(b, k, n_out)

        scores = jax.nn.sigmoid(logits)
        batch_dict['point_cls_scores'] = jnp.max(scores, axis=-1)   # (B, K)

        ret = {'point_cls_preds': logits}
        if train:
            ret['point_cls_labels'] = assign_point_targets(
                batch_dict['point_coords'], batch_dict['gt_boxes'],
                tuple(cfg.TARGET_CONFIG.GT_EXTRA_WIDTH),
                n_out)
        batch_dict['point_head_ret'] = ret

        if not train:
            batch_dict['batch_pointseg_preds'] = jnp.concatenate(
                [batch_dict['point_coords'], scores], axis=-1)
        return batch_dict


def point_head_loss(model_cfg, ret):
    """Focal cls loss normalized by positives (reference
    point_head_template.get_cls_layer_loss :141-174)."""
    logits = ret['point_cls_preds']               # (B, K, C)
    labels = ret['point_cls_labels']              # (B, K)
    b = logits.shape[0]
    n_cls = logits.shape[-1]
    flat_logits = logits.reshape(-1, n_cls)
    flat_labels = labels.reshape(-1)

    positives = flat_labels > 0
    negatives = flat_labels == 0
    cls_weights = (negatives * 1.0 + positives * 1.0).astype(jnp.float32)
    pos_norm = jnp.clip(jnp.sum(positives.astype(jnp.float32)), min=1.0)
    cls_weights = cls_weights / pos_norm

    one_hot = jax.nn.one_hot(jnp.clip(flat_labels, 0, None), n_cls + 1)[..., 1:]
    loss = loss_utils.sigmoid_focal_loss(flat_logits, one_hot, cls_weights)
    w = float(model_cfg.LOSS_CONFIG.LOSS_WEIGHTS['point_cls_weight'])
    point_loss = jnp.sum(loss) * w
    return point_loss, {'point_loss_cls': point_loss}
