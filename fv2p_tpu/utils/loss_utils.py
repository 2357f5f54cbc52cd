"""Loss functions in pure jnp with explicit validity masks (TPU-native
re-design of reference ``pcdet/utils/loss_utils.py`` — boolean indexing is
replaced by mask-weighted reductions so every loss is jittable)."""
import jax
import jax.numpy as jnp
import numpy as np

from . import box_utils, center_utils


def sigmoid_ce_with_logits(logits, labels):
    """max(x,0) - x*z + log1p(exp(-|x|)) (reference loss_utils.py:32-49)."""
    return (jnp.clip(logits, min=0.0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def sigmoid_focal_loss(logits, targets, weights, gamma=2.0, alpha=0.25):
    """Per-element sigmoid focal loss x anchor weights
    (reference SigmoidFocalClassificationLoss, loss_utils.py:17-80)."""
    p = jax.nn.sigmoid(logits)
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1.0 - p) + (1.0 - targets) * p
    focal_w = alpha_w * jnp.power(pt, gamma)
    loss = focal_w * sigmoid_ce_with_logits(logits, targets)
    if weights.ndim == loss.ndim - 1:
        weights = weights[..., None]
    return loss * weights


def smooth_l1(diff, beta=1.0):
    n = jnp.abs(diff)
    if beta < 1e-5:
        return n
    return jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def centernet_focal_loss(pred_logits, gt_hm, gamma=4.0, alpha=2.0):
    """CornerNet-style focal loss on heatmaps
    (reference CenterNetFocalLoss, loss_utils.py:410-462).

    pred_logits/gt_hm: (B, H, W, C). Normalized by the number of positives.
    """
    y = jnp.clip(jax.nn.sigmoid(pred_logits), 1e-4, 1 - 1e-4)
    pos = (gt_hm == 1.0).astype(y.dtype)
    neg = (gt_hm < 1.0).astype(y.dtype)
    neg_weights = jnp.power(1 - gt_hm, gamma)
    pos_loss = jnp.log(y) * jnp.power(1 - y, alpha) * pos
    neg_loss = jnp.log(1 - y) * jnp.power(y, alpha) * neg_weights * neg
    num_pos = jnp.sum(pos)
    pos_loss = jnp.sum(pos_loss)
    neg_loss = jnp.sum(neg_loss)
    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss)
                     / jnp.clip(num_pos, min=1.0))


def centernet_res_loss(output, mask, ind, target, res_func='l1'):
    """Gathered residual regression loss
    (reference CenterNetResLoss, loss_utils.py:465-508).

    Args:
        output: (B, H, W, C) prediction map.
        mask: (B, K) validity. ind: (B, K) flat indices. target: (B, K, C).
    Returns scalar: per-channel masked mean, summed over channels.
    """
    pred = center_utils.gather_feat_nhwc(output, ind)  # (B, K, C)
    if res_func == 'l1':
        loss = jnp.abs(pred - target)
    elif res_func == 'smooth-l1':
        loss = smooth_l1(pred - target)
    else:
        raise NotImplementedError(res_func)
    m = mask.astype(loss.dtype)[..., None]
    denom = jnp.clip(jnp.sum(m), min=1.0)
    return jnp.sum(loss * m) / denom


def rot_binres_loss(pred, ry_label, mask, num_head_bin=12):
    """Bin + residual heading loss (reference get_rot_binres_loss,
    loss_utils.py:334-408): CE over bins + smooth-l1 on the gt-bin residual,
    both masked means."""
    bin_label, res_norm_label = box_utils.encode_rot_binres(ry_label, num_head_bin)
    bins = pred[..., :num_head_bin]
    res = pred[..., num_head_bin:2 * num_head_bin]

    logp = jax.nn.log_softmax(bins, axis=-1)
    ce = -jnp.take_along_axis(logp, bin_label[..., None], axis=-1)[..., 0]

    res_pred = jnp.take_along_axis(res, bin_label[..., None], axis=-1)[..., 0]
    sl1 = smooth_l1(res_pred - res_norm_label)

    m = mask.astype(pred.dtype)
    denom = jnp.clip(jnp.sum(m), min=1.0)
    return jnp.sum((ce + sl1) * m) / denom


def corner_loss_mse(pred_boxes, gt_boxes, mask):
    """Masked corner MSE (reference get_corner_loss_mse, loss_utils.py:246-283):
    per-axis mean over all (valid box, corner) elements, summed over xyz.

    pred_boxes/gt_boxes: (N, 7); mask: (N,).
    """
    pc = box_utils.boxes_to_corners_3d(pred_boxes)  # (N, 8, 3)
    gc = box_utils.boxes_to_corners_3d(gt_boxes)
    m = mask.astype(pc.dtype)[:, None]
    denom = jnp.clip(jnp.sum(m) * 8.0, min=1.0)
    se = jnp.square(pc - gc)  # (N, 8, 3)
    per_axis = jnp.sum(se * m[..., None], axis=(0, 1)) / denom  # (3,)
    return jnp.sum(per_axis)


def iouscore_loss_bce(iou_preds, iou_gts, valid_mask,
                      iou_fg_thresh=0.75, iou_bg_thresh=0.25):
    """BCE of sigmoid(iou_pred) against soft iou-interval labels
    (reference get_iouscore_loss_bce, loss_utils.py:284-330)."""
    fg = iou_gts > iou_fg_thresh
    bg = iou_gts < iou_bg_thresh
    interval = (~fg) & (~bg)
    labels = fg.astype(iou_preds.dtype)
    labels = jnp.where(
        interval,
        (iou_gts - iou_bg_thresh) / (iou_fg_thresh - iou_bg_thresh), labels)
    p = jnp.clip(jax.nn.sigmoid(iou_preds), 1e-7, 1 - 1e-7)
    bce = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    m = valid_mask.astype(iou_preds.dtype)
    return jnp.sum(bce * m) / jnp.clip(jnp.sum(m), min=1.0)
