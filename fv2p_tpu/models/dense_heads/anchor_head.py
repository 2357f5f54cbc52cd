"""Anchor-based RPN head (TPU-native re-design of reference
``anchor_head_single.py`` + ``anchor_head_template.py`` +
``target_assigner/{anchor_generator,axis_aligned_target_assigner}.py``).

All target assignment is vectorized jnp (vmapped over the batch) — the
per-sample / per-class python loops of the reference become masked
computations over the padded gt array."""
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import box_coder_utils, common_utils, loss_utils

_BN = dict(momentum=0.99, epsilon=1e-3)


def generate_anchors(anchor_generator_cfg, grid_size, point_cloud_range):
    """Static numpy anchors: (ny, nx, A, 7) with A = num_cls * num_rot
    (reference anchor_generator.py:17-62, align_center=False path)."""
    pr = point_cloud_range
    per_class = []
    for cfg in anchor_generator_cfg:
        stride = int(cfg.get('feature_map_stride', 8)) if hasattr(cfg, 'get') \
            else int(cfg['feature_map_stride'])
        fm_nx, fm_ny = grid_size[0] // stride, grid_size[1] // stride
        x_stride = (pr[3] - pr[0]) / (fm_nx - 1)
        y_stride = (pr[4] - pr[1]) / (fm_ny - 1)
        xs = pr[0] + np.arange(fm_nx) * x_stride
        ys = pr[1] + np.arange(fm_ny) * y_stride
        sizes = np.array(cfg['anchor_sizes'], np.float32)       # (S, 3)
        rots = np.array(cfg['anchor_rotations'], np.float32)    # (R,)
        heights = np.array(cfg['anchor_bottom_heights'], np.float32)  # (H,)
        s, r, h = len(sizes), len(rots), len(heights)
        anchors = np.zeros((fm_ny, fm_nx, h, s, r, 7), np.float32)
        anchors[..., 0] = xs[None, :, None, None, None]
        anchors[..., 1] = ys[:, None, None, None, None]
        anchors[..., 2] = heights[None, None, :, None, None]
        anchors[..., 3:6] = sizes[None, None, None, :, None, :]
        anchors[..., 6] = rots[None, None, None, None, :]
        anchors[..., 2] += anchors[..., 5] / 2  # bottom -> center
        per_class.append(anchors.reshape(fm_ny, fm_nx, h * s * r, 7))
    return np.concatenate(per_class, axis=2)  # (ny, nx, A, 7)


def boxes_nearest_bev_iou(boxes_a, boxes_b):
    """Axis-aligned IoU of nearest-axis-aligned BEV boxes (reference
    box_utils.boxes3d_nearest_bev_iou): swap dx/dy when |heading| in
    (pi/4, 3pi/4) after period limiting."""

    def aligned(b):
        rot = jnp.abs(common_utils.limit_period(b[:, 6], 0.5, np.pi))
        swap = rot > np.pi / 4
        dx = jnp.where(swap, b[:, 4], b[:, 3])
        dy = jnp.where(swap, b[:, 3], b[:, 4])
        return jnp.stack([b[:, 0] - dx / 2, b[:, 1] - dy / 2,
                          b[:, 0] + dx / 2, b[:, 1] + dy / 2], axis=1)

    a = aligned(boxes_a)
    b = aligned(boxes_b)
    iw = (jnp.minimum(a[:, None, 2], b[None, :, 2])
          - jnp.maximum(a[:, None, 0], b[None, :, 0]))
    ih = (jnp.minimum(a[:, None, 3], b[None, :, 3])
          - jnp.maximum(a[:, None, 1], b[None, :, 1]))
    inter = jnp.clip(iw, min=0) * jnp.clip(ih, min=0)
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    return inter / jnp.clip(area_a + area_b - inter, min=1e-6)


def assign_targets_single(anchors_flat, anchor_cls, gt_boxes, gt_classes,
                          matched_t, unmatched_t, box_coder):
    """One sample's axis-aligned assignment over ALL classes at once.

    Args:
        anchors_flat: (Na, 7); anchor_cls: (Na,) int32 1..C (per-anchor class).
        gt_boxes: (M, 7); gt_classes: (M,) int32 (0 = padding).
        matched_t/unmatched_t: (Na,) per-anchor thresholds.
    Returns: labels (Na,) int32 (-1 ignore / 0 bg / cls), reg_targets
        (Na, code), reg_weights (Na,).
    """
    gt_valid = gt_classes > 0
    overlap = boxes_nearest_bev_iou(anchors_flat, gt_boxes)       # (Na, M)
    class_match = anchor_cls[:, None] == gt_classes[None, :]
    overlap = jnp.where(class_match & gt_valid[None, :], overlap, -1.0)

    a2g_max = jnp.max(overlap, axis=1)
    a2g_arg = jnp.argmax(overlap, axis=1)
    g2a_max = jnp.max(overlap, axis=0)                             # (M,)
    # empty gts (max overlap == 0) are not force-matched (reference :155-157)
    g2a_max = jnp.where(g2a_max <= 0, -1.0, g2a_max)
    force = jnp.any((overlap == g2a_max[None, :]) & (g2a_max[None, :] > 0)
                    & gt_valid[None, :] & class_match, axis=1)

    pos = a2g_max >= matched_t
    bg = a2g_max < unmatched_t

    labels = jnp.full(anchors_flat.shape[0], -1, jnp.int32)
    labels = jnp.where(bg, 0, labels)
    labels = jnp.where(pos | force, gt_classes[a2g_arg], labels)

    fg = labels > 0
    targets = box_coder.encode(gt_boxes[a2g_arg], anchors_flat)
    reg_targets = jnp.where(fg[:, None], targets, 0.0)
    reg_weights = fg.astype(jnp.float32)
    return labels, reg_targets, reg_weights


def atss_assign_targets_single(anchors_flat, gt_boxes, gt_classes, topk,
                               box_coder, match_height=False):
    """Adaptive Training Sample Selection (reference
    ``target_assigner/atss_target_assigner.py:76-141``,
    https://arxiv.org/abs/1912.02424), fixed-shape: per gt, take the top-k
    center-closest anchors, threshold their IoU at mean+std, require the
    anchor center inside the gt's BEV box, then give each anchor its
    highest-IoU eligible gt (plus the per-gt best-IoU force match).

    Args: anchors_flat (Na, 7); gt_boxes (M, 7); gt_classes (M,) (0 = pad).
    Returns: labels (Na,), reg_targets (Na, code), reg_weights (Na,).
    """
    from ...utils import iou3d
    na = anchors_flat.shape[0]
    m = gt_boxes.shape[0]
    gt_valid = gt_classes > 0

    if match_height:
        ious = iou3d.boxes_iou3d(anchors_flat[:, :7], gt_boxes[:, :7])
    else:
        ious = iou3d.boxes_iou_bev(anchors_flat[:, :7], gt_boxes[:, :7])
    ious = jnp.where(gt_valid[None, :], ious, -1.0)            # (Na, M)

    dist = jnp.linalg.norm(
        anchors_flat[:, None, 0:3] - gt_boxes[None, :, 0:3], axis=-1)
    dist = jnp.where(gt_valid[None, :], dist, jnp.inf)
    _, topk_idxs = jax.lax.top_k(-dist.T, topk)                # (M, K)

    cand_ious = jnp.take_along_axis(ious.T, topk_idxs, axis=1)  # (M, K)
    iou_mean = jnp.mean(cand_ious, axis=1)
    iou_std = jnp.std(cand_ious, axis=1, ddof=1)
    is_pos = cand_ious >= (iou_mean + iou_std + 1e-6)[:, None]

    # candidate center inside gt BEV box (reference :104-112)
    cand = anchors_flat[topk_idxs.reshape(-1)]                  # (M*K, 7)
    gt_rep = jnp.repeat(gt_boxes, topk, axis=0)                 # (M*K, 7)
    local = common_utils.rotate_points_along_z(
        (cand[:, 0:3] - gt_rep[:, 0:3])[:, None, :], -gt_rep[:, 6])[:, 0, :2]
    half = gt_rep[:, 3:5] / 2
    in_gt = jnp.all((local <= half) & (local >= -half),
                    axis=-1).reshape(m, topk)
    is_pos = is_pos & in_gt & gt_valid[:, None]

    # eligibility (Na, M): scatter the positive candidates (unique flat ids)
    flat = topk_idxs * m + jnp.arange(m, dtype=topk_idxs.dtype)[:, None]
    flat = jnp.where(is_pos, flat, na * m)
    elig = jnp.zeros((na * m + 1,), bool).at[flat.reshape(-1)].set(
        True, mode='drop', unique_indices=True)[:-1].reshape(na, m)

    neg_inf = jnp.float32(-1e9)
    ious_elig = jnp.where(elig, ious, neg_inf)
    a2g_val = jnp.max(ious_elig, axis=1)
    a2g_idx = jnp.argmax(ious_elig, axis=1)

    # force-match each valid gt to its best-IoU anchor (reference :128-131)
    best_anchor = jnp.argmax(ious, axis=0)                      # (M,)
    rows = jnp.where(gt_valid, best_anchor, na)
    a2g_idx = a2g_idx.at[rows].set(jnp.arange(m), mode='drop')
    a2g_val = a2g_val.at[rows].set(
        jnp.max(ious, axis=0), mode='drop')

    labels = jnp.where(a2g_val > neg_inf / 2,
                       gt_classes[a2g_idx], 0).astype(jnp.int32)
    fg = labels > 0
    targets = box_coder.encode(gt_boxes[a2g_idx], anchors_flat)
    reg_targets = jnp.where(fg[:, None], targets, 0.0)
    return labels, reg_targets, fg.astype(jnp.float32)


class AnchorHeadSingle(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: Sequence[str]
    grid_size: Tuple[int, int, int]
    point_cloud_range: Tuple[float, ...]
    predict_boxes_when_training: bool = True
    compute_dtype: Any = None

    def _anchors(self):
        return generate_anchors(self.model_cfg.ANCHOR_GENERATOR_CONFIG,
                                self.grid_size, self.point_cloud_range)

    def _box_coder(self):
        return getattr(box_coder_utils,
                       self.model_cfg.TARGET_ASSIGNER_CONFIG.BOX_CODER)()

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        cfg = self.model_cfg
        x = batch_dict['spatial_features_2d']
        batch_dict['spatial_features_before_head'] = x  # for BEVGridPooling
        b = x.shape[0]
        anchors = self._anchors()
        ny, nx, a, _ = anchors.shape
        num_dir_bins = int(cfg.NUM_DIR_BINS)

        cls_preds = nn.Conv(a * self.num_class, (1, 1), name='conv_cls',
                            bias_init=nn.initializers.constant(-np.log(99.0)))(x)
        box_preds = nn.Conv(a * 7, (1, 1), name='conv_box',
                            kernel_init=nn.initializers.normal(0.001))(x)
        dir_preds = nn.Conv(a * num_dir_bins, (1, 1), name='conv_dir_cls')(x)

        cls_preds = cls_preds.reshape(b, ny * nx * a, self.num_class).astype(jnp.float32)
        box_preds = box_preds.reshape(b, ny * nx * a, 7).astype(jnp.float32)
        dir_preds = dir_preds.reshape(b, ny * nx * a, num_dir_bins).astype(jnp.float32)

        ret = {'cls_preds': cls_preds, 'box_preds': box_preds,
               'dir_cls_preds': dir_preds}

        anchors_flat = jnp.asarray(anchors.reshape(-1, 7))
        if train:
            ret.update(self._assign_targets(batch_dict['gt_boxes'], anchors_flat))

        # decode proposals (always needed: RoI head consumes them)
        batch_box_preds = self._decode_preds(box_preds, dir_preds, anchors_flat)
        # fusion boundary (utils/compile_tame.py)
        from ...utils.compile_tame import stage_barrier
        batch_dict['batch_cls_preds'] = stage_barrier(cls_preds)
        batch_dict['batch_box_preds'] = stage_barrier(batch_box_preds)
        batch_dict['cls_preds_normalized'] = False
        batch_dict['anchor_head_ret'] = ret
        return batch_dict

    def _assign_targets(self, gt_boxes_with_cls, anchors_flat):
        cfg = self.model_cfg
        anchors_np = self._anchors()
        ny, nx, a, _ = anchors_np.shape
        # per-anchor class id + thresholds (static)
        per_cls_counts = []
        matched, unmatched, cls_ids = [], [], []
        for ci, acfg in enumerate(cfg.ANCHOR_GENERATOR_CONFIG):
            n_anchor = len(acfg['anchor_sizes']) * len(acfg['anchor_rotations']) \
                * len(acfg['anchor_bottom_heights'])
            per_cls_counts.append(n_anchor)
            matched += [acfg['matched_threshold']] * n_anchor
            unmatched += [acfg['unmatched_threshold']] * n_anchor
            cls_ids += [ci + 1] * n_anchor
        matched_t = jnp.tile(jnp.asarray(matched, jnp.float32), ny * nx)
        unmatched_t = jnp.tile(jnp.asarray(unmatched, jnp.float32), ny * nx)
        anchor_cls = jnp.tile(jnp.asarray(cls_ids, jnp.int32), ny * nx)

        coder = self._box_coder()
        ta_cfg = cfg.TARGET_ASSIGNER_CONFIG
        if ta_cfg.get('NAME', 'AxisAlignedTargetAssigner') \
                == 'ATSSTargetAssigner':
            topk = int(ta_cfg.get('TOPK', 9))
            mh = bool(ta_cfg.get('MATCH_HEIGHT', False))

            def single(gt):
                return atss_assign_targets_single(
                    anchors_flat, gt[..., :7], gt[..., 7].astype(jnp.int32),
                    topk, coder, match_height=mh)
        else:
            def single(gt):
                return assign_targets_single(
                    anchors_flat, anchor_cls, gt[..., :7],
                    gt[..., 7].astype(jnp.int32), matched_t, unmatched_t,
                    coder)

        labels, reg_targets, reg_weights = jax.vmap(single)(gt_boxes_with_cls)
        return {'box_cls_labels': labels, 'box_reg_targets': reg_targets,
                'reg_weights': reg_weights}

    def _decode_preds(self, box_preds, dir_preds, anchors_flat):
        cfg = self.model_cfg
        coder = self._box_coder()
        decoded = coder.decode(box_preds, anchors_flat[None])
        if cfg.get('USE_DIRECTION_CLASSIFIER', False):
            dir_offset = float(cfg.DIR_OFFSET)
            dir_limit_offset = float(cfg.DIR_LIMIT_OFFSET)
            num_dir_bins = int(cfg.NUM_DIR_BINS)
            dir_labels = jnp.argmax(dir_preds, axis=-1)
            period = 2 * np.pi / num_dir_bins
            val = common_utils.limit_period(
                decoded[..., 6] - dir_offset, dir_limit_offset, period)
            rot = val + dir_offset + period * dir_labels.astype(decoded.dtype)
            decoded = decoded.at[..., 6].set(rot)
        return decoded


def add_sin_difference(boxes1, boxes2, dim=6):
    """sin(a - b) trick (reference anchor_head_template.py:126-137)."""
    rad_pred = jnp.sin(boxes1[..., dim:dim + 1]) * jnp.cos(boxes2[..., dim:dim + 1])
    rad_tg = jnp.cos(boxes1[..., dim:dim + 1]) * jnp.sin(boxes2[..., dim:dim + 1])
    boxes1 = jnp.concatenate(
        [boxes1[..., :dim], rad_pred, boxes1[..., dim + 1:]], axis=-1)
    boxes2 = jnp.concatenate(
        [boxes2[..., :dim], rad_tg, boxes2[..., dim + 1:]], axis=-1)
    return boxes1, boxes2


def anchor_head_loss(model_cfg, ret, anchors_flat, num_class):
    """RPN loss (reference anchor_head_template.py:95-227): focal cls +
    sin-diff smooth-l1 reg + direction CE."""
    lw = model_cfg.LOSS_CONFIG.LOSS_WEIGHTS
    tb = {}
    labels = ret['box_cls_labels']            # (B, Na)
    cls_preds = ret['cls_preds']              # (B, Na, C)
    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0

    cls_weights = (negatives * 1.0 + positives * 1.0).astype(jnp.float32)
    reg_weights = positives.astype(jnp.float32)
    pos_normalizer = jnp.clip(jnp.sum(positives, axis=1, keepdims=True), min=1.0)
    cls_weights = cls_weights / pos_normalizer
    reg_weights = reg_weights / pos_normalizer

    cls_targets = jnp.where(cared, labels, 0)
    one_hot = jax.nn.one_hot(cls_targets, num_class + 1)[..., 1:]
    cls_loss = loss_utils.sigmoid_focal_loss(cls_preds, one_hot, cls_weights)
    cls_loss = jnp.sum(cls_loss) / labels.shape[0] * lw['cls_weight']
    tb['rpn_loss_cls'] = cls_loss

    box_preds = ret['box_preds']
    reg_targets = ret['box_reg_targets']
    pred_sin, tg_sin = add_sin_difference(box_preds, reg_targets)
    code_w = jnp.asarray(lw['code_weights'], jnp.float32)
    l1 = loss_utils.smooth_l1(pred_sin - tg_sin, beta=1.0 / 9.0) * code_w
    loc_loss = jnp.sum(l1 * reg_weights[..., None]) / labels.shape[0] * lw['loc_weight']
    tb['rpn_loss_loc'] = loc_loss

    rpn_loss = cls_loss + loc_loss

    if 'dir_cls_preds' in ret and model_cfg.get('USE_DIRECTION_CLASSIFIER', False):
        dir_offset = float(model_cfg.DIR_OFFSET)
        num_bins = int(model_cfg.NUM_DIR_BINS)
        # dir targets from the *decoded* gt angle at each fg anchor:
        # anchors + reg_target angle = gt angle (rt = rg - ra)
        gt_rot = reg_targets[..., 6] + anchors_flat[None, :, 6]
        offset_rot = common_utils.limit_period(gt_rot - dir_offset, 0, 2 * np.pi)
        dir_targets = jnp.clip(
            jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32),
            0, num_bins - 1)
        logp = jax.nn.log_softmax(ret['dir_cls_preds'], axis=-1)
        ce = -jnp.take_along_axis(logp, dir_targets[..., None], axis=-1)[..., 0]
        weights = positives.astype(jnp.float32)
        weights = weights / jnp.clip(jnp.sum(weights, axis=1, keepdims=True), min=1.0)
        dir_loss = jnp.sum(ce * weights) / labels.shape[0] * lw['dir_weight']
        rpn_loss = rpn_loss + dir_loss
        tb['rpn_loss_dir'] = dir_loss

    tb['rpn_loss'] = rpn_loss
    return rpn_loss, tb
