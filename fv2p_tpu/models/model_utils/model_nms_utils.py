"""Standalone NMS dispatch utilities (reference
``pcdet/models/model_utils/model_nms_utils.py``).

The detectors' ``post_processing*`` methods inline equivalent logic over
batched inputs; these functions expose the reference's per-sample API surface
for library users. All are jit-able with fixed shapes: they return a
(post_max,) index array plus a validity mask instead of ragged results.
"""
import jax
import jax.numpy as jnp

from ...utils import iou3d


def _nms(box_preds, nms_scores, nms_config):
    pre = int(min(nms_config.NMS_PRE_MAXSIZE, box_preds.shape[0]))
    post = int(nms_config.NMS_POST_MAXSIZE)
    thresh = float(nms_config.NMS_THRESH)
    return iou3d.nms_rotated(box_preds[:, :7], nms_scores, thresh,
                             pre_max=pre, post_max=post)


def class_agnostic_nms(box_scores, box_preds, nms_config, score_thresh=None):
    """Reference model_nms_utils.py:6-25.

    Args:
        box_scores: (N,). box_preds: (N, 7+).
    Returns: (selected (post_max,) int32, selected_scores (post_max,),
        valid (post_max,) bool).
    """
    scores = box_scores
    if score_thresh is not None:
        scores = jnp.where(box_scores >= score_thresh, box_scores, -jnp.inf)
    keep_idx, keep_valid = _nms(box_preds, scores, nms_config)
    sel_scores = jnp.where(keep_valid, box_scores[keep_idx], 0.0)
    return keep_idx, sel_scores, keep_valid


def class_agnostic_nms_withfgscore(box_fgscores, box_locscores, box_preds,
                                   nms_config, fgscore_thresh=None):
    """Filter by foreground (cls) score, rank by localization/IoU score
    (reference model_nms_utils.py:27-50 — the FV2P/MGAF eval path).

    Args:
        box_fgscores: (N,) cls confidence. box_locscores: (N,) IoU/loc score.
    Returns: (selected idx, selected locscores, valid).
    """
    scores = box_locscores
    if fgscore_thresh is not None:
        scores = jnp.where(box_fgscores >= fgscore_thresh, box_locscores,
                           -jnp.inf)
    keep_idx, keep_valid = _nms(box_preds, scores, nms_config)
    sel_scores = jnp.where(keep_valid, box_locscores[keep_idx], 0.0)
    return keep_idx, sel_scores, keep_valid


def multi_classes_nms(cls_scores, box_preds, nms_config, score_thresh=None):
    """Per-class NMS (reference model_nms_utils.py:53-90).

    Args:
        cls_scores: (N, C). box_preds: (N, 7+) shared across classes (the
            reference also supports per-class boxes (N, C, 7+)).
    Returns:
        boxes (C*post, 7+), scores (C*post,), labels (C*post,) 1-based,
        valid (C*post,).
    """
    n, c = cls_scores.shape
    post = int(nms_config.NMS_POST_MAXSIZE)
    scores = cls_scores
    if score_thresh is not None:
        scores = jnp.where(cls_scores >= score_thresh, cls_scores, -jnp.inf)
    per_class = scores.T                                       # (C, N)
    if box_preds.ndim == 3:
        boxes_c = box_preds.transpose(1, 0, 2)                 # (C, N, 7+)
    else:
        boxes_c = jnp.broadcast_to(box_preds[None],
                                   (c,) + box_preds.shape)
    keep_idx, keep_valid = jax.vmap(
        lambda bx, sc: _nms(bx, sc, nms_config))(boxes_c, per_class)
    sel_boxes = jnp.take_along_axis(boxes_c, keep_idx[..., None], axis=1)
    sel_scores = jnp.take_along_axis(cls_scores.T, keep_idx, axis=1)
    sel_scores = jnp.where(keep_valid, sel_scores, 0.0)
    labels = jnp.broadcast_to(
        (jnp.arange(c, dtype=jnp.int32) + 1)[:, None], (c, post))
    return (sel_boxes.reshape(c * post, -1), sel_scores.reshape(-1),
            labels.reshape(-1), keep_valid.reshape(-1))
