"""Tests for the standalone NMS dispatch surface (model_nms_utils)."""
import jax.numpy as jnp
import numpy as np

from fv2p_tpu.config import EasyDict
from fv2p_tpu.models.model_utils import model_nms_utils

NMS_CFG = EasyDict({'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 8,
                    'NMS_THRESH': 0.1})


def _boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = rng.uniform(0, 60, n)
    boxes[:, 1] = rng.uniform(-20, 20, n)
    boxes[:, 2] = -1.0
    boxes[:, 3:6] = [3.9, 1.6, 1.5]
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


def test_class_agnostic_nms_threshold_and_order():
    boxes = _boxes(32)
    scores = np.linspace(0.9, 0.1, 32).astype(np.float32)
    idx, sel_scores, valid = model_nms_utils.class_agnostic_nms(
        jnp.asarray(scores), jnp.asarray(boxes), NMS_CFG, score_thresh=0.5)
    idx, sel_scores, valid = map(np.asarray, (idx, sel_scores, valid))
    # no kept box below the threshold
    assert (sel_scores[valid] >= 0.5).all()
    # kept scores are descending
    kept = sel_scores[valid]
    assert (np.diff(kept) <= 1e-6).all()


def test_withfgscore_ranks_by_locscore():
    boxes = _boxes(16, seed=1)
    fg = np.full(16, 0.9, np.float32)
    fg[::2] = 0.01                       # filtered out by fg threshold
    loc = np.linspace(0.1, 0.8, 16).astype(np.float32)
    idx, sel, valid = model_nms_utils.class_agnostic_nms_withfgscore(
        jnp.asarray(fg), jnp.asarray(loc), jnp.asarray(boxes), NMS_CFG,
        fgscore_thresh=0.5)
    idx, sel, valid = map(np.asarray, (idx, sel, valid))
    assert valid.any()
    assert (idx[valid] % 2 == 1).all()   # only fg-passing (odd) survive
    assert (np.diff(sel[valid]) <= 1e-6).all()  # ranked by loc score


def test_multi_classes_nms_labels():
    boxes = _boxes(24, seed=2)
    cls = np.random.RandomState(3).rand(24, 3).astype(np.float32)
    out_boxes, out_scores, out_labels, valid = model_nms_utils.multi_classes_nms(
        jnp.asarray(cls), jnp.asarray(boxes), NMS_CFG, score_thresh=0.3)
    out_scores, out_labels, valid = map(np.asarray,
                                        (out_scores, out_labels, valid))
    assert out_boxes.shape == (3 * 8, 7)
    assert set(np.unique(out_labels)) <= {1, 2, 3}
    assert (out_scores[valid] >= 0.3).all()
