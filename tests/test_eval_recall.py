"""Unit test for the jitted recall counter (tools/eval_utils)."""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tools'))

from eval_utils.eval_utils import make_recall_fn


def _box(x, y, yaw=0.0):
    return [x, y, -1.0, 4.0, 1.6, 1.5, yaw]


def test_recall_counts_basic():
    recall_fn = make_recall_fn((0.3, 0.5, 0.7))
    # 2 GT boxes; preds: one exact match for gt0, one slightly-shifted match
    # for gt1 (IoU ~ between 0.5 and 0.7), plus an invalid padded pred
    gt = np.zeros((1, 4, 8), np.float32)
    gt[0, 0, :7] = _box(10.0, 0.0)
    gt[0, 1, :7] = _box(30.0, 5.0)
    pred = np.zeros((1, 3, 7), np.float32)
    pred[0, 0] = _box(10.0, 0.0)          # IoU 1.0 with gt0
    pred[0, 1] = _box(30.5, 5.0)          # shifted 0.5m along length
    pred[0, 2] = _box(90.0, 0.0)          # padded slot, masked invalid
    valid = np.array([[True, True, False]])

    counts, counts_roi, num_gt = recall_fn(
        jnp.asarray(pred), jnp.asarray(valid), jnp.asarray(gt))
    counts = np.asarray(counts)
    assert int(num_gt) == 2
    # shifted box: IoU = 3.5/4.5 in BEV ~ 0.78 -> recalled at all thresholds
    assert counts.tolist() == [2, 2, 2]
    assert np.asarray(counts_roi).tolist() == [0, 0, 0]


def test_recall_invalid_pred_not_counted():
    recall_fn = make_recall_fn((0.5,))
    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0, :7] = _box(10.0, 0.0)
    pred = np.zeros((1, 1, 7), np.float32)
    pred[0, 0] = _box(10.0, 0.0)
    # the only matching pred is masked out -> zero recall
    counts, _, num_gt = recall_fn(
        jnp.asarray(pred), jnp.asarray(np.array([[False]])), jnp.asarray(gt))
    assert int(num_gt) == 1
    assert np.asarray(counts).tolist() == [0]


def test_recall_with_rois():
    recall_fn = make_recall_fn((0.5,))
    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0, :7] = _box(10.0, 0.0)
    pred = np.zeros((1, 1, 7), np.float32)
    pred[0, 0] = _box(50.0, 0.0)          # miss
    rois = np.zeros((1, 2, 7), np.float32)
    rois[0, 0] = _box(10.0, 0.1)          # near-exact roi hit
    counts, counts_roi, num_gt = recall_fn(
        jnp.asarray(pred), jnp.asarray(np.array([[True]])), jnp.asarray(gt),
        jnp.asarray(rois))
    assert np.asarray(counts).tolist() == [0]
    assert np.asarray(counts_roi).tolist() == [1]
