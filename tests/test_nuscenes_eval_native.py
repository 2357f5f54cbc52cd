"""Native nuScenes detection metrics (devkit-free detection_cvpr_2019):
matching, AP normalization, TP error metrics, and NDS composition on
constructed scenarios (the devkit itself cannot run here — no DB, no
package — so these scenario oracles are the correctness story)."""
import numpy as np
import pytest

from fv2p_tpu.datasets.nuscenes.nuscenes_eval_native import (
    DIST_THRESHS, nuscenes_detection_eval)

CLASSES = ['car', 'pedestrian']


def _boxes(k, gap=15.0, vel=0.0):
    b = np.zeros((k, 9))
    b[:, 0] = np.arange(k) * gap + 5
    b[:, 3:6] = [4.5, 1.9, 1.6]
    b[:, 6] = 0.3
    b[:, 7] = vel
    return b


def _gt(boxes, names):
    return {'gt_boxes': np.asarray(boxes, np.float64),
            'gt_names': np.asarray(names)}


def _det(boxes, names, scores):
    return {'name': np.asarray(names), 'score': np.asarray(scores, np.float64),
            'boxes_lidar': np.asarray(boxes, np.float64)}


def test_perfect_detection_is_1():
    gt = _boxes(4, vel=2.0)
    txt, d = nuscenes_detection_eval(
        [_det(gt, ['car'] * 4, [0.9] * 4)], [_gt(gt, ['car'] * 4)], ['car'])
    assert d['mAP'] == pytest.approx(1.0, abs=1e-6)
    assert d['NDS'] == pytest.approx(1.0, abs=1e-6)
    assert d['car_trans_err'] == pytest.approx(0.0, abs=1e-9)
    assert d['car_vel_err'] == pytest.approx(0.0, abs=1e-9)
    assert 'mAP' in txt and 'NDS' in txt


def test_translation_within_thresholds():
    """A 0.7 m offset fails the 0.5 m threshold but passes 1/2/4 m, and the
    ATE equals the offset."""
    gt = _boxes(4, gap=10.0)  # keep offset preds inside the 50 m car range
    pred = gt.copy()
    pred[:, 1] += 0.7
    _, d = nuscenes_detection_eval(
        [_det(pred, ['car'] * 4, [0.9] * 4)], [_gt(gt, ['car'] * 4)], ['car'])
    assert d['car_AP_dist_0.5'] == pytest.approx(0.0, abs=1e-6)
    for th in (1.0, 2.0, 4.0):
        assert d['car_AP_dist_%s' % th] == pytest.approx(1.0, abs=1e-6)
    assert d['mAP'] == pytest.approx(0.75, abs=1e-6)
    assert d['car_trans_err'] == pytest.approx(0.7, abs=1e-6)


def test_scale_and_orientation_errors():
    gt = _boxes(3)
    pred = gt.copy()
    pred[:, 3:6] *= 2 ** (1 / 3)  # volume x2 -> aligned IoU 0.5 -> ASE 0.5
    pred[:, 6] += 0.5
    _, d = nuscenes_detection_eval(
        [_det(pred, ['car'] * 3, [0.9] * 3)], [_gt(gt, ['car'] * 3)], ['car'])
    assert d['car_scale_err'] == pytest.approx(0.5, abs=1e-6)
    assert d['car_orient_err'] == pytest.approx(0.5, abs=1e-6)
    assert d['mAP'] == pytest.approx(1.0, abs=1e-6)  # IoU not used in matching


def test_barrier_yaw_period_is_pi():
    gt = _boxes(2)
    pred = gt.copy()
    pred[:, 6] += np.pi  # barriers are symmetric: zero orientation error
    _, d = nuscenes_detection_eval(
        [_det(pred, ['barrier'] * 2, [0.9] * 2)],
        [_gt(gt, ['barrier'] * 2)], ['barrier'])
    assert d['barrier_orient_err'] == pytest.approx(0.0, abs=1e-6)
    _, d2 = nuscenes_detection_eval(
        [_det(pred, ['car'] * 2, [0.9] * 2)], [_gt(gt, ['car'] * 2)], ['car'])
    assert d2['car_orient_err'] == pytest.approx(np.pi, abs=1e-6)


def test_half_detected_ap_devkit_normalization():
    """2 of 4 GT found at perfect precision: interpolated precision is 1 up
    to recall 0.5 and 0 above -> AP = (40 * 0.9) / (90 * 0.9)."""
    gt = _boxes(4)
    _, d = nuscenes_detection_eval(
        [_det(gt[:2], ['car'] * 2, [0.9] * 2)], [_gt(gt, ['car'] * 4)], ['car'])
    assert d['car_AP_dist_2.0'] == pytest.approx(40 / 90, abs=1e-6)


def test_false_positive_ranking():
    gt = _boxes(2)
    fp = _boxes(2)
    fp[:, 1] += 30
    pred = np.concatenate([gt, fp])
    _, d_good = nuscenes_detection_eval(
        [_det(pred, ['car'] * 4, [0.9, 0.9, 0.4, 0.4])],
        [_gt(gt, ['car'] * 2)], ['car'])
    _, d_bad = nuscenes_detection_eval(
        [_det(pred, ['car'] * 4, [0.4, 0.4, 0.9, 0.9])],
        [_gt(gt, ['car'] * 2)], ['car'])
    assert d_good['mAP'] > d_bad['mAP']


def test_greedy_takes_closest_gt():
    """One prediction between two GT must match the closer one (0.4 m) and
    leave the other unmatched."""
    gt = np.zeros((2, 9))
    gt[0, 0], gt[1, 0] = 10.0, 11.0
    gt[:, 3:6] = [4.5, 1.9, 1.6]
    pred = gt[:1].copy()
    pred[0, 0] = 10.4
    _, d = nuscenes_detection_eval(
        [_det(pred, ['car'], [0.9])], [_gt(gt, ['car'] * 2)], ['car'])
    assert d['car_trans_err'] == pytest.approx(0.4, abs=1e-6)


def test_class_range_filter():
    """GT beyond the class eval range (50 m for cars) is excluded: a detector
    that only covers in-range boxes still scores mAP 1."""
    gt = _boxes(2)
    far = _boxes(1)
    far[:, 0] = 60.0
    _, d = nuscenes_detection_eval(
        [_det(gt, ['car'] * 2, [0.9] * 2)],
        [_gt(np.concatenate([gt, far]), ['car'] * 3)], ['car'])
    assert d['mAP'] == pytest.approx(1.0, abs=1e-6)


def test_multiclass_multiframe_nds():
    cars = _boxes(2, vel=1.0)
    peds = _boxes(2, vel=0.5)
    peds[:, 1] += 8
    peds[:, 3:6] = [0.7, 0.7, 1.8]
    gts = [_gt(np.concatenate([cars, peds]), ['car'] * 2 + ['pedestrian'] * 2),
           _gt(cars, ['car'] * 2)]
    dets = [_det(np.concatenate([cars, peds[:1]]),
                 ['car', 'car', 'pedestrian'], [0.9] * 3),
            _det(cars, ['car'] * 2, [0.9] * 2)]
    _, d = nuscenes_detection_eval(dets, gts, CLASSES)
    assert d['car_AP_dist_2.0'] == pytest.approx(1.0, abs=1e-6)
    # pedestrian: 1 of 2 found -> devkit-normalized 40/90
    assert d['pedestrian_AP_dist_2.0'] == pytest.approx(40 / 90, abs=1e-6)
    assert 0.0 < d['NDS'] < 1.0
    assert len(DIST_THRESHS) == 4


def test_no_predictions_scores_zero():
    gt = _boxes(3)
    _, d = nuscenes_detection_eval(
        [_det(np.zeros((0, 9)), [], [])], [_gt(gt, ['car'] * 3)], ['car'])
    assert d['mAP'] == 0.0
    assert d['NDS'] < 0.5
