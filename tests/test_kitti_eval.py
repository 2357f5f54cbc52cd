"""Tests for the official KITTI AP evaluator (numpy + C++ matching core)."""
import numpy as np
import pytest

from fv2p_tpu.datasets.kitti.kitti_object_eval import eval as kitti_eval


def _make_anno(boxes_cam, names, scores=None, bbox_h=50.0):
    """boxes_cam: (N, 7) [x, y, z, l, h, w, ry] camera frame."""
    n = len(names)
    boxes_cam = np.asarray(boxes_cam, np.float64).reshape(n, 7)
    anno = {
        'name': np.array(names),
        'truncated': np.zeros(n),
        'occluded': np.zeros(n),
        'alpha': np.full(n, -10.0) if scores is None else np.zeros(n),
        'bbox': np.tile(np.array([100.0, 100.0, 200.0, 100.0 + bbox_h]), (n, 1)),
        'dimensions': boxes_cam[:, 3:6],
        'location': boxes_cam[:, 0:3],
        'rotation_y': boxes_cam[:, 6],
        'difficulty': np.zeros(n, np.int32),
    }
    if scores is not None:
        anno['score'] = np.asarray(scores, np.float64)
    else:
        anno['score'] = np.zeros(n)
    return anno


CAR = [5.0, 1.6, 20.0, 3.9, 1.5, 1.6, 0.3]
CAR2 = [-5.0, 1.6, 30.0, 4.2, 1.5, 1.7, -0.5]


def _grid_cars(n):
    """n well-separated car boxes (camera frame)."""
    boxes = []
    for i in range(n):
        x = (i % 10) * 12.0 - 60.0
        z = (i // 10) * 15.0 + 10.0
        boxes.append([x, 1.6, z, 3.9, 1.5, 1.6, 0.1 * (i % 7)])
    return boxes


def test_perfect_detections_score_100():
    """With >= 41 TPs the 41 recall samples all fill -> AP == 100."""
    boxes = _grid_cars(50)
    names = ['Car'] * 50
    scores = np.linspace(0.99, 0.5, 50)
    gt = [_make_anno(boxes, names)]
    dt = [_make_anno(boxes, names, scores=scores)]
    result, ret = kitti_eval.get_official_eval_result(gt, dt, ['Car'])
    for diff in ['easy', 'moderate', 'hard']:
        assert ret[f'Car_3d/{diff}_R40'] == pytest.approx(100.0, abs=1e-6), ret
        assert ret[f'Car_bev/{diff}_R40'] == pytest.approx(100.0, abs=1e-6)
        assert ret[f'Car_image/{diff}_R40'] == pytest.approx(100.0, abs=1e-6)


def test_half_recall_r40_about_50():
    boxes = _grid_cars(100)
    gt = [_make_anno(boxes, ['Car'] * 100)]
    dt = [_make_anno(boxes[:50], ['Car'] * 50,
                     scores=np.linspace(0.99, 0.5, 50))]
    result, ret = kitti_eval.get_official_eval_result(gt, dt, ['Car'])
    assert 45.0 < ret['Car_3d/easy_R40'] <= 52.5, ret['Car_3d/easy_R40']


def test_no_detections_score_0():
    gt = [_make_anno([CAR], ['Car'])]
    dt = [_make_anno(np.zeros((0, 7)), [], scores=[])]
    result, ret = kitti_eval.get_official_eval_result(gt, dt, ['Car'])
    assert ret['Car_3d/easy_R40'] == 0.0


def test_tiny_gt_ap11_sparse_sampling():
    """2 gts, 1 perfect det: only recall sample 0 fills -> AP11 = 100/11
    (a quirk of the official 41-point sampling, preserved)."""
    gt = [_make_anno([CAR, CAR2], ['Car', 'Car'])]
    dt = [_make_anno([CAR], ['Car'], scores=[0.9])]
    result, ret = kitti_eval.get_official_eval_result(gt, dt, ['Car'])
    assert ret['Car_3d/easy'] == pytest.approx(100.0 / 11, abs=1e-6)


def test_false_positive_lowers_precision():
    far_box = [50.0, 1.6, 60.0, 3.9, 1.5, 1.6, 0.0]
    gt = [_make_anno([CAR], ['Car'])]
    dt = [_make_anno([CAR, far_box], ['Car', 'Car'], scores=[0.9, 0.95])]
    result, ret = kitti_eval.get_official_eval_result(gt, dt, ['Car'])
    # the FP has the higher score: at the TP threshold precision = 1/2
    assert ret['Car_3d/easy_R40'] < 100.0


def test_van_gt_ignored_for_car():
    """Detections matching Van gts are absorbed (not FPs) for Car eval."""
    boxes = _grid_cars(50)
    names = ['Car'] * 49 + ['Van']
    gt = [_make_anno(boxes, names)]
    dt = [_make_anno(boxes, ['Car'] * 50, scores=np.linspace(0.99, 0.5, 50))]
    result, ret = kitti_eval.get_official_eval_result(gt, dt, ['Car'])
    assert ret['Car_3d/easy_R40'] == pytest.approx(100.0, abs=1e-4)


def test_rotated_partial_overlap_below_07():
    """Shifted det: IoU < 0.7 -> miss at strict threshold, hit at 0.5."""
    shifted = list(CAR)
    shifted[0] += 1.2  # ~1.2m lateral shift on a 1.6m-wide car
    gt = [_make_anno([CAR], ['Car'])]
    dt = [_make_anno([shifted], ['Car'], scores=[0.9])]
    result, ret = kitti_eval.get_official_eval_result(gt, dt, ['Car'])
    assert ret['Car_3d/easy_R40'] == 0.0  # strict 0.7 in ret_dict (i == 0)
    assert 'AP@0.70' in result and 'AP_R40' in result
