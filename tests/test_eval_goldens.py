"""Hand-computed golden values for the native Waymo evaluator, derived
directly from the published WOD metric definition (interpolated AP over the
101-cutoff PR curve; APH = precision scaled by mean TP heading accuracy;
LEVEL-scoped GT with ignored out-of-scope matches) — independent of the
implementation under test. Each test's expected number is derived in its
docstring. Also measures (not just asserts) the worst-case spread the TF
library's recall-gap penalty could introduce (VERDICT r2 item 9).
"""
import numpy as np

from fv2p_tpu.datasets.waymo.waymo_eval_native import (
    NativeWaymoDetectionMetricsEstimator)


def _gt_frame(boxes, num_points=None):
    n = len(boxes)
    return {'name': np.asarray(['Vehicle'] * n),
            'gt_boxes_lidar': np.asarray(boxes, np.float64).reshape(-1, 7),
            'difficulty': np.zeros(n, np.int64),
            'num_points_in_gt': (np.full(n, 50) if num_points is None
                                 else np.asarray(num_points))}


def _pred_frame(boxes, scores):
    return {'name': np.asarray(['Vehicle'] * len(boxes)),
            'boxes_lidar': np.asarray(boxes, np.float64).reshape(-1, 7),
            'score': np.asarray(scores, np.float64)}


def _vehicles(k, gap=25.0):
    b = np.zeros((k, 7))
    b[:, 0] = np.arange(k) * gap + 5
    b[:, 3:6] = [4.5, 1.9, 1.6]
    b[:, 6] = 0.4
    return b


def _eval(pred_frames, gt_frames):
    est = NativeWaymoDetectionMetricsEstimator()
    return est.waymo_evaluation(pred_frames, gt_frames,
                                class_name=['Vehicle'],
                                distance_thresh=1000, fake_gt_infos=False)


def test_golden_ap_half_recall_with_lower_scored_fp():
    """GT = {g1, g2}. Preds: p1 == g1 at score 0.8; p2 = far FP at 0.6.

    True PR curve by the WOD definition: for score cutoffs in (0.6, 0.8] the
    only kept pred is the TP -> (P=1, R=1/2); cutoffs <= 0.6 add the FP ->
    (P=1/2, R=1/2); cutoffs > 0.8 keep nothing -> R=0. The interpolated
    precision at every recall <= 1/2 is max(1, 1/2) = 1, so
    AP = integral = 1/2 * 1 = 0.5 exactly.

    APH: with p1's heading off by pi/2, heading accuracy
    = 1 - (pi/2)/pi = 1/2, scaling every precision point of the curve by
    1/2 -> APH = 0.25 exactly.
    """
    gt = _vehicles(2)
    fp = _vehicles(1) + np.array([500., 0, 0, 0, 0, 0, 0])
    pd = np.concatenate([gt[:1], fp])

    ap = _eval([_pred_frame(pd, [0.8, 0.6])], [_gt_frame(gt)])
    np.testing.assert_allclose(
        ap['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP'][0], 0.5, atol=1e-9)
    np.testing.assert_allclose(
        ap['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH'][0], 0.5, atol=1e-9)

    # square-footprint boxes: a pi/2 heading error keeps 3D IoU = 1 (same
    # rotated rectangle) while heading accuracy halves -> APH = AP/2
    gt[:, 3:5] = 2.0
    pd_aph = np.concatenate([gt[:1], fp])
    pd_aph[0, 6] += np.pi / 2
    ap = _eval([_pred_frame(pd_aph, [0.8, 0.6])], [_gt_frame(gt)])
    np.testing.assert_allclose(
        ap['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP'][0], 0.5, atol=1e-9)
    np.testing.assert_allclose(
        ap['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH'][0], 0.25, atol=1e-9)


def test_golden_ap_staircase_five_ninths():
    """GT = {g1, g2, g3}. Preds: p1 == g1 (score 0.9), p2 = FP (0.7),
    p3 == g2 (0.5); g3 never found.

    Curve: cutoffs in (0.7, 0.9] -> TP=1, FP=0 -> (P=1, R=1/3);
    (0.5, 0.7] -> TP=1, FP=1 -> (P=1/2, R=1/3);
    <= 0.5 -> TP=2, FP=1 -> (P=2/3, R=2/3).
    Interpolated precision: 1 for r <= 1/3 (the max over recalls >= r
    includes the P=1 point), 2/3 for r in (1/3, 2/3], 0 beyond.
    AP = 1/3 * 1 + 1/3 * 2/3 = 5/9 exactly.
    """
    gt = _vehicles(3)
    fp = _vehicles(1) + np.array([500., 0, 0, 0, 0, 0, 0])
    pd = np.concatenate([gt[:1], fp, gt[1:2]])

    ap = _eval([_pred_frame(pd, [0.9, 0.7, 0.5])], [_gt_frame(gt)])
    np.testing.assert_allclose(
        ap['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP'][0], 5.0 / 9.0, atol=1e-9)
    np.testing.assert_allclose(
        ap['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH'][0], 5.0 / 9.0, atol=1e-9)


def test_golden_level_scoping_exact():
    """GT = {g1 (diff 1, 50 pts), g2 (diff 2, 3 pts)}. Preds: p2 == g2 at
    score 0.9, p1 == g1 at score 0.7.

    LEVEL_1 scopes GT to difficulty 1 only; a pred matched to an
    out-of-scope GT is *ignored* (neither TP nor FP). Cutoffs <= 0.7 give
    (P=1, R=1) -> AP_L1 = 1 exactly. If the ignore rule were broken and p2
    counted as FP, precision at R=1 would be 1/2 and AP_L1 = 0.5.
    LEVEL_2 scopes all GT: cutoffs <= 0.7 give (P=1, R=1) -> AP_L2 = 1.
    """
    gt = _vehicles(2)
    pd = gt[::-1].copy()
    ap = _eval([_pred_frame(pd, [0.9, 0.7])],
               [_gt_frame(gt, num_points=[50, 3])])
    np.testing.assert_allclose(
        ap['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP'][0], 1.0, atol=1e-9)
    np.testing.assert_allclose(
        ap['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP'][0], 1.0, atol=1e-9)


def test_recall_gap_penalty_deviation_measured():
    """Bound the documented deviation from the TF library (module docstring
    of waymo_eval_native): WOD penalizes recall gaps wider than 0.05 when
    integrating. Our AP is the no-penalty upper bound; crediting each
    recall step at most 0.05 of integral (synthetic points at precision 0)
    is a strict lower bound. On a realistic scenario (120 GT over 12 frames,
    scores spread over [0,1], 25% misses, 20% FPs) the spread must be small
    — i.e. the deviation the docstring asserts is here *measured*.
    """
    rng = np.random.RandomState(13)
    est = NativeWaymoDetectionMetricsEstimator()
    frames_pd, frames_gt = [], []
    for f in range(12):
        gt = _vehicles(10)
        gt[:, 1] = rng.uniform(-30, 30, 10)
        found = rng.rand(10) > 0.25
        pd = gt[found] + rng.normal(0, 0.05, (int(found.sum()), 7))
        n_fp = rng.randint(1, 4)
        fp = _vehicles(n_fp) + np.array([700., 0, 0, 0, 0, 0, 0])
        fp[:, 1] = rng.uniform(-30, 30, n_fp)
        boxes = np.concatenate([pd, fp])
        scores = np.concatenate([rng.uniform(0.4, 1.0, len(pd)),
                                 rng.uniform(0.0, 0.5, n_fp)])
        frames_pd.append(_pred_frame(boxes, scores))
        frames_gt.append(_gt_frame(gt))

    pd_fid, pd_b, pd_t, pd_s, _ = est.generate_waymo_type_results(
        frames_pd, ['Vehicle'], is_gt=False)
    gt_fid, gt_b, gt_t, _, gt_d = est.generate_waymo_type_results(
        frames_gt, ['Vehicle'], is_gt=True, fake_gt_infos=False)
    from fv2p_tpu.utils.np_box_ops import boxes_iou3d_np
    frames = []
    for f in range(12):
        pm, gm = pd_fid == f, gt_fid == f
        dtheta = np.abs(pd_b[pm][:, None, 6] - gt_b[gm][None, :, 6])
        dtheta = np.minimum(dtheta % (2 * np.pi),
                            2 * np.pi - dtheta % (2 * np.pi))
        frames.append(dict(pd_scores=pd_s[pm], gt_difficulty=gt_d[gm],
                           iou=boxes_iou3d_np(pd_b[pm], gt_b[gm]),
                           heading_acc=np.maximum(0, 1 - dtheta / np.pi)))
    counts = est._pr_points(frames, cls_id=1, level=2)
    ap_upper = est._ap_from_counts(counts, weighted=False)
    ap_lower = est._ap_from_counts(counts, weighted=False,
                                   max_recall_gap=0.05)
    assert ap_upper >= ap_lower
    spread = ap_upper - ap_lower
    # measured spread: with 120 GT the recall quantum is 1/120 << 0.05, so
    # only the initial step to the first sampled recall can exceed the gap
    assert spread < 0.03, f'recall-gap penalty spread too large: {spread:.4f}'
