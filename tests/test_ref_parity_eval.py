"""Golden-parity A/B of the full official KITTI AP evaluator: our
numpy + C++ evaluator vs the reference numba evaluator
(kitti_object_eval_python/eval.py) running as plain Python on identical
randomized annotations.

The reference's only CUDA dependency (rotate_iou_gpu_eval) is replaced by a
loop over the reference's *own* devRotateIoUEval geometry, so the oracle is
100% reference code.
"""
import numpy as np

from tests import ref_loader

from fv2p_tpu.datasets.kitti.kitti_object_eval import eval as our_eval

ref_eval = ref_loader.load(
    'pcdet.datasets.kitti.kitti_object_eval_python.eval')
ref_riou = ref_loader.load(
    'pcdet.datasets.kitti.kitti_object_eval_python.rotate_iou')


def _pure_python_rotate_iou(boxes, query_boxes, criterion=-1, device_id=0):
    """Drop-in for rotate_iou_gpu_eval: same geometry, CPU loop.
    iou[n, k] = devRotateIoUEval(query_boxes[k], boxes[n], criterion)
    (kernel layout, rotate_iou.py:334-336)."""
    boxes = boxes.astype(np.float32)
    query_boxes = query_boxes.astype(np.float32)
    n, k = boxes.shape[0], query_boxes.shape[0]
    iou = np.zeros((n, k), dtype=np.float32)
    for i in range(n):
        for j in range(k):
            iou[i, j] = ref_riou.devRotateIoUEval(
                query_boxes[j], boxes[i], criterion)
    return iou


ref_eval.rotate_iou_gpu_eval = _pure_python_rotate_iou


def _random_annos(rng, n_frames, max_obj=8, with_scores=False,
                  perturb=None):
    """Random camera-frame annotations in the official format."""
    names_pool = ['Car', 'Car', 'Car', 'Pedestrian', 'Van', 'Cyclist',
                  'DontCare']
    annos = []
    for _ in range(n_frames):
        n = rng.randint(1, max_obj + 1)
        names = [names_pool[rng.randint(len(names_pool))] for _ in range(n)]
        loc = np.stack([rng.uniform(-30, 30, n), rng.uniform(1.0, 2.0, n),
                        rng.uniform(5, 60, n)], axis=1)
        dims = np.stack([rng.uniform(3.0, 4.5, n), rng.uniform(1.3, 1.8, n),
                         rng.uniform(1.4, 1.8, n)], axis=1)   # l, h, w
        rot = rng.uniform(-np.pi, np.pi, n)
        if perturb is not None:
            loc = loc + rng.normal(0, perturb, loc.shape)
            rot = rot + rng.normal(0, perturb, rot.shape)
        y0 = rng.uniform(100, 300, n)
        h_img = rng.uniform(20, 80, n)
        x0 = rng.uniform(0, 1000, n)
        bbox = np.stack([x0, y0, x0 + rng.uniform(30, 120, n), y0 + h_img],
                        axis=1)
        anno = {
            'name': np.array(names),
            'truncated': rng.choice([0.0, 0.1, 0.4], n),
            'occluded': rng.choice([0, 0, 1, 2], n),
            'alpha': rng.uniform(-np.pi, np.pi, n),
            'bbox': bbox,
            'dimensions': dims,
            'location': loc,
            'rotation_y': rot,
            'difficulty': np.zeros(n, np.int32),
            'score': (rng.uniform(0.1, 1.0, n) if with_scores
                      else np.zeros(n)),
        }
        annos.append(anno)
    return annos


def _paired_annos(rng, n_frames):
    """gt + detections = noisy copies of gt with extra FPs and dropped boxes,
    so the PR curve has real structure."""
    gt = _random_annos(rng, n_frames)
    dt = []
    for g in gt:
        n = len(g['name'])
        keep = rng.rand(n) > 0.2
        idx = np.where(keep)[0]
        d = {k: (v[idx] if isinstance(v, np.ndarray) else
                 np.array(v)[idx]) for k, v in g.items()}
        d['location'] = d['location'] + rng.normal(0, 0.15,
                                                   d['location'].shape)
        d['rotation_y'] = d['rotation_y'] + rng.normal(0, 0.05,
                                                       len(d['rotation_y']))
        d['bbox'] = d['bbox'] + rng.normal(0, 2.0, d['bbox'].shape)
        d['alpha'] = d['alpha'] + rng.normal(0, 0.1, len(d['alpha']))
        d['score'] = rng.uniform(0.3, 1.0, len(idx))
        # false positives
        fp = _random_annos(rng, 1, max_obj=3, with_scores=True)[0]
        for k in d:
            d[k] = np.concatenate([d[k], fp[k][:len(fp['name'])]], axis=0)
        dt.append(d)
    return gt, dt


def test_official_eval_matches_reference_end_to_end():
    rng = np.random.RandomState(0)
    gt, dt = _paired_annos(rng, 12)

    classes = ['Car', 'Pedestrian', 'Cyclist']
    res_ref, ret_ref = _ref_official(gt, dt, classes)
    res_got, ret_got = our_eval.get_official_eval_result(gt, dt, classes)

    shared = sorted(set(ret_ref) & set(ret_got))
    assert len(shared) >= 18, (sorted(ret_ref), sorted(ret_got))
    for k in shared:
        np.testing.assert_allclose(ret_got[k], ret_ref[k], rtol=1e-6,
                                   atol=1e-8, err_msg=k)


def _ref_official(gt, dt, classes):
    res, ret = ref_eval.get_official_eval_result(gt, dt, classes)
    return res, ret


def test_do_eval_all_map_arrays_match_reference():
    """Compare every mAP array (11pt + R40, bbox/bev/3d/aos) bitwise-close."""
    rng = np.random.RandomState(1)
    gt, dt = _paired_annos(rng, 10)

    overlap_0_7 = np.array(
        [[0.7, 0.5, 0.5, 0.7, 0.5, 0.7], [0.7, 0.5, 0.5, 0.7, 0.5, 0.7],
         [0.7, 0.5, 0.5, 0.7, 0.5, 0.7]])
    overlap_0_5 = np.array(
        [[0.7, 0.5, 0.5, 0.7, 0.5, 0.5], [0.5, 0.25, 0.25, 0.5, 0.25, 0.5],
         [0.5, 0.25, 0.25, 0.5, 0.25, 0.5]])
    min_overlaps = np.stack([overlap_0_7, overlap_0_5], axis=0)[:, :, [0, 1]]

    ref = ref_eval.do_eval(gt, dt, [0, 1], min_overlaps, compute_aos=True)
    got = our_eval.do_eval(gt, dt, [0, 1], min_overlaps, compute_aos=True)
    names = ['bbox', 'bev', '3d', 'aos', 'bbox_R40', 'bev_R40', '3d_R40',
             'aos_R40']
    for name, r, g in zip(names, ref, got):
        assert (r is None) == (g is None), name
        if r is not None:
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-6, atol=1e-8, err_msg=name)
