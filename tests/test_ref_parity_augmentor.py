"""Golden parity: augmentation plumbing vs the reference, same RNG draws.

The host-side augmentor files were ported near-verbatim from the reference
(``pcdet/datasets/augmentor/``), and the one divergence introduced during
porting — dropped velocity-channel branches on 9-dim (nuScenes) boxes —
silently corrupted velocity regression targets under flip/rotation (r3
verdict, Missing #1). These tests pin every augmentor function to the
reference bit-for-bit (same numpy RNG sequence on both sides) so a future
transcription drift fails loudly:

  * random_flip_along_x / _y — incl. the vy / vx sign flips
    (reference ``augmentor_utils.py:18-21,34-38``)
  * global_rotation — incl. the velocity-vector rotation (``:55-59``)
  * global_scaling
  * DataBaseSampler.__call__ — epoch-shuffled sampling, rotated-BEV-IoU
    collision rejection, point carving + pasting
    (reference ``database_sampler.py:79-237``)
"""
import pickle
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402

from fv2p_tpu.config import EasyDict  # noqa: E402
from fv2p_tpu.datasets.augmentor import augmentor_utils  # noqa: E402
from fv2p_tpu.datasets.augmentor.database_sampler import DataBaseSampler  # noqa: E402
from fv2p_tpu.utils import box_utils  # noqa: E402

ref_aug = ref_loader.load('pcdet.datasets.augmentor.augmentor_utils')
ref_sampler_mod = ref_loader.load('pcdet.datasets.augmentor.database_sampler')


def _boxes9(rng, n=12):
    """Random 9-dim boxes [x y z dx dy dz ry vx vy] (nuScenes layout)."""
    b = np.zeros((n, 9), np.float32)
    b[:, 0:2] = rng.uniform(-40, 40, (n, 2))
    b[:, 2] = rng.uniform(-2, 0.5, n)
    b[:, 3:6] = rng.uniform(1.0, 5.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    b[:, 7:9] = rng.uniform(-8, 8, (n, 2))
    return b


def _points(rng, m=500):
    p = rng.uniform(-40, 40, (m, 5)).astype(np.float32)
    p[:, 2] = rng.uniform(-3, 1, m)
    return p


@pytest.mark.parametrize('fn_name,seed', [
    ('random_flip_along_x', 0), ('random_flip_along_x', 1),
    ('random_flip_along_y', 0), ('random_flip_along_y', 1),
    ('global_scaling', 7),
])
def test_flip_scale_parity_9dim(fn_name, seed):
    rng = np.random.RandomState(42)
    boxes, points = _boxes9(rng), _points(rng)
    args = {'global_scaling': ([0.9, 1.1],)}.get(fn_name, ())

    np.random.seed(seed)
    ref_b, ref_p = getattr(ref_aug, fn_name)(
        boxes.copy(), points.copy(), *args)
    np.random.seed(seed)
    got_b, got_p = getattr(augmentor_utils, fn_name)(
        boxes.copy(), points.copy(), *args)

    np.testing.assert_array_equal(got_b, ref_b)
    np.testing.assert_array_equal(got_p, ref_p)


def test_global_rotation_parity_9dim():
    """Rotation parity incl. the velocity-vector branch. The reference
    computes the rotation matrix in torch float32 (after rounding the
    float64 angle), ours in numpy float64 rounded at matmul; identical to
    within one float32 ulp."""
    rng = np.random.RandomState(43)
    boxes, points = _boxes9(rng), _points(rng)
    np.random.seed(3)
    ref_b, ref_p = ref_aug.global_rotation(
        boxes.copy(), points.copy(), rot_range=[-0.8, 0.8])
    np.random.seed(3)
    got_b, got_p = augmentor_utils.global_rotation(
        boxes.copy(), points.copy(), rot_range=[-0.8, 0.8])
    np.testing.assert_allclose(got_b, ref_b, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(got_p, ref_p, rtol=1e-6, atol=1e-5)
    # the velocity columns must actually have rotated (regression guard for
    # the dropped-branch bug: identity here means the branch is missing)
    assert not np.allclose(got_b[:, 7:9], boxes[:, 7:9])


def test_flip_actually_flips_velocity():
    """Direct regression check, independent of the A/B: a forced flip must
    negate the matching velocity component and nothing else."""
    rng = np.random.RandomState(44)
    boxes, points = _boxes9(rng), _points(rng)
    for seed in range(8):  # find seeds where the coin comes up enabled
        np.random.seed(seed)
        out_b, _ = augmentor_utils.random_flip_along_x(
            boxes.copy(), points.copy())
        if not np.array_equal(out_b, boxes):
            np.testing.assert_array_equal(out_b[:, 8], -boxes[:, 8])
            np.testing.assert_array_equal(out_b[:, 7], boxes[:, 7])
            break
    else:
        pytest.fail('flip never enabled across 8 seeds')


# ---------------------------------------------------------------------------
# DataBaseSampler A/B
# ---------------------------------------------------------------------------

def _points_in_boxes_cpu_torch(points, boxes):
    """Exact rotated-box containment standing in for the reference's
    compiled ``roiaware_pool3d_cuda.points_in_boxes_cpu`` (semantics of
    ``roiaware_pool3d_kernel.cu:313``); torch in / torch out."""
    pts = points.numpy() if isinstance(points, torch.Tensor) else points
    bxs = boxes.numpy() if isinstance(boxes, torch.Tensor) else boxes
    in_bev = box_utils.in_box_bev_np(pts[:, :2], bxs)            # (N, M)
    dz = np.abs(pts[None, :, 2] - bxs[:, None, 2]) <= bxs[:, None, 5] / 2
    return torch.from_numpy((in_bev & dz).astype(np.int32))


def _make_db(tmp_path, rng, class_names=('car', 'pedestrian'), per_class=30):
    """Tiny on-disk gt database shared by both samplers."""
    db_infos = {}
    (tmp_path / 'gt_database').mkdir(exist_ok=True)
    for ci, name in enumerate(class_names):
        infos = []
        for k in range(per_class):
            box = np.zeros(9, np.float32)
            box[0:2] = rng.uniform(-35, 35, 2)
            box[2] = rng.uniform(-1.5, 0.0)
            box[3:6] = [4.0, 1.8, 1.6] if name == 'car' else [0.8, 0.7, 1.7]
            box[6] = rng.uniform(-np.pi, np.pi)
            box[7:9] = rng.uniform(-5, 5, 2)
            npts = int(rng.randint(8, 40))
            pts = rng.uniform(-1, 1, (npts, 4)).astype(np.float32)
            rel = f'gt_database/{name}_{k}.bin'
            pts.tofile(str(tmp_path / rel))
            infos.append({'name': name, 'path': rel, 'box3d_lidar': box,
                          'difficulty': int(rng.randint(0, 2)),
                          'num_points_in_gt': npts})
        db_infos[name] = infos
    pkl = tmp_path / 'db_infos.pkl'
    with open(pkl, 'wb') as f:
        pickle.dump(db_infos, f)
    return pkl


def _sampler_cfg():
    return EasyDict({
        'NAME': 'gt_sampling',
        'DB_INFO_PATH': ['db_infos.pkl'],
        'PREPARE': {'filter_by_difficulty': [-1],
                    'filter_by_min_points': ['car:5', 'pedestrian:5']},
        'SAMPLE_GROUPS': ['car:6', 'pedestrian:4'],
        'NUM_POINT_FEATURES': 4,
        'REMOVE_EXTRA_WIDTH': [0.0, 0.0, 0.0],
        'DATABASE_WITH_FAKELIDAR': False,
        'USE_ROAD_PLANE': False,
        'LIMIT_WHOLE_SCENE': True,
    })


def _scene(rng):
    gt = _boxes9(rng, n=5)
    names = np.array(['car', 'car', 'pedestrian', 'truck', 'car'])
    return {
        'gt_boxes': gt,
        'gt_names': names,
        'gt_boxes_mask': np.array([True, True, True, False, True]),
        'points': _points(rng, 800)[:, :4],
    }


def test_database_sampler_parity(tmp_path, monkeypatch):
    """Seeded A/B of the full gt-sampling pass vs the reference sampler.

    The reference's compiled leaves are replaced by exact stand-ins on the
    REFERENCE side only (its ``boxes_bev_iou_cpu`` by our
    ``boxes_bev_iou_cpu_np`` — itself parity-tested against the reference
    rotated-IoU geometry in test_ref_parity_utils — and
    ``points_in_boxes_cpu`` by an exact rotated-containment torch fn), so
    the reference's own Python logic (epoch shuffling, collision masking,
    carve + paste ordering) runs unmodified and ours must reproduce it on
    identical RNG draws."""
    rng = np.random.RandomState(7)
    _make_db(tmp_path, rng)
    cfg = _sampler_cfg()

    ref_iou_utils = ref_loader.load('pcdet.ops.iou3d_nms.iou3d_nms_utils')
    monkeypatch.setattr(ref_iou_utils, 'boxes_bev_iou_cpu',
                        lambda a, b: box_utils.boxes_bev_iou_cpu_np(a, b))
    ref_roiaware = ref_loader.load(
        'pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils')
    monkeypatch.setattr(ref_roiaware, 'points_in_boxes_cpu',
                        _points_in_boxes_cpu_torch)

    scene_rng = np.random.RandomState(11)
    scene = _scene(scene_rng)

    np.random.seed(123)
    ref_sampler = ref_sampler_mod.DataBaseSampler(
        root_path=tmp_path, sampler_cfg=cfg, class_names=['car', 'pedestrian'])
    ref_out = ref_sampler({k: (v.copy() if hasattr(v, 'copy') else v)
                           for k, v in scene.items()})

    np.random.seed(123)
    got_sampler = DataBaseSampler(
        root_path=tmp_path, sampler_cfg=cfg, class_names=['car', 'pedestrian'])
    got_out = got_sampler({k: (v.copy() if hasattr(v, 'copy') else v)
                           for k, v in scene.items()})

    np.testing.assert_array_equal(got_out['gt_names'], ref_out['gt_names'])
    np.testing.assert_array_equal(got_out['gt_boxes'], ref_out['gt_boxes'])
    np.testing.assert_array_equal(got_out['points'], ref_out['points'])
    # the pass must actually have pasted something for this to mean anything
    assert got_out['gt_boxes'].shape[0] > 4
    # and the epoch-shuffle pointer state advanced identically
    for cls in ('car', 'pedestrian'):
        assert (got_sampler.sample_groups[cls]['pointer']
                == ref_sampler.sample_groups[cls]['pointer'])


def test_bev_iou_np_matches_reference_geometry():
    """boxes_bev_iou_cpu_np vs the reference's rotate_iou polygon geometry
    (numba-stubbed to plain python), random rotated pairs incl. touching
    and disjoint cases."""
    ref_rotate = ref_loader.load(
        'pcdet.datasets.kitti.kitti_object_eval_python.rotate_iou')
    rng = np.random.RandomState(5)
    n, m = 12, 10
    boxes_a = _boxes9(rng, n)[:, :7]
    boxes_b = _boxes9(rng, m)[:, :7]
    # cluster them so intersections actually occur
    boxes_b[:, 0:2] = boxes_a[:m, 0:2] + rng.uniform(-2, 2, (m, 2))

    got = box_utils.boxes_bev_iou_cpu_np(boxes_a, boxes_b)

    # rotate_iou's rbbox format: (cx, cy, w, h, angle), rotation CLOCKWISE
    # (camera ry convention, rbbox_to_corners rotate_iou.py:205-226);
    # lidar headings are CCW, so pass -heading.
    def to5(b):
        out = b[:, [0, 1, 3, 4, 6]].astype(np.float32).copy()
        out[:, 4] = -out[:, 4]
        return out

    ra, rb = to5(boxes_a), to5(boxes_b)
    ref = np.zeros((n, m), np.float32)
    for i in range(n):
        for j in range(m):
            ref[i, j] = ref_rotate.devRotateIoUEval(ra[i], rb[j], -1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
