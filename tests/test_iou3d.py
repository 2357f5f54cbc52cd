import jax.numpy as jnp
import numpy as np
import pytest

from fv2p_tpu.utils import box_utils, iou3d


def _mc_iou_bev(box_a, box_b, n=400_000, seed=0):
    """Monte-Carlo oracle for rotated BEV IoU."""
    rng = np.random.RandomState(seed)
    ca = np.asarray(box_utils.boxes_to_corners_bev(jnp.asarray(box_a[None])))[0]
    cb = np.asarray(box_utils.boxes_to_corners_bev(jnp.asarray(box_b[None])))[0]
    lo = np.minimum(ca.min(0), cb.min(0))
    hi = np.maximum(ca.max(0), cb.max(0))
    pts = rng.uniform(lo, hi, size=(n, 2))

    def inside(box, pts):
        d = pts - box[:2]
        c, s = np.cos(-box[6]), np.sin(-box[6])
        lx = d[:, 0] * c - d[:, 1] * s
        ly = d[:, 0] * s + d[:, 1] * c
        return (np.abs(lx) <= box[3] / 2) & (np.abs(ly) <= box[4] / 2)

    in_a = inside(box_a, pts)
    in_b = inside(box_b, pts)
    box_area = np.prod(hi - lo)
    inter = in_a.mean() * box_area
    union = box_a[3] * box_a[4] + box_b[3] * box_b[4] - (in_a & in_b).mean() * box_area
    return (in_a & in_b).mean() * box_area / union


def _box(x, y, dx, dy, ry, z=0.0, dz=1.0):
    return np.array([x, y, z, dx, dy, dz, ry], dtype=np.float32)


class TestBevIoU:
    def test_identical_boxes(self):
        b = jnp.asarray(_box(1.0, 2.0, 4.0, 2.0, 0.3)[None])
        iou = iou3d.boxes_iou_bev(b, b)
        assert np.allclose(np.asarray(iou), 1.0, atol=1e-4)

    def test_disjoint(self):
        a = jnp.asarray(_box(0, 0, 2, 2, 0.0)[None])
        b = jnp.asarray(_box(10, 10, 2, 2, 0.7)[None])
        assert np.asarray(iou3d.boxes_iou_bev(a, b))[0, 0] == 0.0

    def test_axis_aligned_half_overlap(self):
        a = jnp.asarray(_box(0, 0, 2, 2, 0.0)[None])
        b = jnp.asarray(_box(1, 0, 2, 2, 0.0)[None])
        # intersection 1x2=2, union 4+4-2=6
        assert np.allclose(np.asarray(iou3d.boxes_iou_bev(a, b))[0, 0], 2 / 6, atol=1e-5)

    def test_rotated_45deg_cross(self):
        a = _box(0, 0, 2, 2, 0.0)
        b = _box(0, 0, 2, 2, np.pi / 4)
        got = np.asarray(iou3d.boxes_iou_bev(jnp.asarray(a[None]), jnp.asarray(b[None])))[0, 0]
        # octagon intersection: area = 8*(sqrt(2)-1); union = 8 - area
        inter = 8 * (np.sqrt(2) - 1)
        expect = inter / (8 - inter)
        assert np.allclose(got, expect, atol=1e-4)

    @pytest.mark.parametrize('seed', [0, 1, 2])
    def test_random_vs_montecarlo(self, seed):
        rng = np.random.RandomState(seed + 100)
        boxes_a = np.stack([
            _box(rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(1, 5),
                 rng.uniform(1, 5), rng.uniform(-np.pi, np.pi)) for _ in range(6)
        ])
        boxes_b = np.stack([
            _box(rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(1, 5),
                 rng.uniform(1, 5), rng.uniform(-np.pi, np.pi)) for _ in range(6)
        ])
        got = np.asarray(iou3d.boxes_iou_bev(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
        for i in range(6):
            for j in range(6):
                ref = _mc_iou_bev(boxes_a[i], boxes_b[j], seed=seed)
                assert abs(got[i, j] - ref) < 0.02, (i, j, got[i, j], ref)


class TestIoU3d:
    def test_z_overlap(self):
        a = jnp.asarray(_box(0, 0, 2, 2, 0.0, z=0.0, dz=2.0)[None])
        b = jnp.asarray(_box(0, 0, 2, 2, 0.0, z=1.0, dz=2.0)[None])
        # bev inter 4, h overlap 1 -> inter 4; union 8+8-4=12
        assert np.allclose(np.asarray(iou3d.boxes_iou3d(a, b))[0, 0], 4 / 12, atol=1e-5)

    def test_no_z_overlap(self):
        a = jnp.asarray(_box(0, 0, 2, 2, 0.0, z=0.0, dz=1.0)[None])
        b = jnp.asarray(_box(0, 0, 2, 2, 0.0, z=5.0, dz=1.0)[None])
        assert np.asarray(iou3d.boxes_iou3d(a, b))[0, 0] == 0.0


class TestNMS:
    def test_greedy_suppression(self):
        boxes = np.stack([
            _box(0, 0, 4, 2, 0.0),
            _box(0.2, 0, 4, 2, 0.05),   # overlaps box 0 heavily
            _box(10, 10, 4, 2, 1.0),
            _box(10.1, 10, 4, 2, 1.0),  # overlaps box 2
            _box(-10, 5, 4, 2, 0.5),
        ])
        scores = np.array([0.9, 0.8, 0.95, 0.3, 0.5], np.float32)
        keep_idx, keep_valid = iou3d.nms_rotated(
            jnp.asarray(boxes), jnp.asarray(scores), 0.1, pre_max=5, post_max=5)
        kept = set(np.asarray(keep_idx)[np.asarray(keep_valid)].tolist())
        assert kept == {2, 0, 4}
        # score ordering preserved
        kept_list = np.asarray(keep_idx)[np.asarray(keep_valid)].tolist()
        assert kept_list == [2, 0, 4]

    def test_padding_ignored(self):
        boxes = np.zeros((8, 7), np.float32)
        boxes[0] = _box(0, 0, 4, 2, 0.0)
        scores = np.full(8, -np.inf, np.float32)
        scores[0] = 1.0
        keep_idx, keep_valid = iou3d.nms_rotated(
            jnp.asarray(boxes), jnp.asarray(scores), 0.1, pre_max=8, post_max=4)
        assert np.asarray(keep_valid).sum() == 1
        assert np.asarray(keep_idx)[0] == 0


class TestPointsInBoxes:
    def test_rotated_containment(self):
        box = jnp.asarray(_box(0, 0, 4, 2, np.pi / 2, z=0, dz=2)[None])
        pts = jnp.asarray(np.array([
            [0, 0, 0],      # center: in
            [0.9, 0, 0],    # after rot, dx=4 along y; x extent is +-1: in
            [1.5, 0, 0],    # out (x beyond rotated half-width 1)
            [0, 1.9, 0],    # in (y extent +-2)
            [0, 0, 1.5],    # out in z
        ], np.float32))
        mask = np.asarray(iou3d.points_in_rotated_boxes(pts, box))[0]
        assert mask.tolist() == [True, True, False, True, False]


class TestFixedPointEquivalence:
    def test_matches_sequential_greedy(self):
        """Fixed-point suppression must equal the naive sequential greedy."""
        rng = np.random.RandomState(42)
        for trial in range(5):
            n = 64
            boxes = np.zeros((n, 7), np.float32)
            boxes[:, :2] = rng.uniform(0, 20, (n, 2))
            boxes[:, 2] = rng.uniform(-1, 1, n)
            boxes[:, 3:6] = rng.uniform(1.5, 5, (n, 3))
            boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
            scores = rng.rand(n).astype(np.float32)
            thresh = 0.2

            keep_idx, keep_valid = iou3d.nms_rotated(
                jnp.asarray(boxes), jnp.asarray(scores), thresh,
                pre_max=n, post_max=n)
            got = np.asarray(keep_idx)[np.asarray(keep_valid)].tolist()

            # naive reference: sort by score, sequential greedy
            order = np.argsort(-scores, kind='stable')
            ious = np.asarray(iou3d.boxes_iou_bev(
                jnp.asarray(boxes[order]), jnp.asarray(boxes[order])))
            alive = np.ones(n, bool)
            expect = []
            for i in range(n):
                if not alive[i]:
                    continue
                expect.append(int(order[i]))
                for j in range(i + 1, n):
                    if alive[j] and ious[i, j] > thresh:
                        alive[j] = False
            assert got == expect, (trial, got, expect)


def test_blocked_nms_matches_dense_first_post():
    """The blocked greedy path (pre > 2048) must return exactly the same
    first-post_max kept set as the dense fixed-point path."""
    rng = np.random.RandomState(7)
    n = 2600
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = rng.uniform(0, 70, n)
    boxes[:, 1] = rng.uniform(-35, 35, n)
    boxes[:, 2] = -1.0
    boxes[:, 3:6] = [3.9, 1.6, 1.5]
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.rand(n).astype(np.float32)
    order = np.argsort(-scores)
    boxes_s = jnp.asarray(boxes[order])
    valid = jnp.ones(n, bool)

    for thresh, post in ((0.85, 100), (0.1, 64)):
        dense = np.asarray(iou3d._nms_keep_flags(boxes_s, valid, thresh, 256))
        blocked = np.asarray(iou3d._nms_keep_flags_blocked(
            boxes_s, valid, thresh, post, 256, block=512))
        kd = np.nonzero(dense)[0][:post]
        kb = np.nonzero(blocked)[0][:post]
        np.testing.assert_array_equal(kd, kb)
