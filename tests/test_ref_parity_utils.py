"""Golden-parity A/B tests: our jnp utilities vs the PyTorch reference
actually executing on CPU (loaded via ref_loader, sources unmodified).

Covers box coders, loss terms, box/center/common utilities, and rotated
IoU / NMS against the reference's own polygon-clipping geometry
(kitti_object_eval_python/rotate_iou.py device functions run as plain
Python under the numba stub).
"""
import numpy as np
import pytest
import torch

from tests import ref_loader

import jax
import jax.numpy as jnp

from fv2p_tpu.utils import (box_coder_utils, box_utils, center_utils,
                            common_utils, iou3d, loss_utils)

# reference modules run .cuda() on constants / allocate cuda tensors even on
# the CPU-only paths we exercise; route those to CPU without touching sources
torch.Tensor.cuda = lambda self, *a, **k: self
torch.cuda.FloatTensor = torch.FloatTensor

ref_coders = ref_loader.load('pcdet.utils.box_coder_utils')
ref_loss = ref_loader.load('pcdet.utils.loss_utils')
ref_boxu = ref_loader.load('pcdet.utils.box_utils')
ref_center = ref_loader.load('pcdet.utils.center_utils')
ref_common = ref_loader.load('pcdet.utils.common_utils')
ref_riou = ref_loader.load(
    'pcdet.datasets.kitti.kitti_object_eval_python.rotate_iou')


def _rand_boxes(rng, n, z_range=(-2.0, 1.0)):
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = rng.uniform(-40, 40, n)
    boxes[:, 1] = rng.uniform(-40, 40, n)
    boxes[:, 2] = rng.uniform(*z_range, n)
    boxes[:, 3] = rng.uniform(1.5, 5.0, n)    # dx
    boxes[:, 4] = rng.uniform(1.2, 2.5, n)    # dy
    boxes[:, 5] = rng.uniform(1.0, 2.0, n)    # dz
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


# ---------------------------------------------------------------- box coders

def test_residual_coder_encode_decode_matches_reference():
    rng = np.random.RandomState(0)
    n = 64
    boxes = _rand_boxes(rng, n)
    anchors = _rand_boxes(rng, n)

    ref = ref_coders.ResidualCoder()
    # encode_torch mutates its inputs (clamp_min in place) — pass copies
    enc_ref = ref.encode_torch(torch.from_numpy(boxes.copy()),
                               torch.from_numpy(anchors.copy())).numpy()
    ours = box_coder_utils.ResidualCoder()
    enc_got = np.asarray(ours.encode(jnp.asarray(boxes), jnp.asarray(anchors)))
    np.testing.assert_allclose(enc_got, enc_ref, rtol=1e-5, atol=1e-5)

    dec_ref = ref.decode_torch(torch.from_numpy(enc_ref),
                               torch.from_numpy(anchors.copy())).numpy()
    dec_got = np.asarray(ours.decode(jnp.asarray(enc_ref), jnp.asarray(anchors)))
    np.testing.assert_allclose(dec_got, dec_ref, rtol=1e-5, atol=1e-5)


def test_residual_coder_sincos_matches_reference():
    rng = np.random.RandomState(1)
    n = 32
    boxes = _rand_boxes(rng, n)
    anchors = _rand_boxes(rng, n)

    ref = ref_coders.ResidualCoder(encode_angle_by_sincos=True)
    enc_ref = ref.encode_torch(torch.from_numpy(boxes.copy()),
                               torch.from_numpy(anchors.copy())).numpy()
    ours = box_coder_utils.ResidualCoder(encode_angle_by_sincos=True)
    enc_got = np.asarray(ours.encode(jnp.asarray(boxes), jnp.asarray(anchors)))
    np.testing.assert_allclose(enc_got, enc_ref, rtol=1e-5, atol=1e-5)

    dec_ref = ref.decode_torch(torch.from_numpy(enc_ref),
                               torch.from_numpy(anchors.copy())).numpy()
    dec_got = np.asarray(ours.decode(jnp.asarray(enc_ref), jnp.asarray(anchors)))
    np.testing.assert_allclose(dec_got, dec_ref, rtol=1e-5, atol=1e-5)


def test_point_residual_coder_matches_reference():
    rng = np.random.RandomState(2)
    n = 48
    boxes = _rand_boxes(rng, n)
    points = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    classes = rng.randint(1, 4, n)
    mean_size = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]

    ref = ref_coders.PointResidualCoder(mean_size=mean_size)
    enc_ref = ref.encode_torch(torch.from_numpy(boxes.copy()),
                               torch.from_numpy(points.copy()),
                               torch.from_numpy(classes)).numpy()
    ours = box_coder_utils.PointResidualCoder(mean_size=mean_size)
    enc_got = np.asarray(ours.encode(jnp.asarray(boxes), jnp.asarray(points),
                                     jnp.asarray(classes)))
    np.testing.assert_allclose(enc_got, enc_ref, rtol=1e-5, atol=1e-5)

    dec_ref = ref.decode_torch(torch.from_numpy(enc_ref),
                               torch.from_numpy(points.copy()),
                               torch.from_numpy(classes)).numpy()
    dec_got = np.asarray(ours.decode(jnp.asarray(enc_ref), jnp.asarray(points),
                                     jnp.asarray(classes)))
    np.testing.assert_allclose(dec_got, dec_ref, rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------- losses

def test_sigmoid_focal_loss_matches_reference():
    rng = np.random.RandomState(3)
    logits = rng.randn(2, 100, 3).astype(np.float32) * 3
    targets = (rng.rand(2, 100, 3) > 0.7).astype(np.float32)
    weights = rng.rand(2, 100).astype(np.float32)

    ref = ref_loss.SigmoidFocalClassificationLoss(gamma=2.0, alpha=0.25)
    out_ref = ref(torch.from_numpy(logits), torch.from_numpy(targets),
                  torch.from_numpy(weights)).numpy()
    out_got = np.asarray(loss_utils.sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights)))
    np.testing.assert_allclose(out_got, out_ref, rtol=1e-5, atol=1e-6)


def test_smooth_l1_matches_reference_weighted_loss():
    rng = np.random.RandomState(4)
    pred = rng.randn(2, 50, 7).astype(np.float32)
    target = rng.randn(2, 50, 7).astype(np.float32)
    weights = rng.rand(2, 50).astype(np.float32)

    code_w = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0]
    ref = ref_loss.WeightedSmoothL1Loss(beta=1.0 / 9.0, code_weights=code_w)
    out_ref = ref(torch.from_numpy(pred), torch.from_numpy(target),
                  torch.from_numpy(weights)).numpy()
    diff = (jnp.asarray(pred) - jnp.asarray(target)) * jnp.asarray(code_w)
    out_got = np.asarray(
        loss_utils.smooth_l1(diff, beta=1.0 / 9.0) * weights[..., None])
    np.testing.assert_allclose(out_got, out_ref, rtol=1e-5, atol=1e-6)


def test_corner_loss_mse_matches_reference():
    rng = np.random.RandomState(5)
    n = 40
    pred = _rand_boxes(rng, n)
    gt = pred + rng.randn(n, 7).astype(np.float32) * 0.1

    out_ref = ref_loss.get_corner_loss_mse(
        torch.from_numpy(pred), torch.from_numpy(gt)).item()
    out_got = float(loss_utils.corner_loss_mse(
        jnp.asarray(pred), jnp.asarray(gt), jnp.ones(n, bool)))
    np.testing.assert_allclose(out_got, out_ref, rtol=1e-4)


def test_iouscore_loss_bce_matches_reference():
    rng = np.random.RandomState(6)
    n = 200
    iou_preds = rng.randn(n).astype(np.float32)
    iou_gts = rng.rand(n).astype(np.float32)

    out_ref = ref_loss.get_iouscore_loss_bce(
        torch.from_numpy(iou_preds), torch.from_numpy(iou_gts)).item()
    out_got = float(loss_utils.iouscore_loss_bce(
        jnp.asarray(iou_preds), jnp.asarray(iou_gts), jnp.ones(n, bool)))
    np.testing.assert_allclose(out_got, out_ref, rtol=1e-5)


def test_rot_binres_loss_matches_reference():
    rng = np.random.RandomState(7)
    n, bins = 60, 12
    pred = rng.randn(n, 2 * bins).astype(np.float32)
    ry = rng.uniform(-2 * np.pi, 2 * np.pi, (n, 1)).astype(np.float32)

    out_ref, _ = ref_loss.get_rot_binres_loss(
        torch.from_numpy(pred), torch.from_numpy(ry), num_head_bin=bins)
    out_got = float(loss_utils.rot_binres_loss(
        jnp.asarray(pred), jnp.asarray(ry[:, 0]), jnp.ones(n, bool),
        num_head_bin=bins))
    np.testing.assert_allclose(out_got, out_ref.item(), rtol=1e-5)


def test_centernet_focal_loss_matches_reference():
    rng = np.random.RandomState(8)
    logits = rng.randn(2, 1, 32, 40).astype(np.float32) * 2
    hm = np.zeros((2, 1, 32, 40), np.float32)
    # plant gaussian-ish blobs with exact-1 peaks
    for b in range(2):
        for _ in range(5):
            y, x = rng.randint(0, 32), rng.randint(0, 40)
            hm[b, 0, y, x] = 1.0
    hm = np.maximum(hm, rng.rand(2, 1, 32, 40).astype(np.float32) * 0.8)
    hm[hm < 0.81] *= (hm[hm < 0.81] > 0.3)   # sparsify

    ref = ref_loss.CenterNetFocalLoss()
    out_ref = ref(torch.from_numpy(logits), torch.from_numpy(hm)).item()
    # ours is NHWC
    out_got = float(loss_utils.centernet_focal_loss(
        jnp.asarray(logits.transpose(0, 2, 3, 1)),
        jnp.asarray(hm.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out_got, out_ref, rtol=1e-4)


def test_centernet_res_loss_matches_reference():
    rng = np.random.RandomState(9)
    b, c, h, w, k = 2, 3, 16, 20, 10
    output = rng.randn(b, c, h, w).astype(np.float32)
    ind = rng.randint(0, h * w, (b, k))
    mask = (rng.rand(b, k) > 0.4).astype(np.float32)
    target = rng.randn(b, k, c).astype(np.float32)

    ref = ref_loss.CenterNetResLoss({'res_func': 'l1'})
    out_ref = ref(torch.from_numpy(output), torch.from_numpy(mask),
                  torch.from_numpy(ind), torch.from_numpy(target))
    out_ref = out_ref.item() if torch.is_tensor(out_ref) else out_ref
    out_got = float(loss_utils.centernet_res_loss(
        jnp.asarray(output.transpose(0, 2, 3, 1)), jnp.asarray(mask),
        jnp.asarray(ind), jnp.asarray(target), res_func='l1'))
    np.testing.assert_allclose(out_got, out_ref, rtol=1e-5)


def test_centernet_rot_binres_loss_matches_reference():
    rng = np.random.RandomState(10)
    b, bins, h, w, k = 2, 12, 16, 20, 8
    c = 2 * bins
    output = rng.randn(b, c, h, w).astype(np.float32)
    ind = rng.randint(0, h * w, (b, k))
    mask = (rng.rand(b, k) > 0.3).astype(np.float32)
    target = rng.uniform(-np.pi, np.pi, (b, k, 1)).astype(np.float32)

    ref = ref_loss.CenterNetRotBinResLoss({'num_bins': bins})
    out_ref = ref(torch.from_numpy(output), torch.from_numpy(mask),
                  torch.from_numpy(ind), torch.from_numpy(target))
    out_ref = out_ref.item() if torch.is_tensor(out_ref) else out_ref

    pred_map = jnp.asarray(output.transpose(0, 2, 3, 1))  # (B, H, W, C)
    pred = center_utils.gather_feat_nhwc(pred_map, jnp.asarray(ind))
    out_got = float(loss_utils.rot_binres_loss(
        pred.reshape(-1, c), jnp.asarray(target.reshape(-1)),
        jnp.asarray(mask.reshape(-1)).astype(bool), num_head_bin=bins))
    np.testing.assert_allclose(out_got, out_ref, rtol=1e-5)


# --------------------------------------------------------- common / box utils

def test_limit_period_matches_reference():
    rng = np.random.RandomState(11)
    vals = rng.uniform(-10, 10, 100).astype(np.float32)
    out_ref = ref_common.limit_period(torch.from_numpy(vals)).numpy()
    out_got = np.asarray(common_utils.limit_period(jnp.asarray(vals)))
    np.testing.assert_allclose(out_got, out_ref, rtol=1e-5, atol=1e-6)


def test_rotate_points_along_z_matches_reference():
    rng = np.random.RandomState(12)
    pts = rng.randn(4, 30, 5).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, 4).astype(np.float32)
    out_ref = ref_common.rotate_points_along_z(
        torch.from_numpy(pts.copy()), torch.from_numpy(ang)).numpy()
    out_got = np.asarray(common_utils.rotate_points_along_z(
        jnp.asarray(pts), jnp.asarray(ang)))
    np.testing.assert_allclose(out_got, out_ref, rtol=1e-4, atol=1e-5)


def test_get_voxel_centers_matches_reference():
    rng = np.random.RandomState(13)
    coords = rng.randint(0, 100, (50, 3)).astype(np.int32)   # (N, 3) zyx
    vs = [0.05, 0.05, 0.1]
    pcr = [0, -40, -3, 70.4, 40, 1]
    out_ref = ref_common.get_voxel_centers(
        torch.from_numpy(coords), downsample_times=4, voxel_size=vs,
        point_cloud_range=pcr).numpy()
    out_got = np.asarray(common_utils.get_voxel_centers(
        jnp.asarray(coords), 4, vs, pcr))
    np.testing.assert_allclose(out_got, out_ref, rtol=1e-5, atol=1e-5)


def test_boxes_to_corners_3d_matches_reference():
    rng = np.random.RandomState(14)
    boxes = _rand_boxes(rng, 25)
    out_ref = ref_boxu.boxes_to_corners_3d(torch.from_numpy(boxes)).numpy()
    out_got = np.asarray(box_utils.boxes_to_corners_3d(jnp.asarray(boxes)))
    np.testing.assert_allclose(out_got, out_ref, rtol=1e-4, atol=1e-4)


def test_boxes_to_CTcorners_3d_matches_reference():
    rng = np.random.RandomState(15)
    boxes = _rand_boxes(rng, 25)
    out_ref = ref_boxu.boxes_to_CTcorners_3d(torch.from_numpy(boxes)).numpy()
    out_got = np.asarray(box_utils.boxes_to_CTcorners_3d(jnp.asarray(boxes)))
    np.testing.assert_allclose(out_got, out_ref, rtol=1e-4, atol=1e-4)


def test_enlarge_box3d_matches_reference():
    rng = np.random.RandomState(16)
    boxes = _rand_boxes(rng, 20)
    out_ref = ref_boxu.enlarge_box3d(
        torch.from_numpy(boxes.copy()), extra_width=(1.6, 1.6, 1.6)).numpy()
    out_got = np.asarray(box_utils.enlarge_box3d(
        jnp.asarray(boxes), extra_width=(1.6, 1.6, 1.6)))
    np.testing.assert_allclose(out_got, out_ref, rtol=1e-5, atol=1e-5)


def test_decode_rot_binres_matches_reference():
    rng = np.random.RandomState(17)
    n, bins = 40, 12
    pred = rng.randn(n, 2 * bins).astype(np.float32)
    out_ref = ref_boxu.decode_rot_binres(
        torch.from_numpy(pred), num_head_bin=bins)
    out_ref = out_ref.numpy() if torch.is_tensor(out_ref) else out_ref
    out_got = np.asarray(box_utils.decode_rot_binres(
        jnp.asarray(pred), num_head_bin=bins))
    np.testing.assert_allclose(out_got.reshape(out_ref.shape), out_ref,
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------- center utilities

def test_gaussian_radius_matches_reference():
    rng = np.random.RandomState(18)
    for _ in range(20):
        h = float(rng.uniform(1, 40))
        w = float(rng.uniform(1, 40))
        r_ref = ref_center.gaussian_radius((h, w), min_overlap=0.5)
        r_got = float(center_utils.gaussian_radius(h, w, min_overlap=0.5))
        np.testing.assert_allclose(r_got, r_ref, rtol=1e-5)


def test_draw_gaussian_matches_reference():
    rng = np.random.RandomState(19)
    h, w = 48, 56
    centers = np.stack([rng.randint(0, w, 6), rng.randint(0, h, 6)],
                       axis=-1)           # (K, 2) xy
    radius = rng.randint(1, 8, 6)

    hm_ref = np.zeros((h, w), np.float32)
    for c, r in zip(centers, radius):
        ref_center.draw_umich_gaussian(hm_ref, c, int(r))

    hm_got = np.asarray(center_utils.draw_gaussians(
        jnp.zeros((h, w), jnp.float32), jnp.asarray(centers),
        jnp.asarray(radius).astype(jnp.float32), jnp.ones(6, bool)))
    np.testing.assert_allclose(hm_got, hm_ref, rtol=1e-4, atol=1e-5)


# --------------------------------------------------- rotated IoU / NMS oracle

def _ref_rotated_iou_matrix(boxes7, qboxes7, criterion=-1):
    """Run the reference's own polygon-clipping geometry (rotate_iou.py
    devRotateIoUEval, pure Python under the numba stub) pairwise on lidar
    7-dim boxes. rotate_iou rotates CLOCKWISE by its angle (camera-frame ry
    convention, rbbox_to_corners rotate_iou.py:200-226); lidar headings are
    CCW, so pass -heading."""

    def to5(b):
        out = b[:, [0, 1, 3, 4, 6]].astype(np.float32).copy()
        out[:, 4] = -out[:, 4]
        return out

    boxes5, qboxes5 = to5(boxes7), to5(qboxes7)
    n, k = len(boxes5), len(qboxes5)
    out = np.zeros((n, k), np.float32)
    for i in range(n):
        for j in range(k):
            out[i, j] = ref_riou.devRotateIoUEval(
                qboxes5[j], boxes5[i], criterion)
    return out


def test_bev_iou_matches_reference_geometry():
    rng = np.random.RandomState(20)
    a = _rand_boxes(rng, 24)
    b = _rand_boxes(rng, 18)
    # cluster them so overlaps actually occur
    b[:, 0] = a[:18, 0] + rng.uniform(-2, 2, 18)
    b[:, 1] = a[:18, 1] + rng.uniform(-2, 2, 18)

    ref = _ref_rotated_iou_matrix(a, b)
    got = np.asarray(iou3d.boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_iou3d_matches_reference_geometry():
    rng = np.random.RandomState(21)
    a = _rand_boxes(rng, 16)
    b = a.copy()
    b[:, :3] += rng.uniform(-1.5, 1.5, (16, 3)).astype(np.float32)
    b[:, 6] += rng.uniform(-0.5, 0.5, 16).astype(np.float32)

    # oracle: reference BEV intersection (criterion=2 -> raw area) x z overlap
    inter_bev = _ref_rotated_iou_matrix(a, b, criterion=2)
    za1, za2 = a[:, 2] - a[:, 5] / 2, a[:, 2] + a[:, 5] / 2
    zb1, zb2 = b[:, 2] - b[:, 5] / 2, b[:, 2] + b[:, 5] / 2
    zh = np.clip(np.minimum(za2[:, None], zb2[None]) -
                 np.maximum(za1[:, None], zb1[None]), 0, None)
    inter = inter_bev * zh
    vol_a = (a[:, 3] * a[:, 4] * a[:, 5])[:, None]
    vol_b = (b[:, 3] * b[:, 4] * b[:, 5])[None]
    ref = inter / np.clip(vol_a + vol_b - inter, 1e-6, None)

    got = np.asarray(iou3d.boxes_iou3d(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_nms_matches_reference_greedy_semantics():
    """Our nms_rotated must keep exactly the boxes a sequential greedy pass
    with the reference's own IoU geometry keeps (reference nms_gpu bitmask
    semantics, iou3d_nms_kernel.cu:267-312)."""
    rng = np.random.RandomState(22)
    n = 60
    boxes = _rand_boxes(rng, n)
    # force heavy overlap clusters
    boxes[:, 0] = rng.uniform(-10, 10, n)
    boxes[:, 1] = rng.uniform(-10, 10, n)
    scores = rng.rand(n).astype(np.float32)
    thresh = 0.1

    order = np.argsort(-scores, kind='stable')
    iou = _ref_rotated_iou_matrix(boxes, boxes)
    keep_ref = []
    suppressed = np.zeros(n, bool)
    for i in order:
        if suppressed[i]:
            continue
        keep_ref.append(i)
        for j in order:
            if not suppressed[j] and j != i and iou[i, j] > thresh:
                suppressed[j] = True

    idx, valid = iou3d.nms_rotated(jnp.asarray(boxes), jnp.asarray(scores),
                                   thresh, pre_max=n, post_max=n)
    keep_got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(np.sort(keep_got), np.sort(keep_ref))
