import numpy as np
import jax.numpy as jnp

from fv2p_tpu.config import EasyDict, cfg_from_list, cfg_from_yaml_file, merge_new_config
from fv2p_tpu.utils import box_utils, common_utils


def test_easydict_attr_access():
    d = EasyDict({'A': {'B': [1, 2], 'C': 'x'}})
    assert d.A.B == [1, 2]
    d.A.NEW = {'Z': 3}
    assert d['A']['NEW'].Z == 3


def test_base_config_inheritance(tmp_path):
    base = tmp_path / 'base.yaml'
    base.write_text('DATASET: KittiDataset\nPOINT_CLOUD_RANGE: [0, -40, -3, 70.4, 40, 1]\nNESTED: {A: 1, B: 2}\n')
    child = tmp_path / 'child.yaml'
    child.write_text(f"DATA_CONFIG:\n    _BASE_CONFIG_: {base}\n    NESTED: {{B: 5}}\n")
    cfg_ = EasyDict()
    cfg_from_yaml_file(str(child), cfg_)
    assert cfg_.DATA_CONFIG.DATASET == 'KittiDataset'
    assert cfg_.DATA_CONFIG.NESTED.A == 1
    assert cfg_.DATA_CONFIG.NESTED.B == 5


def test_cfg_from_list_coercion():
    cfg_ = EasyDict({'OPT': {'LR': 0.01, 'EPOCHS': 10}})
    cfg_from_list(['OPT.LR', '0.1', 'OPT.EPOCHS', '20', 'OPT.NEW_KEY', 'abc'], cfg_)
    assert cfg_.OPT.LR == 0.1
    assert cfg_.OPT.EPOCHS == 20
    assert cfg_.OPT.NEW_KEY == 'abc'


def test_corners_unrotated():
    boxes = jnp.asarray(np.array([[1.0, 2.0, 3.0, 4.0, 2.0, 1.0, 0.0]], np.float32))
    corners = np.asarray(box_utils.boxes_to_corners_3d(boxes))[0]
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners[0], [3.0, 3.0, 2.5], atol=1e-5)  # (+,+,-)
    np.testing.assert_allclose(corners[6], [-1.0, 1.0, 3.5], atol=1e-5)  # (-,-,+)


def test_corners_rotation_90deg():
    boxes = jnp.asarray(np.array([[0, 0, 0, 4.0, 2.0, 1.0, np.pi / 2]], np.float32))
    corners = np.asarray(box_utils.boxes_to_corners_bev(boxes))[0]
    # rotating (+2,+1) by 90deg CCW -> (-1, +2)
    np.testing.assert_allclose(corners[0], [-1.0, 2.0], atol=1e-5)


def test_rot_binres_roundtrip():
    angles = jnp.asarray(np.linspace(-np.pi + 0.01, np.pi - 0.01, 37, dtype=np.float32))
    bin_label, res_norm = box_utils.encode_rot_binres(angles, num_head_bin=12)
    # build fake logits that argmax at bin_label with residual res_norm
    n = angles.shape[0]
    logits = np.full((n, 12), -10.0, np.float32)
    logits[np.arange(n), np.asarray(bin_label)] = 10.0
    res = np.zeros((n, 12), np.float32)
    res[np.arange(n), np.asarray(bin_label)] = np.asarray(res_norm)
    pred = jnp.asarray(np.concatenate([logits, res], axis=1))
    decoded = np.asarray(box_utils.decode_rot_binres(pred, num_head_bin=12))[:, 0]
    wrapped = np.asarray(common_utils.limit_period(angles, offset=0.5, period=2 * np.pi))
    np.testing.assert_allclose(decoded, wrapped, atol=1e-4)


def test_get_voxel_centers():
    coords = jnp.asarray(np.array([[0, 0, 0], [1, 2, 3]], np.int32))  # (z, y, x)
    centers = np.asarray(common_utils.get_voxel_centers(
        coords, downsample_times=2, voxel_size=[0.05, 0.05, 0.1],
        point_cloud_range=[0, -40, -3, 70.4, 40, 1]))
    np.testing.assert_allclose(centers[0], [0.05, -39.95, -2.9], atol=1e-5)
    np.testing.assert_allclose(centers[1], [0.35, -39.75, -2.7], atol=1e-5)
