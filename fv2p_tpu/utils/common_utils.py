"""Common geometry / logging utilities (TPU-native jnp re-design of
reference ``pcdet/utils/common_utils.py``)."""
import logging
import os
import random

import jax.numpy as jnp
import numpy as np


def limit_period(val, offset=0.5, period=jnp.pi):
    """Wrap values into ``[-offset*period, (1-offset)*period)``.

    Reference: common_utils.py:62-66.
    """
    return val - jnp.floor(val / period + offset) * period


def limit_period_np(val, offset=0.5, period=np.pi):
    return val - np.floor(val / period + offset) * period


def rotate_points_along_z(points, angle):
    """Rotate points around the z axis.

    Args:
        points: (B, N, 3 + C)
        angle: (B,), counter-clockwise (lidar frame) angle in radians
    Returns:
        rotated points, same shape.

    Reference: common_utils.py:34-55.
    """
    cosa = jnp.cos(angle)
    sina = jnp.sin(angle)
    zeros = jnp.zeros_like(angle)
    ones = jnp.ones_like(angle)
    rot_matrix = jnp.stack([
        cosa, sina, zeros,
        -sina, cosa, zeros,
        zeros, zeros, ones,
    ], axis=1).reshape(-1, 3, 3)
    points_rot = jnp.matmul(points[:, :, 0:3], rot_matrix)
    return jnp.concatenate([points_rot, points[:, :, 3:]], axis=-1)


def rotate_points_along_z_np(points, angle):
    cosa, sina = np.cos(angle), np.sin(angle)
    zeros, ones = np.zeros_like(angle), np.ones_like(angle)
    rot = np.stack([cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones],
                   axis=1).reshape(-1, 3, 3)
    pts = np.matmul(points[:, :, 0:3], rot.astype(points.dtype))
    return np.concatenate([pts, points[:, :, 3:]], axis=-1)


def get_voxel_centers(voxel_coords, downsample_times, voxel_size, point_cloud_range):
    """Voxel (z,y,x) integer coords -> metric xyz centers.

    Args:
        voxel_coords: (N, 3) int array in (z, y, x) order (no batch column).
    Reference: common_utils.py:76-92.
    """
    voxel_centers = voxel_coords[:, ::-1].astype(jnp.float32)  # (z,y,x) -> (x,y,z)
    voxel_size = jnp.asarray(voxel_size, dtype=jnp.float32) * downsample_times
    pc_range = jnp.asarray(point_cloud_range[0:3], dtype=jnp.float32)
    return (voxel_centers + 0.5) * voxel_size + pc_range


def keep_arrays_by_name(gt_names, used_classes):
    """Indices of entries whose name is in used_classes (reference
    common_utils.py:99-103)."""
    inds = [i for i, x in enumerate(gt_names) if x in used_classes]
    return np.array(inds, dtype=np.int64)


def drop_info_with_name(info, name):
    """Filter annotation dict rows with a given name (reference
    common_utils.py:24-31)."""
    ret_info = {}
    keep_indices = [i for i, x in enumerate(info['name']) if x != name]
    for key in info.keys():
        ret_info[key] = info[key][keep_indices]
    return ret_info


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    logger = logging.getLogger(__name__)
    logger.setLevel(log_level if rank == 0 else 'ERROR')
    formatter = logging.Formatter('%(asctime)s  %(levelname)5s  %(message)s')
    console = logging.StreamHandler()
    console.setLevel(log_level if rank == 0 else 'ERROR')
    console.setFormatter(formatter)
    logger.addHandler(console)
    if log_file is not None:
        file_handler = logging.FileHandler(filename=log_file)
        file_handler.setLevel(log_level if rank == 0 else 'ERROR')
        file_handler.setFormatter(formatter)
        logger.addHandler(file_handler)
    logger.propagate = False
    return logger


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)
    os.environ['PYTHONHASHSEED'] = str(seed)
