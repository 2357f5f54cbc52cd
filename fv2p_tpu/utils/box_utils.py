"""3D box geometry in pure jnp (TPU-native re-design of reference
``pcdet/utils/box_utils.py``). Boxes are (N, 7): [x, y, z, dx, dy, dz, heading]
with (x, y, z) the box center and heading a CCW rotation about +z."""
import jax.numpy as jnp
import numpy as np

from . import common_utils

# Corner template, matching reference boxes_to_corners_3d (box_utils.py:28-53):
#     7 -------- 4
#    /|         /|
#   6 -------- 5 .
#   | |        | |
#   . 3 -------- 0
#   |/         |/
#   2 -------- 1
_CORNER_TEMPLATE = np.array([
    [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
    [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
], dtype=np.float32) / 2


def boxes_to_corners_3d(boxes3d):
    """(N, 7) -> (N, 8, 3) corner coordinates. Reference box_utils.py:28-53."""
    boxes3d = jnp.asarray(boxes3d)
    template = jnp.asarray(_CORNER_TEMPLATE, dtype=boxes3d.dtype)
    corners = boxes3d[:, None, 3:6] * template[None, :, :]
    corners = common_utils.rotate_points_along_z(corners, boxes3d[:, 6])
    return corners + boxes3d[:, None, 0:3]


def boxes_to_corners_bev(boxes3d):
    """(N, 7) -> (N, 4, 2) BEV corner xy (bottom face order 0,1,2,3)."""
    boxes3d = jnp.asarray(boxes3d)
    template = jnp.asarray(_CORNER_TEMPLATE[:4, :2], dtype=boxes3d.dtype)
    corners = boxes3d[:, None, 3:5] * template[None, :, :]  # (N, 4, 2)
    cosa = jnp.cos(boxes3d[:, 6])[:, None]
    sina = jnp.sin(boxes3d[:, 6])[:, None]
    x = corners[..., 0] * cosa - corners[..., 1] * sina
    y = corners[..., 0] * sina + corners[..., 1] * cosa
    return jnp.stack([x, y], axis=-1) + boxes3d[:, None, 0:2]


def boxes_to_CTcorners_3d(boxes3d):
    """Canonical (un-rotated, un-translated) corners for the CGE stream.

    Reference box_utils.py:56-81.
    """
    boxes3d = jnp.asarray(boxes3d)
    template = jnp.asarray(_CORNER_TEMPLATE, dtype=boxes3d.dtype)
    return boxes3d[:, None, 3:6] * template[None, :, :]


def enlarge_box3d(boxes3d, extra_width=(0, 0, 0)):
    """Enlarge dx/dy/dz by extra_width (z center shifts down by half dz delta
    in the reference only for bottom-centred variants; here boxes are
    center-based so only dims grow). Reference box_utils.py:190-203."""
    boxes3d = jnp.asarray(boxes3d)
    extra = jnp.asarray(extra_width, dtype=boxes3d.dtype)
    large = boxes3d.at[:, 3:6].add(extra) if hasattr(boxes3d, 'at') else boxes3d
    return large


def decode_rot_binres(pred_reg, num_head_bin=None):
    """Bin+residual heading decode. pred_reg (N, 2*num_bins) -> (N, 1) in (-pi, pi].

    Mirrors reference box_utils.decode_rot_binres (box_utils.py:366-407):
    bin centers at k * (2pi / num_bins); residual scaled by half bin width.
    """
    n, c = pred_reg.shape
    if num_head_bin is None:
        num_head_bin = c // 2
    bins = pred_reg[:, :num_head_bin]
    res = pred_reg[:, num_head_bin:2 * num_head_bin]
    ry_bin = jnp.argmax(bins, axis=1)
    ry_res_norm = jnp.take_along_axis(res, ry_bin[:, None], axis=1)[:, 0]
    angle_per_class = (2 * np.pi) / num_head_bin
    ry_res = ry_res_norm * (angle_per_class / 2)
    ry = (ry_bin.astype(pred_reg.dtype) * angle_per_class + ry_res) % (2 * np.pi)
    ry = jnp.where(ry > np.pi, ry - 2 * np.pi, ry)
    return ry.reshape(n, 1)


def encode_rot_binres(ry_label, num_head_bin):
    """Training-side encoding matching loss_utils.get_rot_binres_loss
    (reference loss_utils.py:334-408): returns (bin_label int, res_norm_label).
    """
    angle_per_class = (2 * np.pi) / num_head_bin
    heading = ry_label % (2 * np.pi)
    shift = (heading + angle_per_class / 2) % (2 * np.pi)
    bin_label = jnp.floor(shift / angle_per_class).astype(jnp.int32)
    res = shift - (bin_label.astype(shift.dtype) * angle_per_class + angle_per_class / 2)
    res_norm = res / (angle_per_class / 2)
    return bin_label, res_norm


# ---------------------------------------------------------------------------
# numpy variants for the host-side data pipeline
# ---------------------------------------------------------------------------

def boxes_to_corners_3d_np(boxes3d):
    corners = boxes3d[:, None, 3:6] * _CORNER_TEMPLATE[None, :, :]
    corners = common_utils.rotate_points_along_z_np(corners.astype(np.float32), boxes3d[:, 6])
    return corners + boxes3d[:, None, 0:3]


def mask_boxes_outside_range_numpy(boxes, limit_range, min_num_corners=1):
    """Reference box_utils.py:86-103."""
    if boxes.shape[1] > 7:
        boxes = boxes[:, 0:7]
    corners = boxes_to_corners_3d_np(boxes)  # (N, 8, 3)
    mask = ((corners >= limit_range[0:3]) & (corners <= limit_range[3:6])).all(axis=2)
    return mask.sum(axis=1) >= min_num_corners


def in_box_bev_np(points_xy, boxes3d):
    """(N,2) points x (M,7) boxes -> (M,N) bool BEV containment (numpy)."""
    shift = points_xy[None, :, :] - boxes3d[:, None, 0:2]  # (M, N, 2)
    cosa = np.cos(-boxes3d[:, 6])[:, None]
    sina = np.sin(-boxes3d[:, 6])[:, None]
    local_x = shift[..., 0] * cosa - shift[..., 1] * sina
    local_y = shift[..., 0] * sina + shift[..., 1] * cosa
    return (np.abs(local_x) <= boxes3d[:, None, 3] / 2) & \
           (np.abs(local_y) <= boxes3d[:, None, 4] / 2)
