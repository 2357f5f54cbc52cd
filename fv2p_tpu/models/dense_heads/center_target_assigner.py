"""Device-side CenterNet target assignment (TPU-native re-design of the
reference CPU+cv2 assigner, ``keypoint_assigner/centertarget_assigner.py``).

The reference moves gt boxes to CPU and draws per-sample numpy/cv2 maps
(:40-68); here the whole assignment is vectorized jnp, vmapped over the
batch, so it lives inside the jitted train step."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import box_utils, center_utils


def _quad_mask(h, w, corners_xy):
    """(4,2) convex quad corner pixel coords -> (H, W) bool inside mask."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    x, y = corners_xy[:, 0], corners_xy[:, 1]
    area2 = jnp.sum(x * jnp.roll(y, -1) - jnp.roll(x, -1) * y)
    sgn = jnp.where(area2 >= 0, 1.0, -1.0)
    inside = jnp.ones((h, w), bool)
    for e in range(4):
        p1 = corners_xy[e]
        p2 = corners_xy[(e + 1) % 4]
        cross = (p2[0] - p1[0]) * (ys - p1[1]) - (p2[1] - p1[1]) * (xs - p1[0])
        inside &= (cross * sgn >= -1e-6)
    return inside


def assign_single(gt_boxes, gt_classes, *, num_classes, max_objs, fm_h, fm_w,
                  voxel_size, pc_range, stride, min_overlap, min_radius):
    """Single-sample target maps (reference assign_target_maps_single, :93-218).

    Args:
        gt_boxes: (M, 7); gt_classes: (M,) int32, 0 == padding.
    Returns dict of fixed-shape targets (NHWC maps).
    """
    m_total = gt_boxes.shape[0]
    m = min(m_total, max_objs)
    gt_boxes = gt_boxes[:m]
    gt_classes = gt_classes[:m]

    vx, vy = float(voxel_size[0]), float(voxel_size[1])
    x0, y0 = float(pc_range[0]), float(pc_range[1])

    obj_valid = (gt_classes > 0) & (jnp.sum(jnp.abs(gt_boxes), axis=1) > 0)

    dimx_fm = gt_boxes[:, 3] / vx / stride
    dimy_fm = gt_boxes[:, 4] / vy / stride
    radius = center_utils.gaussian_radius(
        jnp.ceil(dimx_fm), jnp.ceil(dimy_fm), min_overlap)
    radius = jnp.maximum(jnp.floor(radius), float(min_radius))
    size_ok = (dimx_fm > 0) & (dimy_fm > 0)

    coor_x = (gt_boxes[:, 0] - x0) / vx / stride
    coor_y = (gt_boxes[:, 1] - y0) / vy / stride
    ct = jnp.stack([coor_x, coor_y], axis=1)
    ct_int = jnp.round(ct)  # round-half-even, like np.around in the reference
    in_range = ((ct_int[:, 0] >= 0) & (ct_int[:, 0] < fm_w)
                & (ct_int[:, 1] >= 0) & (ct_int[:, 1] < fm_h))
    use = obj_valid & size_ok & in_range

    x_int = ct_int[:, 0].astype(jnp.int32)
    y_int = ct_int[:, 1].astype(jnp.int32)

    ind = jnp.where(use, fm_w * y_int + x_int, 0)
    mask = use.astype(jnp.float32)
    anno_box = jnp.concatenate([ct - ct_int, gt_boxes[:, 2:7]], axis=1)
    anno_box = anno_box * mask[:, None]
    xsys = ct_int * mask[:, None]
    src_box = gt_boxes[:, :7] * mask[:, None]

    # BEV corner pixel coords for the segm / height raster
    corners = box_utils.boxes_to_corners_3d(gt_boxes)[:, 0:4, 0:2]  # (M,4,2)
    cx = jnp.clip(corners[..., 0], x0, float(pc_range[3]))
    cy = jnp.clip(corners[..., 1], y0, float(pc_range[4]))
    corner_px = jnp.round(jnp.stack(
        [(cx - x0) / vx / stride, (cy - y0) / vy / stride], axis=-1))

    cls_idx = jnp.clip(gt_classes - 1, 0, num_classes - 1)

    def body(k, carry):
        hm, segm, height = carry
        # heatmap gaussian splat for object k
        r = radius[k]
        sigma = (2.0 * r + 1.0) / 6.0
        ys = jax.lax.broadcasted_iota(jnp.float32, (fm_h, fm_w), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (fm_h, fm_w), 1)
        dx = xs - ct_int[k, 0]
        dy = ys - ct_int[k, 1]
        g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
        g = jnp.where((jnp.abs(dx) <= r) & (jnp.abs(dy) <= r) & use[k], g, 0.0)
        hm = hm.at[cls_idx[k]].max(g)
        # segm + height raster
        fg = _quad_mask(fm_h, fm_w, corner_px[k]) & use[k]
        segm = jnp.where(fg, 1.0, segm)
        height = jnp.where(fg, gt_boxes[k, 2], height)  # later objects overwrite
        return hm, segm, height

    hm0 = jnp.zeros((num_classes, fm_h, fm_w), jnp.float32)
    segm0 = jnp.zeros((fm_h, fm_w), jnp.float32)
    height0 = jnp.zeros((fm_h, fm_w), jnp.float32)
    hm, segm, height = jax.lax.fori_loop(0, m, body, (hm0, segm0, height0))

    pad = max_objs - m
    def _pad(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    return {
        'hm_target': hm.transpose(1, 2, 0),           # (H, W, C)
        'anno_box_target': _pad(anno_box),            # (max_objs, 7)
        'ind_target': _pad(ind).astype(jnp.int32),
        'mask_target': _pad(mask),
        'segm_target': segm[..., None],               # (H, W, 1)
        'height_target': height[..., None],
        'src_box_target': _pad(src_box),
        'xsys_target': _pad(xsys),
    }


class CenterTargetAssigner:
    """Batched assigner (reference CenterTargetAssigner.assign_targets)."""

    def __init__(self, model_cfg, class_names, voxel_size, point_cloud_range):
        tc = model_cfg.TARGET_ASSIGNER_CONFIG
        self.num_classes = len(class_names)
        self.max_objs = int(tc.MAX_OBJS)
        self.min_overlap = float(tc.GAUSSIAN_MINOVERLAP)
        self.min_radius = int(tc.GAUSSIAN_MINRADIUS)
        self.stride = int(tc.FEATURE_MAP_STRIDE)
        self.voxel_size = tuple(float(v) for v in voxel_size)
        self.pc_range = tuple(float(v) for v in point_cloud_range)
        self.fm_h = int(round((self.pc_range[4] - self.pc_range[1])
                              / self.voxel_size[1] / self.stride))
        self.fm_w = int(round((self.pc_range[3] - self.pc_range[0])
                              / self.voxel_size[0] / self.stride))

    def assign_targets(self, gt_boxes_with_classes):
        """gt_boxes_with_classes: (B, M, 8) [x,y,z,dx,dy,dz,ry,cls]."""
        gt_boxes = gt_boxes_with_classes[..., :7]
        gt_classes = gt_boxes_with_classes[..., 7].astype(jnp.int32)
        fn = partial(
            assign_single, num_classes=self.num_classes, max_objs=self.max_objs,
            fm_h=self.fm_h, fm_w=self.fm_w, voxel_size=self.voxel_size,
            pc_range=self.pc_range, stride=self.stride,
            min_overlap=self.min_overlap, min_radius=self.min_radius)
        out = jax.vmap(fn)(gt_boxes, gt_classes)
        out['batch_gtboxes_src'] = gt_boxes_with_classes
        return out
