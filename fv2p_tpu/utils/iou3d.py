"""Rotated-box IoU + NMS, pure XLA (TPU-native replacement for the reference
CUDA module ``pcdet/ops/iou3d_nms`` — polygon-clipping semantics of
``iou3d_nms_kernel.cu:51-233`` re-expressed as vectorized Sutherland-Hodgman
clipping; the bitmask NMS kernel (``:267-312``) becomes a precomputed tiled
overlap matrix + a cheap sequential mask loop).

All functions are jittable with static shapes.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import box_utils

_MAX_VERTS = 8  # intersection of two convex quads has <= 8 vertices
_EPS = 1e-8


def _polygon_clip_area(poly_a, poly_b):
    """Intersection area of two convex quadrilaterals.

    Args:
        poly_a: (..., 4, 2) subject polygon vertices, CCW order.
        poly_b: (..., 4, 2) clip polygon vertices, CCW order.
    Returns:
        (...,) intersection area.
    """
    batch_shape = poly_a.shape[:-2]
    # working buffer of vertices + count
    verts = jnp.concatenate(
        [poly_a, jnp.zeros(batch_shape + (_MAX_VERTS - 4, 2), poly_a.dtype)], axis=-2)
    count = jnp.full(batch_shape, 4, dtype=jnp.int32)

    for e in range(4):
        p1 = poly_b[..., e, :]
        p2 = poly_b[..., (e + 1) % 4, :]
        edge = p2 - p1  # (..., 2)

        # signed distance of each vertex to the clip edge (>=0 == inside for CCW)
        rel = verts - p1[..., None, :]  # (..., V, 2)
        side = edge[..., None, 0] * rel[..., 1] - edge[..., None, 1] * rel[..., 0]
        inside = side >= 0  # (..., V)

        idx = jnp.arange(_MAX_VERTS)
        nxt_idx = jnp.where(idx + 1 < count[..., None], idx + 1, 0)  # wraparound at count
        nxt_verts = jnp.take_along_axis(verts, nxt_idx[..., None], axis=-2)
        nxt_side = jnp.take_along_axis(side, nxt_idx, axis=-1)
        nxt_inside = nxt_side >= 0

        valid_slot = idx < count[..., None]

        # intersection point of segment (v, nxt) with the clip line
        denom = side - nxt_side
        t = side / jnp.where(jnp.abs(denom) > _EPS, denom, _EPS)
        inter_pt = verts + t[..., None] * (nxt_verts - verts)

        # candidate emission: [cur if inside] then [inter if crossing], per slot
        emit_cur = inside & valid_slot
        emit_int = (inside != nxt_inside) & valid_slot

        # interleave candidates: slot i -> candidates 2i (cur), 2i+1 (inter)
        cand = jnp.stack([verts, inter_pt], axis=-2)  # (..., V, 2, 2)
        cand = cand.reshape(batch_shape + (2 * _MAX_VERTS, 2))
        cand_valid = jnp.stack([emit_cur, emit_int], axis=-1)
        cand_valid = cand_valid.reshape(batch_shape + (2 * _MAX_VERTS,))

        # compact: stable position by prefix count of valid candidates
        pos = jnp.cumsum(cand_valid.astype(jnp.int32), axis=-1) - 1
        scatter_idx = jnp.where(cand_valid, pos, _MAX_VERTS)  # overflow slot dropped

        new_verts = jnp.zeros(batch_shape + (_MAX_VERTS, 2), poly_a.dtype)
        if batch_shape:
            new_verts = _batched_scatter(new_verts, scatter_idx, cand)
        else:
            new_verts = new_verts.at[scatter_idx].set(cand, mode='drop')
        verts = new_verts
        count = jnp.minimum(pos[..., -1] + 1, _MAX_VERTS)

    # shoelace area over the first `count` vertices
    idx = jnp.arange(_MAX_VERTS)
    nxt_idx = jnp.where(idx + 1 < count[..., None], idx + 1, 0)
    nxt_verts = jnp.take_along_axis(verts, nxt_idx[..., None], axis=-2)
    cross = verts[..., 0] * nxt_verts[..., 1] - verts[..., 1] * nxt_verts[..., 0]
    cross = jnp.where(idx < count[..., None], cross, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(cross, axis=-1))
    return jnp.where(count >= 3, area, 0.0)


def _batched_scatter(target, idx, updates):
    """target (..., V, 2), idx (..., 2V), updates (..., 2V, 2): scatter rows
    of `updates` to positions `idx` along axis -2 (idx == V drops)."""
    flat_b = int(np.prod(target.shape[:-2]))
    t = target.reshape(flat_b, target.shape[-2], 2)
    i = idx.reshape(flat_b, idx.shape[-1])
    u = updates.reshape(flat_b, updates.shape[-2], 2)
    b = jnp.arange(flat_b)[:, None]
    t = t.at[b, i].set(u, mode='drop')
    return t.reshape(target.shape)


def _bev_corners_ccw(boxes):
    """(N, 7) -> (N, 4, 2) BEV corners in CCW order for the clipper."""
    corners = box_utils.boxes_to_corners_bev(boxes)  # template order is CW
    return corners[:, ::-1, :]


def boxes_overlap_bev(boxes_a, boxes_b):
    """Rotated BEV overlap area table.

    Args: boxes_a (N, 7), boxes_b (M, 7). Returns (N, M) overlap areas.
    Reference: boxes_overlap_kernel, iou3d_nms_kernel.cu:236-249.
    """
    ca = _bev_corners_ccw(boxes_a)  # (N, 4, 2)
    cb = _bev_corners_ccw(boxes_b)  # (M, 4, 2)
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    pa = jnp.broadcast_to(ca[:, None], (n, m, 4, 2))
    pb = jnp.broadcast_to(cb[None, :], (n, m, 4, 2))
    return _polygon_clip_area(pa, pb)


def boxes_iou_bev(boxes_a, boxes_b):
    """Rotated BEV IoU (N, M). Reference: boxes_iou_bev_kernel (:252-265)."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / jnp.clip(area_a + area_b - overlap, min=1e-6)


def boxes_iou3d(boxes_a, boxes_b):
    """3D IoU (N, M) with z-extent intersection.

    Reference: iou3d_nms_utils.boxes_iou3d_gpu (iou3d_nms_utils.py:454-486):
    boxes are center-based, z overlap from [z - dz/2, z + dz/2].
    """
    overlap_bev = boxes_overlap_bev(boxes_a, boxes_b)  # (N, M)
    a_zmin = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    a_zmax = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    b_zmin = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    b_zmax = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    overlap_h = jnp.clip(jnp.minimum(a_zmax, b_zmax) - jnp.maximum(a_zmin, b_zmin), min=0.0)
    overlap_3d = overlap_bev * overlap_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlap_3d / jnp.clip(vol_a + vol_b - overlap_3d, min=1e-6)


def _overlap_matrix_tiled(boxes, thresh, row_tile=256):
    """(N, N) bool matrix iou_bev(i, j) > thresh computed in row tiles to
    bound peak memory of the clipping buffers."""
    n = boxes.shape[0]
    corners = _bev_corners_ccw(boxes)
    area = boxes[:, 3] * boxes[:, 4]
    n_tiles = max(1, (n + row_tile - 1) // row_tile)
    pad = n_tiles * row_tile - n
    corners_p = jnp.pad(corners, ((0, pad), (0, 0), (0, 0)))
    area_p = jnp.pad(area, (0, pad))

    def one_tile(tile_corners, tile_area):
        t = tile_corners.shape[0]
        pa = jnp.broadcast_to(tile_corners[:, None], (t, n, 4, 2))
        pb = jnp.broadcast_to(corners[None, :], (t, n, 4, 2))
        ov = _polygon_clip_area(pa, pb)
        iou = ov / jnp.clip(tile_area[:, None] + area[None, :] - ov, min=1e-6)
        return iou > thresh

    rows = jax.lax.map(
        lambda args: one_tile(*args),
        (corners_p.reshape(n_tiles, row_tile, 4, 2),
         area_p.reshape(n_tiles, row_tile)),
    )
    return rows.reshape(n_tiles * row_tile, n)[:n]


@partial(jax.jit, static_argnames=('pre_max', 'post_max', 'row_tile'))
def nms_rotated(boxes, scores, thresh, pre_max=4096, post_max=500, row_tile=256):
    """Greedy rotated NMS, exact semantics of the reference ``nms_gpu`` bitmask
    kernel (iou3d_nms_kernel.cu:267-312) on score-sorted boxes.

    Args:
        boxes: (N, 7). scores: (N,). Invalid entries should carry -inf score.
    Returns:
        keep_idx: (post_max,) indices into the input arrays (ordered by score),
        keep_valid: (post_max,) bool mask of surviving entries.
    """
    n = min(pre_max, boxes.shape[0])
    top_scores, order = jax.lax.top_k(scores, n)
    boxes_s = boxes[order]
    valid = top_scores > -jnp.inf

    overlap = _overlap_matrix_tiled(boxes_s, thresh, row_tile=row_tile)
    overlap = overlap & valid[None, :] & valid[:, None]

    idx = jnp.arange(n)

    def body(i, keep):
        sup = keep[i] & overlap[i] & (idx > i)
        return keep & ~sup

    keep = jax.lax.fori_loop(0, n, body, valid)

    # stable-compact kept indices (already score-ordered) to post_max entries
    kpos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    scatter_to = jnp.where(keep & (kpos < post_max), kpos, post_max)
    keep_idx = jnp.zeros(post_max + 1, jnp.int32).at[scatter_to].set(order, mode='drop')[:post_max]
    n_kept = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), post_max)
    keep_valid = jnp.arange(post_max) < n_kept
    return keep_idx, keep_valid


def points_in_rotated_boxes(points, boxes):
    """(N, 3) points x (M, 7) boxes -> (M, N) bool containment (device version
    of the reference roiaware points_in_boxes kernel semantics: z from center)."""
    shift = points[None, :, :3] - boxes[:, None, 0:3]  # (M, N, 3)
    cosa = jnp.cos(-boxes[:, 6])[:, None]
    sina = jnp.sin(-boxes[:, 6])[:, None]
    local_x = shift[..., 0] * cosa - shift[..., 1] * sina
    local_y = shift[..., 0] * sina + shift[..., 1] * cosa
    return (
        (jnp.abs(local_x) <= boxes[:, None, 3] / 2)
        & (jnp.abs(local_y) <= boxes[:, None, 4] / 2)
        & (jnp.abs(shift[..., 2]) <= boxes[:, None, 5] / 2)
    )
