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

    TPU layout note: all working buffers are shaped (V, P) — the small vertex
    axis in sublanes, the flattened pair axis in lanes — and the per-pair
    vertex gathers/scatters are expressed as select-sums over the static V
    axis. A (..., V, 2)-shaped formulation gets ~64x memory inflation from
    the (8, 128) tile padding of its tiny trailing dims and OOMs at scale.
    """
    batch_shape = poly_a.shape[:-2]
    p = int(np.prod(batch_shape)) if batch_shape else 1
    v = _MAX_VERTS

    ax = poly_a[..., 0].reshape(p, 4).T          # (4, P)
    ay = poly_a[..., 1].reshape(p, 4).T
    bx = poly_b[..., 0].reshape(p, 4).T
    by = poly_b[..., 1].reshape(p, 4).T

    zeros4 = jnp.zeros((v - 4, p), poly_a.dtype)
    vx = jnp.concatenate([ax, zeros4], axis=0)    # (V, P)
    vy = jnp.concatenate([ay, zeros4], axis=0)
    count = jnp.full((p,), 4, jnp.int32)

    def select_rows(arr, row_idx):
        """arr (V, P), row_idx (V, P) in [0, V) -> arr[row_idx[i, p], p]."""
        out = jnp.zeros_like(arr)
        for k in range(v):
            out = out + jnp.where(row_idx == k, arr[k][None, :], 0.0)
        return out

    iota_v = jnp.arange(v)[:, None]               # (V, 1)

    for e in range(4):
        p1x, p1y = bx[e], by[e]                   # (P,)
        p2x, p2y = bx[(e + 1) % 4], by[(e + 1) % 4]
        ex, ey = p2x - p1x, p2y - p1y

        side = ex[None, :] * (vy - p1y[None, :]) - ey[None, :] * (vx - p1x[None, :])
        inside = side >= 0                        # (V, P)

        nxt_idx = jnp.where(iota_v + 1 < count[None, :], iota_v + 1, 0)
        nxt_x = select_rows(vx, nxt_idx)
        nxt_y = select_rows(vy, nxt_idx)
        nxt_side = ex[None, :] * (nxt_y - p1y[None, :]) - ey[None, :] * (nxt_x - p1x[None, :])
        nxt_inside = nxt_side >= 0

        valid_slot = iota_v < count[None, :]

        denom = side - nxt_side
        t = side / jnp.where(jnp.abs(denom) > _EPS, denom, _EPS)
        ix = vx + t * (nxt_x - vx)
        iy = vy + t * (nxt_y - vy)

        emit_cur = inside & valid_slot
        emit_int = (inside != nxt_inside) & valid_slot

        # interleave: candidate 2i = cur vertex i, 2i+1 = intersection i
        cand_x = jnp.stack([vx, ix], axis=1).reshape(2 * v, p)
        cand_y = jnp.stack([vy, iy], axis=1).reshape(2 * v, p)
        cand_valid = jnp.stack([emit_cur, emit_int], axis=1).reshape(2 * v, p)

        pos = jnp.cumsum(cand_valid.astype(jnp.int32), axis=0) - 1
        slot = jnp.where(cand_valid, pos, v)      # v == dropped

        # compact via per-row masked sums (each (k, p) has at most one source c)
        new_rows_x = []
        new_rows_y = []
        for k in range(v):
            m = slot == k                          # (2V, P)
            new_rows_x.append(jnp.sum(jnp.where(m, cand_x, 0.0), axis=0))
            new_rows_y.append(jnp.sum(jnp.where(m, cand_y, 0.0), axis=0))
        vx = jnp.stack(new_rows_x, axis=0)
        vy = jnp.stack(new_rows_y, axis=0)
        count = jnp.minimum(pos[-1] + 1, v)

    nxt_idx = jnp.where(iota_v + 1 < count[None, :], iota_v + 1, 0)
    nxt_x = select_rows(vx, nxt_idx)
    nxt_y = select_rows(vy, nxt_idx)
    cross = vx * nxt_y - vy * nxt_x
    cross = jnp.where(iota_v < count[None, :], cross, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(cross, axis=0))
    area = jnp.where(count >= 3, area, 0.0)
    return area.reshape(batch_shape) if batch_shape else area[0]


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
    """(N, N) bool matrix iou_bev(i, j) > thresh via the Pallas clip kernel
    on TPU (VMEM-resident clipping; the XLA formulation is ~25x slower);
    XLA fallback off-TPU (interpret-mode Pallas would be far slower)."""
    n = boxes.shape[0]
    corners = _bev_corners_ccw(boxes)
    area = boxes[:, 3] * boxes[:, 4]
    if jax.default_backend() in ('tpu', 'axon'):
        from ..ops.pallas import rotated_iou
        ov = rotated_iou.overlap_matrix(corners, corners)
    else:
        n_tiles = max(1, (n + row_tile - 1) // row_tile)
        pad = n_tiles * row_tile - n
        corners_p = jnp.pad(corners, ((0, pad), (0, 0), (0, 0)))

        def one_tile(tile_corners):
            t = tile_corners.shape[0]
            pa = jnp.broadcast_to(tile_corners[:, None], (t, n, 4, 2))
            pb = jnp.broadcast_to(corners[None, :], (t, n, 4, 2))
            return _polygon_clip_area(pa, pb)

        rows = jax.lax.map(one_tile, corners_p.reshape(n_tiles, row_tile, 4, 2))
        ov = rows.reshape(n_tiles * row_tile, n)[:n]
    iou = ov / jnp.clip(area[:, None] + area[None, :] - ov, min=1e-6)
    return iou > thresh


def _greedy_by_fixed_point(overlap, valid):
    """Exact greedy suppression as a fixed-point iteration.

    keep_i = valid_i and no kept j < i overlaps i. Iterating this map from
    all-valid converges to the greedy solution (box 0 is immediately stable;
    once boxes < i are stable, box i stabilizes one iteration later), usually
    within ~chain-depth iterations. Each iteration is one (N,)x(N,N) matvec
    on the MXU — replacing N sequential mask updates.
    """
    n = overlap.shape[0]
    idx = jnp.arange(n)
    # ov_lower[j, i] = True when j < i may suppress i
    ov_lower = (overlap & (idx[:, None] < idx[None, :])).astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < n)

    def body(state):
        keep, _, it = state
        sup = jnp.matmul(keep.astype(jnp.float32), ov_lower,
                         preferred_element_type=jnp.float32) > 0
        return valid & ~sup, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), 0))
    return keep


def _nms_keep_flags(boxes_s, valid, thresh, row_tile):
    """Dense-path keep flags over score-sorted boxes."""
    overlap = _overlap_matrix_tiled(boxes_s, thresh, row_tile=row_tile)
    overlap = overlap & valid[None, :] & valid[:, None]
    return _greedy_by_fixed_point(overlap, valid)


def _nms_keep_flags_blocked(boxes_s, valid, thresh, post_max, row_tile,
                            block=1024):
    """Blocked greedy NMS over score-sorted boxes: exact greedy semantics for
    the first `post_max` kept boxes at a fraction of the O(N^2) clipping cost.

    Greedy NMS only ever tests a candidate against already-KEPT boxes, and
    callers discard everything past post_max — so once post_max boxes are
    kept, the remaining candidates cannot change the result. Blocks are
    processed in score order under ``lax.cond``: a block runs (cross-check
    vs the kept buffer + internal fixed-point greedy) only while the kept
    buffer is not yet full. With loose thresholds (e.g. FV2P's 0.85 proposal
    NMS over 9000 candidates) one block typically fills the buffer, turning
    a 9000^2 clipping table into ~1024^2 (measured 168 ms -> ~8 ms).
    """
    n = boxes_s.shape[0]
    n_blocks = (n + block - 1) // block
    pad = n_blocks * block - n
    boxes_p = jnp.pad(boxes_s, ((0, pad), (0, 0)))
    valid_p = jnp.pad(valid, (0, pad))
    buf_cap = post_max

    def run_block(carry):
        kept_boxes, kept_cnt, keep_flags, start = carry
        blk_boxes = jax.lax.dynamic_slice(boxes_p, (start, 0), (block, 7))
        blk_valid = jax.lax.dynamic_slice(valid_p, (start,), (block,))

        # cross-suppression vs the kept buffer (same clip kernel as the
        # internal pass for bitwise-consistent borderline behavior)
        kept_mask = jnp.arange(buf_cap) < kept_cnt
        ov_x = _overlap_matrix_rect(blk_boxes, kept_boxes)
        sup_x = jnp.any((ov_x > thresh) & kept_mask[None, :], axis=1)
        blk_ok = blk_valid & ~sup_x

        ov = _overlap_matrix_tiled(blk_boxes, thresh, row_tile=row_tile)
        ov = ov & blk_ok[None, :] & blk_ok[:, None]
        blk_keep = _greedy_by_fixed_point(ov, blk_ok)

        # append surviving boxes to the kept buffer (score order preserved)
        pos = kept_cnt + jnp.cumsum(blk_keep.astype(jnp.int32)) - 1
        ok = blk_keep & (pos < buf_cap)
        kept_boxes = kept_boxes.at[jnp.where(ok, pos, buf_cap)].set(
            blk_boxes, mode='drop')
        kept_cnt = jnp.minimum(
            kept_cnt + jnp.sum(blk_keep.astype(jnp.int32)), buf_cap)
        keep_flags = jax.lax.dynamic_update_slice(keep_flags, blk_keep,
                                                  (start,))
        return kept_boxes, kept_cnt, keep_flags, start

    def body(carry, b):
        kept_boxes, kept_cnt, keep_flags, _ = carry
        carry = (kept_boxes, kept_cnt, keep_flags, b * block)
        carry = jax.lax.cond(kept_cnt < buf_cap, run_block,
                             lambda c: c, carry)
        return carry, None

    init = (jnp.zeros((buf_cap, 7), boxes_s.dtype),
            jnp.zeros((), jnp.int32),
            jnp.zeros(n_blocks * block, bool),
            jnp.zeros((), jnp.int32))
    (_, _, keep_flags, _), _ = jax.lax.scan(
        body, init, jnp.arange(n_blocks, dtype=jnp.int32))
    return keep_flags[:n]


def _overlap_matrix_rect(boxes_a, boxes_b):
    """(N, 7) x (M, 7) -> (N, M) BEV IoU (rectangular helper)."""
    ca = _bev_corners_ccw(boxes_a)
    cb = _bev_corners_ccw(boxes_b)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    if jax.default_backend() in ('tpu', 'axon'):
        from ..ops.pallas import rotated_iou
        ov = rotated_iou.overlap_matrix(ca, cb)
    else:
        pa = jnp.broadcast_to(ca[:, None], (ca.shape[0], cb.shape[0], 4, 2))
        pb = jnp.broadcast_to(cb[None, :], (ca.shape[0], cb.shape[0], 4, 2))
        ov = _polygon_clip_area(pa, pb)
    return ov / jnp.clip(area_a[:, None] + area_b[None, :] - ov, min=1e-6)


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
    # NMS is pure index selection — never differentiable (the reference
    # runs it under no_grad). stop_gradient also keeps autodiff away from
    # the Pallas overlap kernel, which has no VJP.
    boxes = jax.lax.stop_gradient(boxes)
    scores = jax.lax.stop_gradient(scores)
    n = min(pre_max, boxes.shape[0])
    top_scores, order = jax.lax.top_k(scores, n)
    boxes_s = boxes[order]
    valid = top_scores > -jnp.inf

    if n > 2048:
        keep = _nms_keep_flags_blocked(boxes_s, valid, thresh, post_max,
                                       row_tile)
    else:
        keep = _nms_keep_flags(boxes_s, valid, thresh, row_tile)

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
