"""CenterNet-style utilities in pure jnp (device-side re-design of reference
``pcdet/utils/center_utils.py``; the CPU+cv2 target drawing of
``centertarget_assigner.py`` is re-expressed as vectorized rasterization).

Feature maps here are NHWC: (B, H, W, C) with H == sizey, W == sizex."""
import jax
import jax.numpy as jnp
import numpy as np


def gather_feat_nhwc(feat, ind):
    """Gather flattened-spatial features.

    Args:
        feat: (B, H, W, C). ind: (B, K) flat indices (y * W + x).
    Returns: (B, K, C).
    Reference: _transpose_and_gather_feat (center_utils.py:245-249).
    """
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    return jnp.take_along_axis(flat, ind[..., None], axis=1)


def heatmap_maxpool_nms(heat, kernel=3):
    """Keep only local maxima (reference _nms, center_utils.py:251-257).

    heat: (B, H, W, C). Ties keep all equal-max cells, like torch.
    """
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (1, kernel, kernel, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    return jnp.where(hmax == heat, heat, 0.0)


def topk_heatmap(scores, k):
    """Per-class top-k then global top-k (reference _topk, center_utils.py:270-288).

    Args:
        scores: (B, H, W, C).
    Returns:
        (topk_score (B,K), topk_inds (B,K) flat y*W+x, topk_classes (B,K),
         topk_ys (B,K), topk_xs (B,K))
    """
    b, h, w, c = scores.shape
    flat = scores.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    cls_scores, cls_inds = jax.lax.top_k(flat, k)       # (B, C, K)
    glob_scores, glob_ind = jax.lax.top_k(cls_scores.reshape(b, c * k), k)
    topk_classes = (glob_ind // k).astype(jnp.float32)
    topk_inds = jnp.take_along_axis(cls_inds.reshape(b, c * k), glob_ind, axis=1)
    topk_ys = (topk_inds // w).astype(jnp.float32)
    topk_xs = (topk_inds % w).astype(jnp.float32)
    return glob_scores, topk_inds, topk_classes, topk_ys, topk_xs


def gaussian_radius(height, width, min_overlap=0.5):
    """CornerNet radius heuristic; jnp scalar math elementwise over arrays.

    Reference: center_utils.py:91-115 (min of the three roots).
    """
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.clip(b1 ** 2 - 4 * a1 * c1, min=0.0))
    r1 = (b1 - sq1) / (2 * a1)

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.clip(b2 ** 2 - 4 * a2 * c2, min=0.0))
    r2 = (b2 - sq2) / (2 * a2)

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.clip(b3 ** 2 - 4 * a3 * c3, min=0.0))
    r3 = (b3 + sq3) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_gaussians(map_hw, centers_int, radius, valid):
    """Max-splat per-object Gaussians onto one heat map.

    Args:
        map_hw: (H, W) float32 initial map (zeros).
        centers_int: (M, 2) int (x, y).
        radius: (M,) int-valued float radii.
        valid: (M,) bool.
    Returns: (H, W).

    Equivalent to looping draw_umich_gaussian (reference center_utils.py:132-148):
    value = exp(-(dx^2+dy^2) / (2 sigma^2)), sigma = (2r+1)/6, within the
    radius box; the reference's eps cutoff trims values < eps*max which are
    negligible for the max-combine.
    """
    h, w = map_hw.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def body(m, carry):
        cx = centers_int[m, 0].astype(jnp.float32)
        cy = centers_int[m, 1].astype(jnp.float32)
        r = radius[m]
        sigma = (2.0 * r + 1.0) / 6.0
        dx = xs - cx
        dy = ys - cy
        g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
        inside = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
        g = jnp.where(inside & valid[m], g, 0.0)
        return jnp.maximum(carry, g)

    return jax.lax.fori_loop(0, centers_int.shape[0], body, map_hw)


def fill_convex_quad(h, w, corners_xy, valid):
    """Rasterize convex quads: pixel (x, y) is fg if inside any valid quad.

    Device-side replacement for cv2.fillConvexPoly (reference
    center_utils.draw_seg_mask, :150-176). Inclusive edges.

    Args:
        corners_xy: (M, 4, 2) float corner pixel coords (consistent winding).
        valid: (M,) bool.
    Returns: (M, H, W) bool per-object masks.
    """
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    # signed area to normalize winding
    def signed_area(c):
        x, y = c[..., 0], c[..., 1]
        return 0.5 * jnp.sum(x * jnp.roll(y, -1, axis=-1)
                             - jnp.roll(x, -1, axis=-1) * y, axis=-1)

    sgn = jnp.sign(signed_area(corners_xy))[:, None, None]  # (M,1,1)
    inside = jnp.ones((corners_xy.shape[0], h, w), bool)
    for e in range(4):
        p1 = corners_xy[:, e]
        p2 = corners_xy[:, (e + 1) % 4]
        ex = (p2[:, 0] - p1[:, 0])[:, None, None]
        ey = (p2[:, 1] - p1[:, 1])[:, None, None]
        rx = xs[None] - p1[:, 0][:, None, None]
        ry = ys[None] - p1[:, 1][:, None, None]
        cross = ex * ry - ey * rx
        inside = inside & (cross * sgn >= -1e-6)
    return inside & valid[:, None, None]
