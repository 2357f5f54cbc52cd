"""RoI-aware 3D grid pooling (reference ``pcdet/ops/roiaware_pool3d``).

The CUDA implementation (``roiaware_pool3d_kernel.cu:39-236``) rasterizes each
RoI into an S^3 grid, collects up to ``max_pts_each_voxel`` points per cell,
then max/avg-pools them. TPU re-design: one fused pass — every (roi, point)
pair computes its target cell id (or a dropped sentinel when the point is
outside the box) and a single full-row ``scatter-max`` / ``scatter-add``
builds all R*S^3 cells at once. Row-wise TPU scatters vectorize (unlike
narrow/sliced ones), so there is no per-cell point cap and no atomics.

Output layout matches the reference: (R, S_x, S_y, S_z, C); empty cells are
exactly zero for both pool methods.
"""
import jax
import jax.numpy as jnp

_NEG = -1e10


def roiaware_pool3d(points, point_feats, point_valid, rois, pool_size,
                    method='max'):
    """Pool per-point features into each RoI's local S^3 grid.

    Args:
        points: (N, 3) xyz.
        point_feats: (N, C).
        point_valid: (N,) bool.
        rois: (R, 7) [x, y, z, dx, dy, dz, heading] (z = box center).
        pool_size: S (static int).
        method: 'max' | 'avg'.
    Returns: (R, S, S, S, C) float32 — grid axes ordered (x, y, z).
    """
    s = int(pool_size)
    r = rois.shape[0]
    n, c = point_feats.shape

    center = rois[:, None, 0:3]                       # (R, 1, 3)
    dims = rois[:, None, 3:6]
    yaw = rois[:, 6]
    shifted = points[None, :, :] - center             # (R, N, 3)
    cos, sin = jnp.cos(-yaw)[:, None], jnp.sin(-yaw)[:, None]
    lx = shifted[..., 0] * cos - shifted[..., 1] * sin
    ly = shifted[..., 0] * sin + shifted[..., 1] * cos
    lz = shifted[..., 2]
    local = jnp.stack([lx, ly, lz], axis=-1)          # (R, N, 3)

    half = dims / 2.0
    inside = jnp.all(jnp.abs(local) <= half + 1e-5, axis=-1)  # (R, N)
    inside = inside & point_valid[None, :] & (rois[:, None, 3] > 0)

    cell = jnp.floor((local + half) / (dims / s)).astype(jnp.int32)
    cell = jnp.clip(cell, 0, s - 1)
    flat = ((jnp.arange(r, dtype=jnp.int32)[:, None] * s + cell[..., 0]) * s
            + cell[..., 1]) * s + cell[..., 2]        # (R, N)
    flat = jnp.where(inside, flat, r * s * s * s)     # sentinel -> dropped

    flat = flat.reshape(r * n)
    upd = jnp.broadcast_to(point_feats[None], (r, n, c)).reshape(r * n, c)
    upd = upd.astype(jnp.float32)

    if method == 'max':
        grid = jnp.full((r * s * s * s + 1, c), _NEG, jnp.float32)
        grid = grid.at[flat].max(upd, mode='drop')
        grid = jnp.where(grid <= _NEG / 2, 0.0, grid)
    elif method == 'avg':
        grid = jnp.zeros((r * s * s * s + 1, c), jnp.float32)
        grid = grid.at[flat].add(upd, mode='drop')
        cnt = jnp.zeros((r * s * s * s + 1, 1), jnp.float32)
        cnt = cnt.at[flat].add(jnp.ones((r * n, 1), jnp.float32), mode='drop')
        grid = grid / jnp.maximum(cnt, 1.0)
    else:
        raise NotImplementedError(method)
    return grid[:-1].reshape(r, s, s, s, c)


def roiaware_pool3d_batch(points, point_feats, point_valid, rois, pool_size,
                          method='max'):
    """Batched variant: leading B axis on every arg; sequential over B
    (lax.map) to bound the (R*N, C) scatter transient to one sample."""
    def one(args):
        p, f, v, rr = args
        return roiaware_pool3d(p, f, v, rr, pool_size, method)

    return jax.lax.map(one, (points, point_feats, point_valid, rois))
