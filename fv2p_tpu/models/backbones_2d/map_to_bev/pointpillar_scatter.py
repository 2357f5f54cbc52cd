"""Scatter pillar features to the dense BEV canvas (reference
``map_to_bev/pointpillar_scatter.py``)."""
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class PointPillarScatter(nn.Module):
    model_cfg: Any
    grid_size: Tuple[int, int, int] = (432, 496, 1)

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        feats = batch_dict['pillar_features']       # (B, N, C)
        coords = batch_dict['voxel_coords']         # (B, N, 3) (z, y, x)
        valid = batch_dict['voxel_valid']
        b, n, c = feats.shape
        nx, ny = int(self.grid_size[0]), int(self.grid_size[1])

        flat = coords[..., 1] * nx + coords[..., 2]          # (B, N)
        flat = jnp.where(valid, flat, ny * nx)

        def scatter_one(f, idx):
            canvas = jnp.zeros((ny * nx + 1, c), f.dtype)
            return canvas.at[idx].set(f, mode='drop',
                                      unique_indices=True)[:ny * nx]

        canvas = jax.vmap(scatter_one)(feats, flat)          # (B, ny*nx, C)
        batch_dict['spatial_features'] = canvas.reshape(b, ny, nx, c)
        batch_dict['spatial_features_stride'] = 1
        return batch_dict
