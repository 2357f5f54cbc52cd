"""Pillar feature encoder (reference ``pcdet/models/backbones_3d/vfe/
pillar_vfe.py``): per-pillar PointNet over decorated points
(xyz + intensity + cluster-offset + center-offset), masked max-pool."""
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

_BN = dict(momentum=0.99, epsilon=1e-3)


class PFNLayer(nn.Module):
    out_channels: int
    use_norm: bool = True
    last_layer: bool = False

    @nn.compact
    def __call__(self, inputs, mask, *, train: bool):
        """inputs: (N, P, C); mask: (N, P)."""
        out_ch = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(out_ch, use_bias=not self.use_norm, name='linear')(inputs)
        if self.use_norm:
            s = x.shape
            x = nn.BatchNorm(use_running_average=not train, **_BN,
                             name='norm')(x.reshape(-1, s[-1])).reshape(s)
        x = nn.relu(x)
        x = jnp.where(mask[..., None], x, -1e9)
        x_max = jnp.max(x, axis=1, keepdims=True)
        if self.last_layer:
            return x_max[:, 0]
        x_repeat = jnp.broadcast_to(x_max, x.shape)
        return jnp.concatenate([jnp.where(mask[..., None], x, 0.0), x_repeat],
                               axis=-1)


class PillarVFE(nn.Module):
    model_cfg: Any
    num_point_features: int = 4
    voxel_size: Tuple[float, float, float] = (0.16, 0.16, 4)
    point_cloud_range: Tuple[float, ...] = (0, -39.68, -3, 69.12, 39.68, 1)

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        cfg = self.model_cfg
        voxels = batch_dict['voxels']               # (B, N, P, C)
        num_points = batch_dict['voxel_num_points']  # (B, N)
        coords = batch_dict['voxel_coords']         # (B, N, 3) (z, y, x)
        b, n, p, c = voxels.shape

        mask = (jnp.arange(p)[None, None, :]
                < num_points[..., None])            # (B, N, P)
        pts_sum = jnp.sum(voxels[..., :3], axis=2, keepdims=True)
        denom = jnp.clip(num_points, min=1.0)[..., None, None].astype(voxels.dtype)
        f_cluster = voxels[..., :3] - pts_sum / denom

        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x0, y0 = self.point_cloud_range[0], self.point_cloud_range[1]
        cx = coords[..., 2:3].astype(voxels.dtype) * vx + (vx / 2 + x0)
        cy = coords[..., 1:2].astype(voxels.dtype) * vy + (vy / 2 + y0)
        f_center = jnp.stack([
            voxels[..., 0] - cx, voxels[..., 1] - cy], axis=-1)

        feats = [voxels, f_cluster, f_center]
        if cfg.get('USE_ABSLOTE_XYZ', cfg.get('USE_ABSOLUTE_XYZ', True)) is False:
            feats[0] = voxels[..., 3:]
        if cfg.get('WITH_DISTANCE', False):
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = jnp.where(mask[..., None], x, 0.0)

        filters = list(cfg.NUM_FILTERS)
        x = x.reshape(b * n, p, -1)
        m = mask.reshape(b * n, p)
        for i, ch in enumerate(filters):
            x = PFNLayer(ch, cfg.get('USE_NORM', True),
                         last_layer=(i == len(filters) - 1),
                         name=f'pfn{i}')(x, m, train=train)
        batch_dict['pillar_features'] = x.reshape(b, n, -1)
        batch_dict['voxel_features'] = batch_dict['pillar_features']
        return batch_dict
