"""Voxel Set Abstraction for PV-RCNN (reference
``pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py``): FPS keypoints,
then multi-scale grouping around them from raw points, the sparse voxel
pyramid levels, and the BEV map; fused through a linear+BN+ReLU."""
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....ops import pointops
from ....utils import common_utils

_BN = dict(momentum=0.99, epsilon=1e-3)


class _StackSAModuleMSG(nn.Module):
    """Multi-scale grouping around query points from a per-sample masked
    point set (reference StackSAModuleMSG), vmapped over the batch."""
    radii: Tuple[float, ...]
    nsamples: Tuple[int, ...]
    mlps: Tuple[Tuple[int, ...], ...]
    use_xyz: bool = True

    @nn.compact
    def __call__(self, query_xyz, src_xyz, src_valid, src_feats, *, train: bool):
        """query_xyz (B, M, 3); src_xyz (B, N, 3); src_valid (B, N);
        src_feats (B, N, C) -> (B, M, sum(mlp[-1]))."""
        outs = []
        for i, (r, ns) in enumerate(zip(self.radii, self.nsamples)):
            gxyz, gfeat, any_n = jax.vmap(
                lambda q, x, v, f: pointops.ball_query_group(q, x, v, f, r, ns)
            )(query_xyz, src_xyz, src_valid, src_feats)
            g = jnp.concatenate([gxyz, gfeat], axis=-1) if self.use_xyz else gfeat
            for j, ch in enumerate(self.mlps[i]):
                g = nn.Dense(ch, use_bias=False, name=f'mlp{i}_{j}')(g)
                s = g.shape
                g = nn.BatchNorm(use_running_average=not train, **_BN,
                                 name=f'bn{i}_{j}')(g.reshape(-1, s[-1])).reshape(s)
                g = nn.relu(g)
            outs.append(jnp.max(g, axis=2))       # (B, M, C)
        return jnp.concatenate(outs, axis=-1)


class VoxelSetAbstraction(nn.Module):
    model_cfg: Any
    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]
    num_bev_features: int = 256
    num_rawpoint_features: int = 4

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        cfg = self.model_cfg
        num_kp = int(cfg.NUM_KEYPOINTS)
        points = batch_dict['points']
        points_valid = batch_dict['points_valid']
        batch_size = points.shape[0]

        kp_idx = pointops.farthest_point_sample_batch(
            points[..., :3], points_valid, num_kp)
        keypoints = jnp.take_along_axis(
            points[..., :3], kp_idx[..., None], axis=1)        # (B, K, 3)

        feats_list = []
        if 'bev' in cfg.FEATURES_SOURCE:
            bev = batch_dict['spatial_features']
            stride = batch_dict['spatial_features_stride']
            vx, vy = self.voxel_size[0], self.voxel_size[1]
            x0, y0 = self.point_cloud_range[0], self.point_cloud_range[1]
            xi = (keypoints[..., 0] - x0) / vx / stride
            yi = (keypoints[..., 1] - y0) / vy / stride
            feats_list.append(jax.vmap(pointops.bilinear_interpolate_bev)(
                bev, xi, yi))

        if 'raw_points' in cfg.FEATURES_SOURCE:
            sa_cfg = cfg.SA_LAYER['raw_points']
            feats_list.append(_StackSAModuleMSG(
                tuple(sa_cfg.POOL_RADIUS), tuple(sa_cfg.NSAMPLE),
                tuple(tuple(m) for m in sa_cfg.MLPS), name='sa_rawpoints')(
                keypoints, points[..., :3], points_valid,
                points[..., 3:], train=train))

        ms = batch_dict.get('multi_scale_3d_features', {})
        strides = batch_dict.get('multi_scale_3d_strides', {})
        for src_name in cfg.FEATURES_SOURCE:
            if src_name in ('bev', 'raw_points'):
                continue
            st = ms[src_name]
            coords = st.coords()
            centers = common_utils.get_voxel_centers(
                coords[:, 1:4], strides[src_name], self.voxel_size,
                self.point_cloud_range)
            b_idx = coords[:, 0]
            valid = st.valid_mask()
            src_xyz = jnp.broadcast_to(centers[None], (batch_size,) + centers.shape)
            src_feats = jnp.broadcast_to(
                st.features[None], (batch_size,) + st.features.shape)
            src_valid = valid[None] & (b_idx[None] == jnp.arange(batch_size)[:, None])
            sa_cfg = cfg.SA_LAYER[src_name]
            feats_list.append(_StackSAModuleMSG(
                tuple(sa_cfg.POOL_RADIUS), tuple(sa_cfg.NSAMPLE),
                tuple(tuple(m) for m in sa_cfg.MLPS), name=f'sa_{src_name}')(
                keypoints, src_xyz, src_valid, src_feats, train=train))

        before_fusion = jnp.concatenate(feats_list, axis=-1)   # (B, K, C_in)
        x = nn.Dense(int(cfg.NUM_OUTPUT_FEATURES), use_bias=False,
                     name='fusion_fc')(before_fusion)
        s = x.shape
        x = nn.BatchNorm(use_running_average=not train, **_BN,
                         name='fusion_bn')(x.reshape(-1, s[-1])).reshape(s)
        x = nn.relu(x)

        batch_dict['point_features_before_fusion'] = before_fusion
        batch_dict['point_features'] = x
        batch_dict['point_coords'] = keypoints
        return batch_dict
