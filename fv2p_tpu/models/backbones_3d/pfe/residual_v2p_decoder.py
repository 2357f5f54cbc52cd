"""Residual voxel-to-point decoder (TPU-native re-design of reference
``pcdet/models/backbones_3d/pfe/residual_v2p_decoder.py``).

FPS-samples keypoints from the raw points, then decodes the sparse backbone's
multi-scale voxel features onto them: per level, voxel centers -> 3-NN
inverse-distance interpolation -> residual MLP block. The reference's
per-sample python loops (FPS :212-231, interpolation :105-115) become vmaps
with fixed shapes."""
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ....ops import pointops
from ....utils import common_utils
from ....utils.compile_tame import stage_barrier

_BN = dict(momentum=0.99, epsilon=1e-3)


class _ResMLPBlock(nn.Module):
    """net(interp) + downsample(identity) -> relu (reference
    LateralBottomResBlock :44-70, bottom_channels != -1)."""
    out_channels: int
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, residual, identity, *, train: bool):
        dt = self.compute_dtype
        x = nn.Dense(self.out_channels, use_bias=False, dtype=dt,
                     name='net0')(residual)
        x = nn.BatchNorm(use_running_average=not train, **_BN, name='net_bn0')(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_channels, use_bias=False, dtype=dt,
                     name='net1')(x)
        x = nn.BatchNorm(use_running_average=not train, **_BN, name='net_bn1')(x)
        idn = nn.Dense(self.out_channels, use_bias=False, dtype=dt,
                       name='down')(identity)
        idn = nn.BatchNorm(use_running_average=not train, **_BN, name='down_bn')(idn)
        return nn.relu(x + idn)


def _interpolate_level(st, downsample_times, voxel_size, pc_range, keypoints,
                       batch_size):
    """3-NN interpolate one sparse level's features onto keypoints.

    st: SparseTensor (flat, batch-mixed). keypoints: (B, K, 3).
    Returns: (B, K, C).
    """
    coords = st.coords()                         # (N, 4) b,z,y,x
    centers = common_utils.get_voxel_centers(
        coords[:, 1:4], downsample_times, voxel_size, pc_range)  # (N, 3)
    valid = st.valid_mask()

    if st.sample_cap > 0 and st.batch_size == batch_size:
        # host-rulebook layout: sample b's voxels are rows
        # [b*cap, (b+1)*cap) — restrict each sample's 3-NN scan to its own
        # block instead of masking the full batch-flat array (a batch_size x
        # FLOP cut; masked-out foreign rows are +inf distance either way, so
        # the selected neighbors and weights are identical)
        cap = st.sample_cap
        return jax.vmap(pointops.three_nn_interpolate)(
            centers.reshape(batch_size, cap, 3),
            valid.reshape(batch_size, cap),
            st.features.reshape(batch_size, cap, -1),
            keypoints)

    b_idx = coords[:, 0]

    def per_sample(bs, kp):
        v = valid & (b_idx == bs)
        return pointops.three_nn_interpolate(centers, v, st.features, kp)

    return jax.vmap(per_sample)(jnp.arange(batch_size), keypoints)


class ResidualVoxelToPointDecoder(nn.Module):
    model_cfg: Any
    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        cfg = self.model_cfg
        num_kp = int(cfg.NUM_KEYPOINTS)

        # -- keypoint sampling (reference get_sampled_points :196-234)
        assert cfg.POINT_SOURCE == 'raw_points'
        points = batch_dict['points']            # (B, P, 3+)
        points_valid = batch_dict['points_valid']

        kp_idx = pointops.farthest_point_sample_batch(
            points[..., :3], points_valid, num_kp)
        keypoints = jnp.take_along_axis(
            points[..., :3], kp_idx[..., None], axis=1)      # (B, K, 3)
        batch_size = keypoints.shape[0]

        ms = batch_dict['multi_scale_3d_features']
        strides = batch_dict['multi_scale_3d_strides']

        def interp(src_name):
            return _interpolate_level(
                ms[src_name], strides[src_name], self.voxel_size,
                self.point_cloud_range, keypoints, batch_size)

        # init block: interpolation only (bottom_channels == -1)
        feats = interp(cfg.INIT_BLOCK.SOURCE)

        for src_name in cfg.FEATURES_SOURCE:
            if src_name in ('bev', 'raw_points'):
                continue
            blk_cfg = cfg.DECODE_BLOCKS[src_name]
            lateral = interp(src_name)
            feats = _ResMLPBlock(int(blk_cfg.OUT_CHANNELS),
                                 self.compute_dtype,
                                 name=f'decode_{src_name}')(
                lateral.reshape(-1, lateral.shape[-1]),
                feats.reshape(-1, feats.shape[-1]), train=train)
            feats = feats.reshape(batch_size, num_kp, -1)

        # out block MLP
        out = nn.Dense(int(cfg.OUT_BLOCK.OUT_CHANNELS), use_bias=False,
                       dtype=self.compute_dtype,
                       name='out_fc')(feats.reshape(-1, feats.shape[-1]))
        out = nn.BatchNorm(use_running_average=not train, **_BN,
                           name='out_bn')(out)
        out = nn.relu(out)

        # fusion boundary (utils/compile_tame.py)
        batch_dict['point_features'] = stage_barrier(
            out.reshape(batch_size, num_kp, -1))
        batch_dict['point_coords'] = keypoints          # (B, K, 3)
        return batch_dict
