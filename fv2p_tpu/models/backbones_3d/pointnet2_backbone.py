"""PointNet++ MSG backbone for PointRCNN (reference
``pcdet/models/backbones_3d/pointnet2_backbone.py``): SA hierarchy with FPS
downsampling + feature propagation back to full resolution."""
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pointops

_BN = dict(momentum=0.99, epsilon=1e-3)


class _MSGLevel(nn.Module):
    """One SA level: FPS centers + multi-scale grouping + MLPs + maxpool."""
    npoint: int
    radii: Tuple[float, ...]
    nsamples: Tuple[int, ...]
    mlps: Tuple[Tuple[int, ...], ...]

    @nn.compact
    def __call__(self, xyz, valid, feats, *, train: bool):
        """xyz (B, N, 3), valid (B, N), feats (B, N, C) or None.
        Returns new_xyz (B, npoint, 3), new_valid, new_feats."""
        idx = pointops.farthest_point_sample_batch(
            xyz, valid, self.npoint)                     # (B, npoint)
        new_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)
        new_valid = jnp.take_along_axis(valid, idx, axis=1)

        src_feats = feats if feats is not None else jnp.zeros(
            xyz.shape[:2] + (0,), xyz.dtype)
        outs = []
        for i, (r, ns) in enumerate(zip(self.radii, self.nsamples)):
            gxyz, gfeat, _ = jax.vmap(
                lambda q, x, v, f, rr=r, nn_=ns:
                pointops.ball_query_group(q, x, v, f, rr, nn_)
            )(new_xyz, xyz, valid, src_feats)
            g = jnp.concatenate([gxyz, gfeat], axis=-1)
            for j, ch in enumerate(self.mlps[i]):
                g = nn.Dense(ch, use_bias=False, name=f'mlp{i}_{j}')(g)
                s = g.shape
                g = nn.BatchNorm(use_running_average=not train, **_BN,
                                 name=f'bn{i}_{j}')(g.reshape(-1, s[-1])).reshape(s)
                g = nn.relu(g)
            outs.append(jnp.max(g, axis=2))
        return new_xyz, new_valid, jnp.concatenate(outs, axis=-1)


class _FPLevel(nn.Module):
    """Feature propagation: 3-NN interpolate deep features onto shallow
    points, concat skip features, MLP."""
    mlp: Tuple[int, ...]

    @nn.compact
    def __call__(self, xyz, valid, skip_feats, deep_xyz, deep_valid,
                 deep_feats, *, train: bool):
        interp = jax.vmap(
            lambda sx, sv, sf, q: pointops.three_nn_interpolate(sx, sv, sf, q)
        )(deep_xyz, deep_valid, deep_feats, xyz)
        x = interp if skip_feats is None else jnp.concatenate(
            [skip_feats, interp], axis=-1)
        for j, ch in enumerate(self.mlp):
            x = nn.Dense(ch, use_bias=False, name=f'fp{j}')(x)
            s = x.shape
            x = nn.BatchNorm(use_running_average=not train, **_BN,
                             name=f'fp_bn{j}')(x.reshape(-1, s[-1])).reshape(s)
            x = nn.relu(x)
        return x


class PointNet2MSG(nn.Module):
    model_cfg: Any
    input_channels: int = 4

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        cfg = self.model_cfg
        points = batch_dict['points']               # (B, P, 3 + C)
        valid = batch_dict['points_valid']
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        l_xyz, l_valid, l_feats = [xyz], [valid], [feats]
        sa = cfg.SA_CONFIG
        for i in range(len(sa.NPOINTS)):
            nx, nv, nf = _MSGLevel(
                int(sa.NPOINTS[i]), tuple(sa.RADIUS[i]), tuple(sa.NSAMPLE[i]),
                tuple(tuple(m) for m in sa.MLPS[i]), name=f'sa{i}')(
                l_xyz[-1], l_valid[-1], l_feats[-1], train=train)
            l_xyz.append(nx)
            l_valid.append(nv)
            l_feats.append(nf)

        fp_mlps = list(cfg.FP_MLPS)
        for i in range(len(fp_mlps) - 1, -1, -1):
            l_feats[i] = _FPLevel(tuple(fp_mlps[i]), name=f'fp{i}')(
                l_xyz[i], l_valid[i], l_feats[i], l_xyz[i + 1], l_valid[i + 1],
                l_feats[i + 1], train=train)

        batch_dict['point_features'] = l_feats[0]   # (B, P, C)
        batch_dict['point_coords'] = l_xyz[0]
        return batch_dict
