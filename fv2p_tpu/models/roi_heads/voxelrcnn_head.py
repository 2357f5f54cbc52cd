"""Voxel R-CNN RoI head (reference ``pcdet/models/roi_heads/voxelrcnn_head.py``):
RoI-grid pooling directly from the sparse voxel pyramid via radius-limited
neighbor queries (the CUDA voxel-query hash walk becomes a radius query over
voxel centers — the same neighbor set, since the kernel also radius-limits
within its search window), PRE_MLP per source, shared FC + cls/reg heads."""
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import pointops
from ...utils import box_coder_utils, common_utils
from .iouguided_roi_head import _dense_grid_points, assign_targets, proposal_layer
from .pvrcnn_head import pvrcnn_head_loss

_BN = dict(momentum=0.99, epsilon=1e-3)

voxelrcnn_head_loss = pvrcnn_head_loss


class VoxelRCNNHead(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    point_cloud_range: Tuple[float, ...]
    voxel_size: Tuple[float, float, float]

    def _box_coder(self):
        return getattr(box_coder_utils, self.model_cfg.TARGET_CONFIG.BOX_CODER)()

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        cfg = self.model_cfg
        rois, roi_scores, roi_labels, roi_valid = proposal_layer(
            batch_dict['batch_box_preds'], batch_dict['batch_cls_preds'],
            cfg.NMS_CONFIG['TRAIN' if train else 'TEST'])
        batch_dict.update(rois=rois, roi_scores=roi_scores,
                          roi_labels=roi_labels, roi_valid=roi_valid)

        ret = {}
        if train:
            key = self.make_rng('sampling')
            targets = assign_targets(key, batch_dict, cfg.TARGET_CONFIG)
            batch_dict['rois'] = targets['rois']
            batch_dict['roi_labels'] = targets['roi_labels']
            ret.update(targets)

        batch_rois = batch_dict['rois']
        b, r = batch_rois.shape[0], batch_rois.shape[1]
        grid_size = int(cfg.ROI_GRID_POOL.GRID_SIZE)

        rois_flat = batch_rois.reshape(b * r, -1)
        local_grid = _dense_grid_points(rois_flat, grid_size)
        global_grid = common_utils.rotate_points_along_z(
            local_grid, rois_flat[:, 6]) + rois_flat[:, None, 0:3]
        global_grid = global_grid.reshape(b, r * local_grid.shape[1], 3)

        ms = batch_dict['multi_scale_3d_features']
        strides = batch_dict['multi_scale_3d_strides']
        pooled_list = []
        for src_name in cfg.ROI_GRID_POOL.FEATURES_SOURCE:
            st = ms[src_name]
            coords = st.coords()
            centers = common_utils.get_voxel_centers(
                coords[:, 1:4], strides[src_name], self.voxel_size,
                self.point_cloud_range)
            feats = st.features
            if cfg.ROI_GRID_POOL.get('PRE_MLP', False):
                feats = nn.Dense(feats.shape[-1], use_bias=False,
                                 name=f'pre_mlp_{src_name}')(feats)
                feats = nn.BatchNorm(use_running_average=not train, **_BN,
                                     name=f'pre_bn_{src_name}')(feats)
                feats = nn.relu(feats)
            b_idx = coords[:, 0]
            valid = st.valid_mask()
            src_xyz = jnp.broadcast_to(centers[None], (b,) + centers.shape)
            src_feats = jnp.broadcast_to(feats[None], (b,) + feats.shape)
            src_valid = valid[None] & (b_idx[None] == jnp.arange(b)[:, None])

            layer_cfg = cfg.ROI_GRID_POOL.POOL_LAYERS[src_name]
            for i, (rad, ns) in enumerate(zip(layer_cfg.POOL_RADIUS,
                                              layer_cfg.NSAMPLE)):
                gxyz, gfeat, _ = jax.vmap(
                    lambda q, x, v, f, rr=float(rad), nn_=int(ns):
                    pointops.ball_query_group(q, x, v, f, rr, nn_)
                )(global_grid, src_xyz, src_valid, src_feats)
                g = jnp.concatenate([gxyz, gfeat], axis=-1)
                for j, ch in enumerate(layer_cfg.MLPS[i]):
                    g = nn.Dense(ch, use_bias=False,
                                 name=f'{src_name}_mlp{i}_{j}')(g)
                    s = g.shape
                    g = nn.BatchNorm(use_running_average=not train, **_BN,
                                     name=f'{src_name}_bn{i}_{j}')(
                        g.reshape(-1, s[-1])).reshape(s)
                    g = nn.relu(g)
                pooled_list.append(jnp.max(g, axis=2))

        pooled = jnp.concatenate(pooled_list, axis=-1)
        x = pooled.reshape(b * r, -1)

        for k, ch in enumerate(cfg.SHARED_FC):
            x = nn.Dense(ch, use_bias=False, name=f'shared_fc{k}')(x)
            x = nn.BatchNorm(use_running_average=not train, **_BN,
                             name=f'shared_bn{k}')(x)
            x = nn.relu(x)
            if k != len(cfg.SHARED_FC) - 1 and float(cfg.DP_RATIO) > 0:
                x = nn.Dropout(float(cfg.DP_RATIO), deterministic=not train)(x)

        def head(xx, fc_list, out_ch, name, init_std=0.0):
            for k2, ch in enumerate(fc_list):
                xx = nn.Dense(ch, use_bias=False, name=f'{name}_fc{k2}')(xx)
                xx = nn.BatchNorm(use_running_average=not train, **_BN,
                                  name=f'{name}_bn{k2}')(xx)
                xx = nn.relu(xx)
                if k2 == 0 and float(cfg.DP_RATIO) > 0:
                    xx = nn.Dropout(float(cfg.DP_RATIO),
                                    deterministic=not train)(xx)
            init = nn.initializers.normal(init_std) if init_std > 0 \
                else nn.initializers.lecun_normal()
            return nn.Dense(out_ch, kernel_init=init, name=f'{name}_out')(xx)

        rcnn_cls = head(x, cfg.CLS_FC, self.num_class, 'cls')
        rcnn_reg = head(x, cfg.REG_FC,
                        self._box_coder().code_size * self.num_class, 'reg',
                        init_std=0.001)

        if train:
            ret['rcnn_cls'] = rcnn_cls
            ret['rcnn_reg'] = rcnn_reg
            ret['rois_sampled'] = batch_dict['rois']
            batch_dict['roi_head_ret'] = ret
        else:
            coder = self._box_coder()
            cls_preds = rcnn_cls.reshape(b, r, -1)
            box_preds = rcnn_reg.reshape(b, r, coder.code_size)
            local_rois = batch_rois.at[..., 0:3].set(0.0)
            decoded = coder.decode(box_preds, local_rois)
            flat = decoded.reshape(b * r, 1, -1)
            flat = common_utils.rotate_points_along_z(
                flat, batch_rois[..., 6].reshape(-1))
            decoded = flat.reshape(b, r, -1).at[..., 0:3].add(
                batch_rois[..., 0:3])
            batch_dict['batch_cls_preds'] = cls_preds
            batch_dict['batch_box_preds'] = decoded
            batch_dict['has_class_labels'] = True
            batch_dict['cls_preds_normalized'] = False
        return batch_dict
