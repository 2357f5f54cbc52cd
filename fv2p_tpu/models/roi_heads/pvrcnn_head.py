"""PV-RCNN RoI head (reference ``pcdet/models/roi_heads/pvrcnn_head.py`` +
``roi_head_template.py``): RoI-grid pooling of keypoint features via
multi-scale grouping at 6x6x6 global grid points, shared FC, cls/reg heads."""
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import pointops
from ...utils import box_coder_utils, box_utils, common_utils, loss_utils
from .iouguided_roi_head import (_dense_grid_points, assign_targets,
                                 proposal_layer)

_BN = dict(momentum=0.99, epsilon=1e-3)


class PVRCNNHead(nn.Module):
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

        # multi-scale grouping of KEYPOINT features around the grid points
        kp_xyz = batch_dict['point_coords']                 # (B, K, 3)
        kp_feats = batch_dict['point_features'] * \
            batch_dict['point_cls_scores'][..., None]       # score-weighted
        kp_valid = jnp.ones(kp_xyz.shape[:2], bool)

        sa_cfg = cfg.ROI_GRID_POOL
        outs = []
        for i, (rad, ns) in enumerate(zip(sa_cfg.POOL_RADIUS, sa_cfg.NSAMPLE)):
            gxyz, gfeat, _ = jax.vmap(
                lambda q, x, v, f, rr=rad, nn_=ns:
                pointops.ball_query_group(q, x, v, f, rr, nn_)
            )(global_grid, kp_xyz, kp_valid, kp_feats)
            g = jnp.concatenate([gxyz, gfeat], axis=-1)
            for j, ch in enumerate(sa_cfg.MLPS[i]):
                g = nn.Dense(ch, use_bias=False, name=f'pool_mlp{i}_{j}')(g)
                s = g.shape
                g = nn.BatchNorm(use_running_average=not train, **_BN,
                                 name=f'pool_bn{i}_{j}')(
                    g.reshape(-1, s[-1])).reshape(s)
                g = nn.relu(g)
            outs.append(jnp.max(g, axis=2))
        pooled = jnp.concatenate(outs, axis=-1)             # (B, R*G, C)
        pooled = pooled.reshape(b * r, grid_size ** 3, -1)

        # shared FC over flattened grid features (reference :96-126)
        x = pooled.reshape(b * r, -1)
        for k, ch in enumerate(cfg.SHARED_FC):
            x = nn.Dense(ch, use_bias=False, name=f'shared_fc{k}')(x)
            x = nn.BatchNorm(use_running_average=not train, **_BN,
                             name=f'shared_bn{k}')(x)
            x = nn.relu(x)
            if k != len(cfg.SHARED_FC) - 1 and float(cfg.DP_RATIO) > 0:
                x = nn.Dropout(float(cfg.DP_RATIO),
                               deterministic=not train)(x)

        def head(xx, fc_list, out_ch, name, init_std=0.0):
            for k, ch in enumerate(fc_list):
                xx = nn.Dense(ch, use_bias=False, name=f'{name}_fc{k}')(xx)
                xx = nn.BatchNorm(use_running_average=not train, **_BN,
                                  name=f'{name}_bn{k}')(xx)
                xx = nn.relu(xx)
                if k == 0 and float(cfg.DP_RATIO) > 0:
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
            decoded = flat.reshape(b, r, -1).at[..., 0:3].add(batch_rois[..., 0:3])
            batch_dict['batch_cls_preds'] = cls_preds
            batch_dict['batch_box_preds'] = decoded
            batch_dict['has_class_labels'] = True
            batch_dict['cls_preds_normalized'] = False
        return batch_dict


def pvrcnn_head_loss(model_cfg, ret):
    """rcnn cls + reg(+corner) losses (reference roi_head_template.py)."""
    cfg = model_cfg.LOSS_CONFIG
    lw = cfg.LOSS_WEIGHTS
    coder = getattr(box_coder_utils, model_cfg.TARGET_CONFIG.BOX_CODER)()
    code_size = coder.code_size
    tb = {}

    rcnn_cls = ret['rcnn_cls'].reshape(-1)
    labels = ret['rcnn_cls_labels'].reshape(-1)
    p = jnp.clip(jax.nn.sigmoid(rcnn_cls), 1e-7, 1 - 1e-7)
    bce = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    valid = (labels >= 0).astype(jnp.float32)
    loss_cls = jnp.sum(bce * valid) / jnp.clip(jnp.sum(valid), min=1.0)
    loss_cls = loss_cls * lw['rcnn_cls_weight']
    tb['rcnn_loss_cls'] = loss_cls

    fg_mask = ret['reg_valid_mask'].reshape(-1).astype(jnp.float32)
    fg_sum = jnp.clip(jnp.sum(fg_mask), min=1.0)
    gt_ct = ret['gt_of_rois'][..., :code_size].reshape(-1, code_size)
    rois = ret['rois_sampled'].reshape(-1, code_size)
    rois_anchor = rois.at[:, 0:3].set(0.0).at[:, 6].set(0.0)
    reg_targets = coder.encode(gt_ct, rois_anchor)
    rcnn_reg = ret['rcnn_reg'].reshape(-1, code_size)
    code_w = jnp.asarray(lw['code_weights'], jnp.float32)
    l1 = loss_utils.smooth_l1(rcnn_reg - reg_targets, beta=1.0 / 9.0) * code_w
    loss_reg = jnp.sum(l1 * fg_mask[:, None]) / fg_sum * lw['rcnn_reg_weight']
    tb['rcnn_loss_reg'] = loss_reg

    local_rois = rois.at[:, 0:3].set(0.0)
    decoded = coder.decode(rcnn_reg, local_rois)
    decoded = common_utils.rotate_points_along_z(
        decoded[:, None, :], rois[:, 6])[:, 0]
    decoded = decoded.at[:, 0:3].add(rois[:, 0:3])
    gt_src = ret['gt_of_rois_src'][..., :code_size].reshape(-1, code_size)
    pc = box_utils.boxes_to_corners_3d(decoded[:, :7])
    gc = box_utils.boxes_to_corners_3d(gt_src[:, :7])
    gcf = box_utils.boxes_to_corners_3d(gt_src.at[:, 6].add(np.pi)[:, :7])
    dist = jnp.minimum(jnp.linalg.norm(pc - gc, axis=2),
                       jnp.linalg.norm(pc - gcf, axis=2))
    corner = jnp.mean(loss_utils.smooth_l1(dist, beta=1.0), axis=1)
    loss_corner = jnp.sum(corner * fg_mask) / fg_sum * lw['rcnn_corner_weight']
    tb['rcnn_loss_corner'] = loss_corner

    rcnn_loss = loss_cls + loss_reg + loss_corner
    tb['rcnn_loss'] = rcnn_loss
    return rcnn_loss, tb
