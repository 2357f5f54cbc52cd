"""PointRCNN RoI head (reference ``pcdet/models/roi_heads/pointrcnn_head.py``):
canonical RoI point pooling + xyz-up/merge + a 3-level SA encoder (FPS 128 ->
FPS 32 -> group-all) + cls/reg heads."""
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import pointops
from ...utils import box_coder_utils, common_utils
from .iouguided_roi_head import _MLP1x1, assign_targets, proposal_layer
from .pvrcnn_head import pvrcnn_head_loss

_BN = dict(momentum=0.99, epsilon=1e-3)


class PointRCNNHead(nn.Module):
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
        num_sampled = int(cfg.ROI_POINT_POOL.NUM_SAMPLED_POINTS)
        use_bn = bool(cfg.USE_BN)

        # canonical RoI point pooling (reference roipool3d_gpu)
        point_coords = batch_dict['point_coords']
        point_feats = batch_dict['point_features']
        point_scores = jax.lax.stop_gradient(batch_dict['point_cls_scores'])
        depth_norm = float(cfg.ROI_POINT_POOL.DEPTH_NORMALIZER)
        depths = jnp.linalg.norm(point_coords, axis=-1) / depth_norm - 0.5
        feats_all = jnp.concatenate(
            [point_scores[..., None], depths[..., None], point_feats], axis=-1)

        def pool_one(pts, f, roi_set):
            return pointops.roipoint_pool3d(
                pts, f, jnp.ones(pts.shape[0], bool), roi_set[:, :7],
                num_sampled, tuple(cfg.ROI_POINT_POOL.POOL_EXTRA_WIDTH))

        pooled, empty = jax.vmap(pool_one)(point_coords, feats_all, batch_rois)
        pooled = pooled.reshape(b * r, num_sampled, -1)
        empty = empty.reshape(b * r)
        rois_flat = batch_rois.reshape(b * r, -1)
        xyz = pooled[..., 0:3] - rois_flat[:, None, 0:3]
        xyz = common_utils.rotate_points_along_z(xyz, -rois_flat[:, 6])
        pooled = jnp.concatenate([xyz, pooled[..., 3:]], axis=-1)
        pooled = jnp.where(empty[:, None, None], 0.0, pooled)
        pooled = jax.lax.stop_gradient(pooled)

        n_prefix = 5
        xyz_feat = _MLP1x1(tuple(cfg.XYZ_UP_LAYER), use_bn,
                           name='xyz_up')(pooled[..., :n_prefix], train=train)
        merged = jnp.concatenate([xyz_feat, pooled[..., n_prefix:]], axis=-1)
        merged = _MLP1x1((int(cfg.XYZ_UP_LAYER[-1]),), use_bn,
                         name='merge_down')(merged, train=train)

        # SA encoder over the pooled canonical points
        sa = cfg.SA_CONFIG
        cur_xyz = pooled[..., 0:3]
        cur_valid = jnp.broadcast_to(~empty[:, None], cur_xyz.shape[:2])
        cur_feats = merged
        for k in range(len(sa.NPOINTS)):
            npoint = int(sa.NPOINTS[k])
            if npoint > 0:
                idx = pointops.farthest_point_sample_batch(
                    cur_xyz, cur_valid, npoint)
                new_xyz = jnp.take_along_axis(cur_xyz, idx[..., None], axis=1)
                new_valid = jnp.take_along_axis(cur_valid, idx, axis=1)
                gxyz, gfeat, _ = jax.vmap(
                    lambda q, x, v, f, rr=float(sa.RADIUS[k]),
                    ns=int(sa.NSAMPLE[k]):
                    pointops.ball_query_group(q, x, v, f, rr, ns)
                )(new_xyz, cur_xyz, cur_valid, cur_feats)
                g = jnp.concatenate([gxyz, gfeat], axis=-1)
                g = _MLP1x1(tuple(sa.MLPS[k]), use_bn,
                            name=f'sa{k}')(g, train=train)
                cur_feats = jnp.max(g, axis=2)
                cur_xyz, cur_valid = new_xyz, new_valid
            else:
                # group-all: one center at origin over all remaining points
                g = jnp.concatenate([cur_xyz, cur_feats], axis=-1)[:, None]
                g = _MLP1x1(tuple(sa.MLPS[k]), use_bn,
                            name=f'sa{k}')(g, train=train)
                g = jnp.where(cur_valid[:, None, :, None], g, -1e9)
                cur_feats = jnp.max(g, axis=2)        # (BR, 1, C)
                cur_xyz = jnp.zeros((b * r, 1, 3), cur_xyz.dtype)
                cur_valid = jnp.ones((b * r, 1), bool)

        shared = cur_feats[:, 0]                      # (BR, C)
        shared = jnp.where(empty[:, None], 0.0, shared)

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

        rcnn_cls = head(shared, cfg.CLS_FC, self.num_class, 'cls')
        rcnn_reg = head(shared, cfg.REG_FC,
                        self._box_coder().code_size * self.num_class, 'reg',
                        init_std=0.001)

        if train:
            ret['rcnn_cls'] = rcnn_cls
            ret['rcnn_reg'] = rcnn_reg
            ret['rois_sampled'] = batch_dict['rois']
            if cfg.TARGET_CONFIG.get('CLS_SCORE_TYPE', 'cls') == 'rcnn_iou':
                # PointRCNNIoUHead path (reference pointrcnniou_head.py
                # :176-243): decode the predicted refinements (no grad),
                # compute class-matched 3D IoU vs gt, convert to soft
                # interval labels replacing the sampled cls labels.
                from ...utils import iou3d
                coder = self._box_coder()
                reg = jax.lax.stop_gradient(rcnn_reg).reshape(
                    b, r, coder.code_size)
                local_rois = batch_rois.at[..., 0:3].set(0.0)
                dec = coder.decode(reg, local_rois)
                flat = dec.reshape(b * r, 1, -1)
                flat = common_utils.rotate_points_along_z(
                    flat, batch_rois[..., 6].reshape(-1))
                dec = flat.reshape(b, r, -1).at[..., 0:3].add(
                    batch_rois[..., 0:3])
                gt = batch_dict['gt_boxes']

                def one(boxes, labels, g):
                    gt_b, gt_l = g[:, :7], g[:, 7].astype(jnp.int32)
                    ious = iou3d.boxes_iou3d(boxes, gt_b)
                    same = ((labels[:, None] == gt_l[None, :])
                            & (gt_l > 0)[None, :])
                    return jnp.max(jnp.where(same, ious, 0.0), axis=1)

                rcnn_ious = jax.vmap(one)(
                    dec[..., :7], batch_dict['roi_labels'], gt)
                fg_t = float(cfg.TARGET_CONFIG.CLS_FG_THRESH)
                bg_t = float(cfg.TARGET_CONFIG.CLS_BG_THRESH)
                soft = (rcnn_ious - bg_t) / (fg_t - bg_t)
                ret['rcnn_cls_labels'] = jnp.clip(soft, 0.0, 1.0)
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


pointrcnn_head_loss = pvrcnn_head_loss  # same rcnn cls/reg/corner structure
