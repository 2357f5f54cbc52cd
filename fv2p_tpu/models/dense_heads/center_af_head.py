"""Center-based anchor-free head with mask-guided attention (MGAF-3DSSD).

TPU-native re-design of reference ``center_af_head_single.py`` +
``center_af_head_template.py``: NHWC conv stacks, decode via jnp top-k, and
all losses as masked reductions so the whole head (including online-IoU
iouscore targets) runs inside one jit."""
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.dcn import FeatureAdaption
from ...utils.compile_tame import stage_barrier
from ...utils import box_utils, center_utils, iou3d, loss_utils
from .center_target_assigner import CenterTargetAssigner

_BN = dict(momentum=0.99, epsilon=1e-3)


class _FCHead(nn.Module):
    """conv3x3 -> BN -> ReLU -> conv1x1(bias=init_bias)
    (reference make_fc_head, center_af_head_template.py:54-111)."""
    head_conv: int
    out_channel: int
    final_kernel: int = 1
    init_bias: float = 0.0
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype or x.dtype
        x = nn.Conv(self.head_conv, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=dt)(x)
        x = nn.BatchNorm(use_running_average=not train, **_BN)(x)
        x = nn.relu(x)
        fk = self.final_kernel
        pad = (fk - 1) // 2
        x = nn.Conv(self.out_channel, (fk, fk), padding=((pad, pad), (pad, pad)),
                    bias_init=nn.initializers.constant(self.init_bias), dtype=dt)(x)
        return x.astype(jnp.float32)


class CenterAFHeadSingle(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: Sequence[str]
    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]
    predict_boxes_when_training: bool = True
    compute_dtype: Any = None

    def _assigner(self):
        return CenterTargetAssigner(self.model_cfg, self.class_names,
                                    self.voxel_size, self.point_cloud_range)

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        cfg = self.model_cfg
        stride = int(cfg.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE)
        x = batch_dict['spatial_features_2d']
        dt = self.compute_dtype or x.dtype

        # shared conv (center_af_head_single.py:20-34)
        for i, ch in enumerate(cfg.SHARED_FC):
            ks = int(cfg.SHARED_KS[i])
            pad = (ks - 1) // 2
            x = nn.Conv(ch, (ks, ks), padding=((pad, pad), (pad, pad)),
                        use_bias=False, dtype=dt, name=f'shared_conv{i}')(x)
            # torch-default eps here (reference center_af_head_single.py:25
            # uses bare nn.BatchNorm2d, eps=1e-5), unlike the heads' mod_bn
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-5, name=f'shared_bn{i}')(x)
            x = nn.relu(x)

        # ADFA second half: MDCN feature adaptation (:44-49, 79-80)
        if cfg.get('USE_DCN', False) in ('DCN', 'MDCN'):
            x = FeatureAdaption(x.shape[-1], 3, deformable_groups=4,
                                compute_dtype=self.compute_dtype,
                                name='feature_adapt')(x)

        head_cfgs = {h['name']: h for h in cfg.HEADS_CONFIG}
        ret = {}

        # mask-guided attention (:82-93)
        segm_cfg = head_cfgs['segm']
        segm_pred = _FCHead(segm_cfg['head_conv'], segm_cfg['out_channel'],
                            segm_cfg['final_kernel'],
                            init_bias=float(-np.log(99.0)),  # -4.595
                            compute_dtype=self.compute_dtype,
                            name='segm')(x, train=train)
        ret['segm_pred'] = segm_pred
        att = x + jax.nn.sigmoid(jax.lax.stop_gradient(segm_pred)) * x
        # fusion boundary between the attention trunk and the head convs
        # (utils/compile_tame.py)
        att = stage_barrier(att)
        batch_dict['spatial_features_before_head'] = att

        # all non-segm heads fused into ONE wide 3x3 conv + per-head slices:
        # mathematically identical to per-head convs (BN is per-channel),
        # but a single large matmul uses the MXU far better than 6 small ones.
        other = [(n, h) for n, h in head_cfgs.items() if n != 'segm']
        widths = [int(h['head_conv']) for _, h in other]
        mid = nn.Conv(sum(widths), (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=dt, name='heads_fused_conv')(att)
        mid = nn.BatchNorm(use_running_average=not train, **_BN,
                           name='heads_fused_bn')(mid)
        mid = nn.relu(mid)
        offset = 0
        for (name, h), width in zip(other, widths):
            out_ch = self.num_class if name == 'hm' else h['out_channel']
            init_bias = -2.19 if name == 'hm' else 0.0
            fk = int(h['final_kernel'])
            pad = (fk - 1) // 2
            sl = mid[..., offset:offset + width]
            pred = nn.Conv(
                out_ch, (fk, fk), padding=((pad, pad), (pad, pad)),
                bias_init=nn.initializers.constant(init_bias), dtype=dt,
                name=f'{name}_out')(sl).astype(jnp.float32)
            ret[f'{name}_pred'] = stage_barrier(pred)
            offset += width

        if train:
            targets = self._assigner().assign_targets(batch_dict['gt_boxes'])
            ret.update(targets)
            if self.predict_boxes_when_training:
                ret.update(self.decode_predhm_ssd(
                    ret, k=int(cfg.NUM_IOUSCORE_TRAINING_SAMPLES), stride=stride))
                ret.update(self.decode_gthm(ret, stride=stride))
        else:
            dec = self.decode_predhm_ssd(
                ret, k=int(cfg.NUM_INFERENCE_SAMPLES), stride=stride)
            batch_dict.update(dec)
            batch_dict['cls_preds_normalized'] = False

        batch_dict['head_ret'] = ret
        return batch_dict

    # ------------------------------------------------------------------
    # decoding (center_af_head_template.py:464-598)
    # ------------------------------------------------------------------

    def _decode_common(self, ret, inds, xs, ys, stride):
        b, k = inds.shape
        offset = center_utils.gather_feat_nhwc(ret['offset_pred'], inds)
        xs = xs[..., None] + offset[:, :, 0:1]
        ys = ys[..., None] + offset[:, :, 1:2]
        height = center_utils.gather_feat_nhwc(ret['height_pred'], inds)
        dim = center_utils.gather_feat_nhwc(ret['dim_pred'], inds)
        rot_feat = center_utils.gather_feat_nhwc(ret['rot_pred'], inds)
        num_bins = rot_feat.shape[-1] // 2
        rot = box_utils.decode_rot_binres(
            rot_feat.reshape(b * k, -1), num_head_bin=num_bins).reshape(b, k, 1)
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x0, y0 = self.point_cloud_range[0], self.point_cloud_range[1]
        xs = xs * stride * vx + x0
        ys = ys * stride * vy + y0
        return jnp.concatenate([xs, ys, height, dim, rot], axis=2)

    def decode_predhm_ssd(self, ret, k, stride):
        """Max-pool NMS + top-k decode (reference :518-598). Returns
        batch_box_preds (B,K,7), batch_cls_preds (B,K,C) raw suppressed heat
        logits, batch_iouscore_preds (B,K,1)."""
        heat = center_utils.heatmap_maxpool_nms(ret['hm_pred'])
        scores, inds, clses, ys, xs = center_utils.topk_heatmap(heat, k)
        boxes = self._decode_common(ret, inds, xs, ys, stride)
        classes = center_utils.gather_feat_nhwc(heat, inds)
        iouscore = center_utils.gather_feat_nhwc(ret['iouscore_pred'], inds)
        return {
            'batch_box_preds': boxes,
            'batch_cls_preds': classes,
            'batch_iouscore_preds': iouscore,
        }

    def decode_gthm(self, ret, stride):
        """Decode at gt center indices for the corner loss (reference :464-516)."""
        inds = ret['ind_target']
        xs = ret['xsys_target'][:, :, 0]
        ys = ret['xsys_target'][:, :, 1]
        boxes = self._decode_common(ret, inds, xs, ys, stride)
        return {'gthm_box_preds': boxes}


def center_af_head_loss(model_cfg, ret):
    """All 8 MGAF head loss terms as a pure function of the forward outputs
    (reference center_af_head_template.py:193-429). Returns (rpn_loss, tb)."""
    cfg = model_cfg.LOSS_CONFIG
    tb = {}

    hm_loss = loss_utils.centernet_focal_loss(
        ret['hm_pred'], ret['hm_target']) * cfg.HM_LOSS_CONFIG['weight']
    tb['rpn_hm_loss'] = hm_loss

    mask, ind = ret['mask_target'], ret['ind_target']
    anno = ret['anno_box_target']
    offset_loss = loss_utils.centernet_res_loss(
        ret['offset_pred'], mask, ind, anno[:, :, 0:2],
        cfg.OFFSET_LOSS_CONFIG.get('res_func', 'l1')) * cfg.OFFSET_LOSS_CONFIG['weight']
    tb['rpn_offset_loss'] = offset_loss
    height_loss = loss_utils.centernet_res_loss(
        ret['height_pred'], mask, ind, anno[:, :, 2:3],
        cfg.HEIGHT_LOSS_CONFIG.get('res_func', 'l1')) * cfg.HEIGHT_LOSS_CONFIG['weight']
    tb['rpn_height_loss'] = height_loss
    dim_loss = loss_utils.centernet_res_loss(
        ret['dim_pred'], mask, ind, anno[:, :, 3:6],
        cfg.DIM_LOSS_CONFIG.get('res_func', 'l1')) * cfg.DIM_LOSS_CONFIG['weight']
    tb['rpn_dim_loss'] = dim_loss

    rot_pred = center_utils.gather_feat_nhwc(ret['rot_pred'], ind)
    rot_loss = loss_utils.rot_binres_loss(
        rot_pred, anno[:, :, 6], mask,
        num_head_bin=int(cfg.ROT_LOSS_CONFIG['num_bins'])) * cfg.ROT_LOSS_CONFIG['weight']
    tb['rpn_rot_loss'] = rot_loss

    segm_loss = _segm_loss(ret) * cfg.SEGM_LOSS_CONFIG['weight']
    tb['rpn_segm_loss'] = segm_loss

    corner_loss = _corner_loss(ret) * cfg.CORNER_LOSS_CONFIG['weight'] / 3.0
    tb['rpn_corner_loss'] = corner_loss

    iouscore_loss = _iouscore_loss(ret, cfg.IOUSCORE_LOSS_CONFIG) \
        * cfg.IOUSCORE_LOSS_CONFIG['weight']
    tb['rpn_iouscore_loss'] = iouscore_loss

    rpn_loss = (hm_loss + offset_loss + height_loss + dim_loss + rot_loss
                + segm_loss + corner_loss + iouscore_loss)
    tb['rpn_loss'] = rpn_loss
    return rpn_loss, tb


def _segm_loss(ret):
    """Focal seg loss, positives-normalized (reference :314-342)."""
    pred = ret['segm_pred']
    target = ret['segm_target']
    b = pred.shape[0]
    pred_flat = pred.reshape(b, -1, pred.shape[-1])
    target_flat = target.reshape(b, -1, target.shape[-1])
    positives = target_flat > 0
    cls_weights = (positives | (target_flat == 0)).astype(jnp.float32)
    pos_norm = jnp.clip(jnp.sum(positives.astype(jnp.float32), axis=1,
                                keepdims=True), min=1.0)
    cls_weights = cls_weights / pos_norm
    loss = loss_utils.sigmoid_focal_loss(
        pred_flat, target_flat.astype(jnp.float32), cls_weights[..., 0])
    return jnp.sum(loss) / b


def _corner_loss(ret):
    pred = ret['gthm_box_preds'].reshape(-1, 7)
    target = ret['src_box_target'].reshape(-1, 7)
    mask = ret['mask_target'].reshape(-1)
    return loss_utils.corner_loss_mse(pred, target, mask)


def _iouscore_loss(ret, cfg):
    """Online 3D-IoU targets for the iouscore head (reference :367-429)."""
    box_pred = jax.lax.stop_gradient(ret['batch_box_preds'])  # (B, K, 7)
    cls_pred = jnp.argmax(ret['batch_cls_preds'], axis=-1) + 1  # (B, K)
    gt = ret['batch_gtboxes_src']  # (B, M, 8)
    gt_boxes = gt[..., 0:7]
    gt_cls = gt[..., 7].astype(jnp.int32)
    gt_valid = jnp.sum(jnp.abs(gt_boxes), axis=-1) > 0

    def per_sample(bp, bc, gb, gc, gv):
        ious = iou3d.boxes_iou3d(bp, gb)  # (K, M)
        same = (bc[:, None] == gc[None, :]) & gv[None, :]
        ious = jnp.where(same, ious, 0.0)
        return jnp.max(ious, axis=1)

    roi_iou = jax.vmap(per_sample)(box_pred, cls_pred, gt_boxes, gt_cls,
                                   gt_valid)  # (B, K)
    iou_pred = ret['batch_iouscore_preds'][..., 0]
    valid = jnp.ones_like(roi_iou, bool)
    return loss_utils.iouscore_loss_bce(
        iou_pred.reshape(-1), roi_iou.reshape(-1), valid.reshape(-1),
        iou_fg_thresh=float(cfg['iou_fg_thresh']),
        iou_bg_thresh=float(cfg['iou_bg_thresh']))
