"""Multi-group anchor head for nuScenes CBGS (reference
``pcdet/models/dense_heads/anchor_head_multi.py``: ``SingleHead`` :9-149 +
``AnchorHeadMulti`` :151-373).

TPU re-design notes:
  * Anchors are generated in the reference's USE_MULTIHEAD order — per class
    (A, ny, nx) anchor-major (template's ``permute(3,4,0,1,2)`` flatten) —
    so each head's (B, A_h*H*W, code) predictions concatenate into global
    anchor order with zero gathers.
  * SEPARATE_MULTIHEAD class logits are packed into ONE dense
    (B, N, num_class) tensor with -1e9 logits for classes outside an
    anchor's head: sigmoid gives exact 0 there, so downstream multi-class
    NMS and the focal loss run as single fused ops instead of ragged
    per-head loops (the reference iterates heads in Python).
"""
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils import box_coder_utils, common_utils, loss_utils
from .anchor_head import assign_targets_single

_BN = dict(momentum=0.99, epsilon=1e-3)


def generate_anchors_multihead(anchor_generator_cfg, grid_size,
                               point_cloud_range):
    """Flat anchors in multihead order: per class block of (A_c, ny, nx, 7)
    (reference anchor_head_template get_anchors USE_MULTIHEAD permute).

    Returns (anchors_flat (N, 7), anchor_cls (N,), matched_t (N,),
    unmatched_t (N,)) as numpy.
    """
    pr = point_cloud_range
    blocks, cls_ids, m_t, u_t = [], [], [], []
    for ci, cfg in enumerate(anchor_generator_cfg):
        stride = int(cfg['feature_map_stride'])
        fm_nx, fm_ny = grid_size[0] // stride, grid_size[1] // stride
        xs = pr[0] + np.arange(fm_nx) * (pr[3] - pr[0]) / (fm_nx - 1)
        ys = pr[1] + np.arange(fm_ny) * (pr[4] - pr[1]) / (fm_ny - 1)
        sizes = np.array(cfg['anchor_sizes'], np.float32)
        rots = np.array(cfg['anchor_rotations'], np.float32)
        heights = np.array(cfg['anchor_bottom_heights'], np.float32)
        s, r, h = len(sizes), len(rots), len(heights)
        a = np.zeros((h, s, r, fm_ny, fm_nx, 7), np.float32)
        a[..., 0] = xs[None, None, None, None, :]
        a[..., 1] = ys[None, None, None, :, None]
        a[..., 2] = heights[:, None, None, None, None]
        a[..., 3:6] = sizes[None, :, None, None, None, :]
        a[..., 6] = rots[None, None, :, None, None]
        a[..., 2] += a[..., 5] / 2
        flat = a.reshape(-1, 7)
        blocks.append(flat)
        n = flat.shape[0]
        cls_ids += [ci + 1] * n
        m_t += [float(cfg['matched_threshold'])] * n
        u_t += [float(cfg['unmatched_threshold'])] * n
    return (np.concatenate(blocks), np.array(cls_ids, np.int32),
            np.array(m_t, np.float32), np.array(u_t, np.float32))


class AnchorHeadMulti(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: Sequence[str]
    grid_size: Tuple[int, int, int]
    point_cloud_range: Tuple[float, ...]
    predict_boxes_when_training: bool = True
    compute_dtype: Any = None

    def _box_coder(self):
        tc = self.model_cfg.TARGET_ASSIGNER_CONFIG
        return getattr(box_coder_utils, tc.BOX_CODER)(
            **dict(tc.get('BOX_CODER_CONFIG', {})))

    def _head_plan(self):
        """Static per-head layout: (class names, class ids (1-based),
        anchors-per-loc, anchor rows)."""
        cfg = self.model_cfg
        acfg = {c['class_name']: c for c in cfg.ANCHOR_GENERATOR_CONFIG}
        stride = int(cfg.ANCHOR_GENERATOR_CONFIG[0]['feature_map_stride'])
        fm = (self.grid_size[0] // stride) * (self.grid_size[1] // stride)
        plan = []
        for head_cfg in cfg.RPN_HEAD_CFGS:
            names = list(head_cfg['HEAD_CLS_NAME'])
            ids = [list(self.class_names).index(n) + 1 for n in names]
            a_per = sum(
                len(acfg[n]['anchor_sizes']) * len(acfg[n]['anchor_rotations'])
                * len(acfg[n]['anchor_bottom_heights']) for n in names)
            plan.append((names, ids, a_per, a_per * fm))
        return plan, fm

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        cfg = self.model_cfg
        x = batch_dict['spatial_features_2d']
        b = x.shape[0]
        num_dir_bins = int(cfg.NUM_DIR_BINS)
        coder = self._box_coder()
        code = coder.code_size
        dt = self.compute_dtype or x.dtype

        if cfg.get('SHARED_CONV_NUM_FILTER', None) is not None:
            x = nn.Conv(int(cfg.SHARED_CONV_NUM_FILTER), (3, 3),
                        padding=((1, 1), (1, 1)), use_bias=False, dtype=dt,
                        name='shared_conv')(x)
            x = nn.BatchNorm(use_running_average=not train, **_BN,
                             name='shared_bn')(x)
            x = nn.relu(x)
        h, w = x.shape[1], x.shape[2]

        sep = cfg.get('SEPARATE_REG_CONFIG', None)
        plan, fm = self._head_plan()

        def middle(xx, n_conv, n_filt, name):
            for i in range(n_conv):
                xx = nn.Conv(n_filt, (3, 3), padding=((1, 1), (1, 1)),
                             use_bias=False, dtype=dt, name=f'{name}_c{i}')(xx)
                xx = nn.BatchNorm(use_running_average=not train, **_BN,
                                  name=f'{name}_bn{i}')(xx)
                xx = nn.relu(xx)
            return xx

        cls_list, box_list, dir_list = [], [], []
        for hi, (names, ids, a_per, _) in enumerate(plan):
            n_h = len(ids)
            if sep is not None:
                nm, nf = int(sep.NUM_MIDDLE_CONV), int(sep.NUM_MIDDLE_FILTER)
                xc = middle(x, nm, nf, f'h{hi}_cls')
                cls = nn.Conv(a_per * n_h, (3, 3), padding=((1, 1), (1, 1)),
                              bias_init=nn.initializers.constant(-np.log(99.0)),
                              dtype=dt, name=f'h{hi}_cls_out')(xc)
                regs = []
                for item in sep.REG_LIST:
                    rname, rch = item.split(':')
                    xr = middle(x, nm, nf, f'h{hi}_{rname}')
                    r = nn.Conv(a_per * int(rch), (3, 3),
                                padding=((1, 1), (1, 1)), dtype=dt,
                                name=f'h{hi}_{rname}_out')(xr)
                    regs.append(r.reshape(b, h, w, a_per, int(rch)))
                box = jnp.concatenate(regs, axis=-1)        # (B,H,W,A,code)
            else:
                cls = nn.Conv(a_per * n_h, (1, 1),
                              bias_init=nn.initializers.constant(-np.log(99.0)),
                              dtype=dt, name=f'h{hi}_cls_out')(x)
                box = nn.Conv(a_per * code, (1, 1), dtype=dt,
                              name=f'h{hi}_box_out')(x).reshape(
                    b, h, w, a_per, code)
            # anchor-major flatten (multihead order): (B,H,W,A,c)->(B,A,H,W,c)
            cls = cls.reshape(b, h, w, a_per, n_h).transpose(0, 3, 1, 2, 4)
            box = box.transpose(0, 3, 1, 2, 4)
            cls_list.append(cls.reshape(b, a_per * h * w, n_h))
            box_list.append(box.reshape(b, a_per * h * w, code))
            if cfg.get('USE_DIRECTION_CLASSIFIER', None) is not None:
                d = nn.Conv(a_per * num_dir_bins, (1, 1), dtype=dt,
                            name=f'h{hi}_dir_out')(x)
                d = d.reshape(b, h, w, a_per, num_dir_bins).transpose(
                    0, 3, 1, 2, 4)
                dir_list.append(d.reshape(b, a_per * h * w, num_dir_bins))

        # pack per-head class logits into dense (B, N, num_class) with -1e9
        # for classes outside the head (sigmoid == 0 exactly)
        dense_cls = []
        for (names, ids, a_per, rows), cls in zip(plan, cls_list):
            full = jnp.full(cls.shape[:2] + (self.num_class,), -1e9,
                            jnp.float32)
            for j, cid in enumerate(ids):
                full = full.at[..., cid - 1].set(cls[..., j])
            dense_cls.append(full)
        cls_preds = jnp.concatenate(dense_cls, axis=1).astype(jnp.float32)
        box_preds = jnp.concatenate(box_list, axis=1).astype(jnp.float32)
        dir_preds = jnp.concatenate(dir_list, axis=1).astype(jnp.float32) \
            if dir_list else None

        anchors_np, anchor_cls, m_t, u_t = generate_anchors_multihead(
            cfg.ANCHOR_GENERATOR_CONFIG, self.grid_size,
            self.point_cloud_range)
        # pad anchors with zeros to the box ndim implied by the code size
        # (velocity dims for nuScenes; reference anchor_head_template.py:46-49)
        box_ndim = code - 1 if coder.encode_angle_by_sincos else code
        if box_ndim > 7:
            anchors_np = np.concatenate(
                [anchors_np,
                 np.zeros((anchors_np.shape[0], box_ndim - 7), np.float32)],
                axis=1)
        anchors_flat = jnp.asarray(anchors_np)

        ret = {'cls_preds': cls_preds, 'box_preds': box_preds}
        if dir_preds is not None:
            ret['dir_cls_preds'] = dir_preds
        if train:
            def single(gt):
                return assign_targets_single(
                    anchors_flat, jnp.asarray(anchor_cls),
                    gt[..., :anchors_flat.shape[-1]],
                    gt[..., -1].astype(jnp.int32), jnp.asarray(m_t),
                    jnp.asarray(u_t), coder)

            labels, reg_targets, reg_weights = jax.vmap(single)(
                batch_dict['gt_boxes'])
            ret.update(box_cls_labels=labels, box_reg_targets=reg_targets,
                       reg_weights=reg_weights)

        decoded = coder.decode(box_preds, anchors_flat[None])
        if cfg.get('USE_DIRECTION_CLASSIFIER', None) is not None:
            dir_offset = float(cfg.DIR_OFFSET)
            period = 2 * np.pi / num_dir_bins
            dir_labels = jnp.argmax(dir_preds, axis=-1)
            val = common_utils.limit_period(
                decoded[..., 6] - dir_offset, float(cfg.DIR_LIMIT_OFFSET),
                period)
            decoded = decoded.at[..., 6].set(
                val + dir_offset + period * dir_labels.astype(decoded.dtype))
        batch_dict['batch_cls_preds'] = cls_preds
        batch_dict['batch_box_preds'] = decoded
        batch_dict['cls_preds_normalized'] = False
        batch_dict['anchor_head_ret'] = ret
        return batch_dict


def anchor_head_multi_loss(model_cfg, ret, anchors_flat, num_class):
    """CBGS multihead loss (reference anchor_head_multi.py:245-373):
    focal cls with pos/neg weighting, WeightedL1 reg (sincos coder, no
    sin-difference), direction CE."""
    lw = model_cfg.LOSS_CONFIG.LOSS_WEIGHTS
    tb = {}
    labels = ret['box_cls_labels']
    cls_preds = ret['cls_preds']
    positives = labels > 0
    negatives = labels == 0

    pos_w = float(lw.get('pos_cls_weight', 1.0))
    neg_w = float(lw.get('neg_cls_weight', 1.0))
    cls_weights = (negatives * neg_w + positives * pos_w).astype(jnp.float32)
    reg_weights = positives.astype(jnp.float32)
    pos_normalizer = jnp.clip(jnp.sum(positives, axis=1, keepdims=True),
                              min=1.0)
    cls_weights = cls_weights / pos_normalizer
    reg_weights = reg_weights / pos_normalizer

    cls_targets = jnp.where(labels >= 0, labels, 0)
    one_hot = jax.nn.one_hot(cls_targets, num_class + 1)[..., 1:]
    cls_loss = loss_utils.sigmoid_focal_loss(cls_preds, one_hot, cls_weights)
    cls_loss = jnp.sum(cls_loss) / labels.shape[0] * lw['cls_weight']
    tb['rpn_loss_cls'] = cls_loss

    diff = ret['box_preds'] - ret['box_reg_targets']
    code_w = jnp.asarray(lw['code_weights'], jnp.float32)
    if model_cfg.LOSS_CONFIG.get('REG_LOSS_TYPE', 'WeightedSmoothL1Loss') \
            == 'WeightedL1Loss':
        l1 = jnp.abs(diff) * code_w
    else:
        l1 = loss_utils.smooth_l1(diff, beta=1.0 / 9.0) * code_w
    loc_loss = jnp.sum(l1 * reg_weights[..., None]) / labels.shape[0] \
        * lw['loc_weight']
    tb['rpn_loss_loc'] = loc_loss
    rpn_loss = cls_loss + loc_loss

    if 'dir_cls_preds' in ret:
        dir_offset = float(model_cfg.DIR_OFFSET)
        num_bins = int(model_cfg.NUM_DIR_BINS)
        # gt angle: with sincos coding the target carries (cos dr, sin dr)
        coder_sincos = ret['box_reg_targets'].shape[-1] > 7 and \
            model_cfg.TARGET_ASSIGNER_CONFIG.get(
                'BOX_CODER_CONFIG', {}).get('encode_angle_by_sincos', False)
        if coder_sincos:
            ra = anchors_flat[None, :, 6]
            cost = ret['box_reg_targets'][..., 6] + jnp.cos(ra)
            sint = ret['box_reg_targets'][..., 7] + jnp.sin(ra)
            gt_rot = jnp.arctan2(sint, cost)
        else:
            gt_rot = ret['box_reg_targets'][..., 6] + anchors_flat[None, :, 6]
        offset_rot = common_utils.limit_period(gt_rot - dir_offset, 0,
                                               2 * np.pi)
        dir_targets = jnp.clip(
            jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32),
            0, num_bins - 1)
        logp = jax.nn.log_softmax(ret['dir_cls_preds'], axis=-1)
        ce = -jnp.take_along_axis(logp, dir_targets[..., None], axis=-1)[..., 0]
        weights = positives.astype(jnp.float32)
        weights = weights / jnp.clip(jnp.sum(weights, axis=1, keepdims=True),
                                     min=1.0)
        dir_loss = jnp.sum(ce * weights) / labels.shape[0] * lw['dir_weight']
        rpn_loss = rpn_loss + dir_loss
        tb['rpn_loss_dir'] = dir_loss

    tb['rpn_loss'] = rpn_loss
    return rpn_loss, tb
