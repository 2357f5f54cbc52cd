"""Config-driven detector assembly (TPU-native re-design of reference
``pcdet/models/detectors/detector3d_template.py``).

The reference's 9-slot ``module_topology`` (:22-25) is preserved: each slot is
built iff its cfg key exists, and forward execution order == build order. The
mutable ``batch_dict`` becomes a plain dict of jnp arrays flowing through
flax submodules; post-processing is a pure jittable function."""
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import StaticConfig
from ...utils import iou3d
from ..backbones_2d.base_bev_backbone import BaseBEVBackbone, DCNBEVBackbone
from ..backbones_2d.map_to_bev.height_compression import HeightCompression
from ..backbones_2d.map_to_bev.pointpillar_scatter import PointPillarScatter
from ..backbones_3d.pointnet2_backbone import PointNet2MSG
from ..backbones_3d.spconv_backbone import VoxelBackBone8x, VoxelResBackBone8x
from ..backbones_3d.spconv_unet import UNetV2
from ..backbones_3d.pfe.residual_v2p_decoder import ResidualVoxelToPointDecoder
from ..backbones_3d.pfe.voxel_set_abstraction import VoxelSetAbstraction
from ..backbones_3d.vfe.mean_vfe import MeanVFE
from ..backbones_3d.vfe.pillar_vfe import PillarVFE
from ..dense_heads.anchor_head import AnchorHeadSingle, anchor_head_loss, generate_anchors
from ..dense_heads.anchor_head_multi import (AnchorHeadMulti,
                                             anchor_head_multi_loss,
                                             generate_anchors_multihead)
from ..dense_heads.center_af_head import CenterAFHeadSingle, center_af_head_loss
from ..dense_heads.point_head_box import PointHeadBox, point_head_box_loss
from ..dense_heads.point_head_simple import PointHeadSimple, point_head_loss
from ..dense_heads.point_intra_part_head import (PointIntraPartOffsetHead,
                                                 point_intra_part_head_loss)
from ..roi_heads.iouguided_roi_head import IoUGuidedRoIHead, roi_head_loss
from ..roi_heads.pointrcnn_head import PointRCNNHead, pointrcnn_head_loss
from ..roi_heads.partA2_head import PartA2FCHead, parta2_head_loss
from ..roi_heads.pvrcnn_head import PVRCNNHead, pvrcnn_head_loss
from ..roi_heads.voxelrcnn_head import VoxelRCNNHead, voxelrcnn_head_loss

MODULE_TOPOLOGY = ['vfe', 'backbone_3d', 'map_to_bev_module', 'pfe',
                   'backbone_2d', 'dense_head', 'post_pfe', 'point_head',
                   'roi_head']

VFE_REGISTRY = {'MeanVFE': MeanVFE, 'PillarVFE': PillarVFE}
BACKBONE_3D_REGISTRY = {'VoxelResBackBone8x': VoxelResBackBone8x,
                        'VoxelBackBone8x': VoxelBackBone8x,
                        'UNetV2': UNetV2}
MAP_TO_BEV_REGISTRY = {'HeightCompression': HeightCompression,
                       'PointPillarScatter': PointPillarScatter}
BACKBONE_2D_REGISTRY = {'BaseBEVBackbone': BaseBEVBackbone,
                        'DCNBEVBackbone': DCNBEVBackbone}
DENSE_HEAD_REGISTRY = {'CenterAFHeadSingle': CenterAFHeadSingle,
                       'AnchorHeadSingle': AnchorHeadSingle}


class Detector3DTemplate(nn.Module):
    model_cfg: Any
    num_class: int
    class_names: Sequence[str]
    dataset_meta: Any  # dict: grid_size, voxel_size, point_cloud_range,
                       # num_point_features, voxel_capacity
    compute_dtype: Any = None

    def _build_vfe(self):
        cfg = self.model_cfg.get('VFE')
        if cfg is None:
            return None
        kw = {}
        if cfg.NAME == 'PillarVFE':
            kw = dict(voxel_size=tuple(self.dataset_meta['voxel_size']),
                      point_cloud_range=tuple(self.dataset_meta['point_cloud_range']))
        return VFE_REGISTRY[cfg.NAME](
            model_cfg=StaticConfig(cfg),
            num_point_features=self.dataset_meta['num_point_features'],
            name='vfe', **kw)

    def _build_backbone_3d(self):
        cfg = self.model_cfg.get('BACKBONE_3D')
        if cfg is None:
            return None
        if cfg.NAME == 'PointNet2MSG':
            return PointNet2MSG(
                model_cfg=StaticConfig(cfg),
                input_channels=self.dataset_meta['num_point_features'],
                name='backbone_3d')
        kw = {}
        if cfg.NAME == 'UNetV2':
            kw = dict(voxel_size=tuple(self.dataset_meta['voxel_size']),
                      point_cloud_range=tuple(
                          self.dataset_meta['point_cloud_range']))
        return BACKBONE_3D_REGISTRY[cfg.NAME](
            model_cfg=StaticConfig(cfg),
            input_channels=self.dataset_meta['num_point_features'],
            grid_size=tuple(self.dataset_meta['grid_size']),
            voxel_capacity=int(self.dataset_meta['voxel_capacity']),
            compute_dtype=self.compute_dtype, name='backbone_3d', **kw)

    def _build_map_to_bev(self):
        cfg = self.model_cfg.get('MAP_TO_BEV')
        if cfg is None:
            return None
        kw = {}
        if cfg.NAME == 'PointPillarScatter':
            kw = dict(grid_size=tuple(self.dataset_meta['grid_size']))
        return MAP_TO_BEV_REGISTRY[cfg.NAME](model_cfg=StaticConfig(cfg),
                                             name='map_to_bev', **kw)

    def _build_backbone_2d(self):
        cfg = self.model_cfg.get('BACKBONE_2D')
        if cfg is None:
            return None
        num_bev = int(self.model_cfg.MAP_TO_BEV.NUM_BEV_FEATURES)
        return BACKBONE_2D_REGISTRY[cfg.NAME](
            model_cfg=StaticConfig(cfg), input_channels=num_bev,
            compute_dtype=self.compute_dtype, name='backbone_2d')

    def _build_dense_head(self, name='dense_head'):
        cfg = self.model_cfg.get('DENSE_HEAD')
        if cfg is None:
            return None
        bev_cfg = self.model_cfg.get('BACKBONE_2D')
        in_ch = int(sum(bev_cfg.get('NUM_UPSAMPLE_FILTERS',
                                    [bev_cfg['NUM_FILTERS'][-1]])))
        common = dict(model_cfg=StaticConfig(cfg), input_channels=in_ch,
                      num_class=self.num_class,
                      class_names=tuple(self.class_names),
                      compute_dtype=self.compute_dtype, name=name)
        if cfg.NAME == 'AnchorHeadSingle':
            return AnchorHeadSingle(
                grid_size=tuple(self.dataset_meta['grid_size']),
                point_cloud_range=tuple(self.dataset_meta['point_cloud_range']),
                **common)
        if cfg.NAME == 'AnchorHeadMulti':
            return AnchorHeadMulti(
                grid_size=tuple(self.dataset_meta['grid_size']),
                point_cloud_range=tuple(self.dataset_meta['point_cloud_range']),
                **common)
        return DENSE_HEAD_REGISTRY[cfg.NAME](
            voxel_size=tuple(self.dataset_meta['voxel_size']),
            point_cloud_range=tuple(self.dataset_meta['point_cloud_range']),
            **common)

    def _build_pfe(self):
        cfg = self.model_cfg.get('PFE')
        if cfg is None:
            return None
        assert cfg.NAME == 'VoxelSetAbstraction', cfg.NAME
        return VoxelSetAbstraction(
            model_cfg=StaticConfig(cfg),
            voxel_size=tuple(self.dataset_meta['voxel_size']),
            point_cloud_range=tuple(self.dataset_meta['point_cloud_range']),
            num_bev_features=int(self.model_cfg.MAP_TO_BEV.NUM_BEV_FEATURES),
            num_rawpoint_features=self.dataset_meta['num_point_features'],
            name='pfe')

    def _build_post_pfe(self):
        cfg = self.model_cfg.get('POST_PFE')
        if cfg is None:
            return None
        return ResidualVoxelToPointDecoder(
            model_cfg=StaticConfig(cfg),
            voxel_size=tuple(self.dataset_meta['voxel_size']),
            point_cloud_range=tuple(self.dataset_meta['point_cloud_range']),
            compute_dtype=self.compute_dtype, name='post_pfe')

    def _build_point_head(self):
        cfg = self.model_cfg.get('POINT_HEAD')
        if cfg is None:
            return None
        if cfg.NAME == 'PointHeadBox':
            in_ch = int(self.model_cfg.BACKBONE_3D.FP_MLPS[0][-1])
            return PointHeadBox(model_cfg=StaticConfig(cfg), input_channels=in_ch,
                                num_class=self.num_class, name='point_head')
        if cfg.NAME == 'PointIntraPartOffsetHead':
            return PointIntraPartOffsetHead(
                model_cfg=StaticConfig(cfg), input_channels=16,
                num_class=self.num_class, name='point_head')
        if 'POST_PFE' in self.model_cfg:
            in_ch = int(self.model_cfg.POST_PFE.OUT_BLOCK.OUT_CHANNELS)
        else:
            in_ch = int(self.model_cfg.PFE.NUM_OUTPUT_FEATURES)
        return PointHeadSimple(model_cfg=StaticConfig(cfg), input_channels=in_ch,
                               num_class=self.num_class,
                               compute_dtype=self.compute_dtype,
                               name='point_head')

    def _build_roi_head(self):
        cfg = self.model_cfg.get('ROI_HEAD')
        if cfg is None:
            return None
        if cfg.NAME == 'PartA2FCHead':
            return PartA2FCHead(
                model_cfg=StaticConfig(cfg), input_channels=16,
                num_class=1 if cfg.get('CLASS_AGNOSTIC', True) else self.num_class,
                point_cloud_range=tuple(self.dataset_meta['point_cloud_range']),
                voxel_size=tuple(self.dataset_meta['voxel_size']),
                name='roi_head')
        if cfg.NAME == 'VoxelRCNNHead':
            return VoxelRCNNHead(
                model_cfg=StaticConfig(cfg), input_channels=0,
                num_class=1 if cfg.get('CLASS_AGNOSTIC', True) else self.num_class,
                point_cloud_range=tuple(self.dataset_meta['point_cloud_range']),
                voxel_size=tuple(self.dataset_meta['voxel_size']),
                name='roi_head')
        if cfg.NAME in ('PointRCNNHead', 'PointRCNNIoUHead'):
            # PointRCNNIoUHead (reference pointrcnniou_head.py) is the same
            # architecture with online rcnn_iou soft cls labels, selected by
            # TARGET_CONFIG.CLS_SCORE_TYPE == 'rcnn_iou'
            return PointRCNNHead(
                model_cfg=StaticConfig(cfg), input_channels=0,
                num_class=1 if cfg.get('CLASS_AGNOSTIC', True) else self.num_class,
                point_cloud_range=tuple(self.dataset_meta['point_cloud_range']),
                voxel_size=tuple(self.dataset_meta['voxel_size']),
                name='roi_head')
        if cfg.NAME == 'PVRCNNHead':
            return PVRCNNHead(
                model_cfg=StaticConfig(cfg), input_channels=0,
                num_class=1 if cfg.get('CLASS_AGNOSTIC', True) else self.num_class,
                point_cloud_range=tuple(self.dataset_meta['point_cloud_range']),
                voxel_size=tuple(self.dataset_meta['voxel_size']),
                name='roi_head')
        return IoUGuidedRoIHead(
            model_cfg=StaticConfig(cfg), input_channels=0,
            num_class=1 if cfg.get('CLASS_AGNOSTIC', True) else self.num_class,
            point_cloud_range=tuple(self.dataset_meta['point_cloud_range']),
            voxel_size=tuple(self.dataset_meta['voxel_size']),
            compute_dtype=self.compute_dtype, name='roi_head')

    def build_module_list(self):
        builders = {
            'vfe': self._build_vfe,
            'backbone_3d': self._build_backbone_3d,
            'map_to_bev_module': self._build_map_to_bev,
            'pfe': self._build_pfe,
            'backbone_2d': self._build_backbone_2d,
            'dense_head': self._build_dense_head,
            'post_pfe': self._build_post_pfe,
            'point_head': self._build_point_head,
            'roi_head': self._build_roi_head,
        }
        modules = []
        for slot in MODULE_TOPOLOGY:
            m = builders[slot]()
            if m is not None:
                modules.append(m)
        return modules

    # -- post-processing ---------------------------------------------------

    def post_processing(self, batch_dict):
        """Standard cls-score NMS (reference detector3d_template.py:210-316,
        class_agnostic path). Fixed-shape (B, post_max) outputs."""
        pp = self.model_cfg.POST_PROCESSING
        nms_cfg = pp.NMS_CONFIG
        box_preds = batch_dict['batch_box_preds']
        cls_preds = batch_dict['batch_cls_preds']
        if not batch_dict.get('cls_preds_normalized', False):
            cls_probs = jax.nn.sigmoid(cls_preds)
        else:
            cls_probs = cls_preds
        scores = jnp.max(cls_probs, axis=-1)
        labels = jnp.argmax(cls_probs, axis=-1) + 1

        score_thresh = float(pp.SCORE_THRESH)
        pre = int(min(nms_cfg.NMS_PRE_MAXSIZE, box_preds.shape[1]))
        post = int(nms_cfg.NMS_POST_MAXSIZE)
        thresh = float(nms_cfg.NMS_THRESH)

        if nms_cfg.get('MULTI_CLASSES_NMS', False):
            # per-class NMS (reference model_nms_utils.multi_classes_nms):
            # one fixed-shape NMS lane per (sample, class), concatenated
            b, n, c = cls_probs.shape
            sc = jnp.where(cls_probs >= score_thresh, cls_probs, -jnp.inf)
            sc = sc.transpose(0, 2, 1).reshape(b * c, n)
            bx = jnp.broadcast_to(box_preds[:, None],
                                  (b, c) + box_preds.shape[1:])
            bx = bx.reshape(b * c, n, box_preds.shape[-1])
            keep_idx, keep_valid = jax.vmap(
                lambda bb, ss: iou3d.nms_rotated(
                    bb[..., :7], ss, thresh, pre_max=pre, post_max=post))(
                bx, sc)
            fb = jnp.take_along_axis(bx, keep_idx[..., None], axis=1)
            fs = jnp.take_along_axis(jnp.where(jnp.isfinite(sc), sc, 0.0),
                                     keep_idx, axis=1)
            fl = jnp.broadcast_to(
                (jnp.arange(c, dtype=jnp.int32) + 1)[None, :, None],
                (b, c, post)).reshape(b * c, post)
            final_boxes = fb.reshape(b, c * post, -1)
            final_scores = jnp.where(keep_valid, fs, 0.0).reshape(b, c * post)
            final_labels = fl.reshape(b, c * post)
            return {
                'pred_boxes': final_boxes,
                'pred_scores': final_scores,
                'pred_labels': final_labels,
                'pred_valid': keep_valid.reshape(b, c * post),
            }

        nms_scores = jnp.where(scores >= score_thresh, scores, -jnp.inf)
        keep_idx, keep_valid = jax.vmap(
            lambda bx, sc: iou3d.nms_rotated(bx, sc, thresh, pre_max=pre,
                                             post_max=post))(box_preds, nms_scores)
        final_boxes = jnp.take_along_axis(box_preds, keep_idx[..., None], axis=1)
        final_scores = jnp.take_along_axis(scores, keep_idx, axis=1)
        final_labels = jnp.take_along_axis(labels, keep_idx, axis=1)
        final_scores = jnp.where(keep_valid, final_scores, 0.0)
        return {
            'pred_boxes': final_boxes,
            'pred_scores': final_scores,
            'pred_labels': final_labels,
            'pred_valid': keep_valid,
        }

    def post_processing_withfgscores(self, batch_dict):
        """IoU-score-ranked NMS with fg-score filtering (reference
        detector3d_template.py:318-431 + model_nms_utils.py:27-50).

        Returns fixed-shape (B, post_max) final boxes/scores/labels/valid.
        """
        pp = self.model_cfg.POST_PROCESSING
        nms_cfg = pp.NMS_CONFIG
        box_preds = batch_dict['batch_box_preds']        # (B, K, 7)
        cls_preds = batch_dict['batch_cls_preds']        # (B, K, C)
        iouscore = batch_dict['batch_iouscore_preds'][..., 0]  # (B, K)
        if not batch_dict.get('cls_preds_normalized', False):
            cls_probs = jax.nn.sigmoid(cls_preds)
        else:
            cls_probs = cls_preds
        fg_scores = jnp.max(cls_probs, axis=-1)
        # reference detector3d_template.py:394-398: with class labels from the
        # RoI stage (FV2P's class-agnostic rcnn head) the final label is
        # roi_labels, NOT argmax of the 1-channel rcnn cls logits
        if batch_dict.get('has_class_labels', False) and 'roi_labels' in batch_dict:
            labels = batch_dict['roi_labels']
        else:
            labels = jnp.argmax(cls_probs, axis=-1) + 1

        score_thresh = float(pp.SCORE_THRESH)
        nms_scores = jnp.where(fg_scores >= score_thresh, iouscore, -jnp.inf)

        pre = int(min(nms_cfg.NMS_PRE_MAXSIZE, box_preds.shape[1]))
        post = int(nms_cfg.NMS_POST_MAXSIZE)
        thresh = float(nms_cfg.NMS_THRESH)

        keep_idx, keep_valid = jax.vmap(
            lambda bx, sc: iou3d.nms_rotated(bx, sc, thresh, pre_max=pre,
                                             post_max=post))(box_preds, nms_scores)

        final_boxes = jnp.take_along_axis(box_preds, keep_idx[..., None], axis=1)
        final_scores = jnp.take_along_axis(iouscore, keep_idx, axis=1)
        final_labels = jnp.take_along_axis(labels, keep_idx, axis=1)
        final_scores = jnp.where(keep_valid, final_scores, 0.0)
        return {
            'pred_boxes': final_boxes,
            'pred_scores': final_scores,
            'pred_labels': final_labels,
            'pred_valid': keep_valid,
        }


class VoxelRCNN(Detector3DTemplate):
    """Voxel R-CNN (reference ``pcdet/models/detectors/voxel_rcnn.py``)."""

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        for module in self.build_module_list():
            batch_dict = module(batch_dict, train=train)
        if not train:
            batch_dict.update(self.post_processing(batch_dict))
        return batch_dict


class PointRCNN(Detector3DTemplate):
    """Point-based two-stage detector (reference
    ``pcdet/models/detectors/point_rcnn.py``)."""

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        for module in self.build_module_list():
            batch_dict = module(batch_dict, train=train)
        if not train:
            batch_dict.update(self.post_processing(batch_dict))
        return batch_dict


class PVRCNN(Detector3DTemplate):
    """Point-Voxel RCNN (reference ``pcdet/models/detectors/pv_rcnn.py``)."""

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        for module in self.build_module_list():
            batch_dict = module(batch_dict, train=train)
        if not train:
            batch_dict.update(self.post_processing(batch_dict))
        return batch_dict


class SECONDNet(Detector3DTemplate):
    """Single-stage anchor-based detector (reference
    ``pcdet/models/detectors/second_net.py``)."""

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        for module in self.build_module_list():
            batch_dict = module(batch_dict, train=train)
        if not train:
            batch_dict.update(self.post_processing(batch_dict))
        return batch_dict


class PointPillar(SECONDNet):
    """Pillar-based single-stage detector (reference
    ``pcdet/models/detectors/pointpillar.py``)."""
    pass


class MGAF3DSSD(Detector3DTemplate):
    """Single-stage anchor-free detector (reference
    ``pcdet/models/detectors/mgaf_3dssd.py``)."""

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        for module in self.build_module_list():
            batch_dict = module(batch_dict, train=train)
        if not train:
            batch_dict.update(self.post_processing_withfgscores(batch_dict))
        return batch_dict

class FromVoxelToPoint(Detector3DTemplate):
    """Two-stage IoU-guided detector (reference
    ``pcdet/models/detectors/fv2p.py``): anchor RPN -> voxel-to-point decoder
    -> point seg head -> IoU-guided RoI head with two-pass alignment."""

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        for module in self.build_module_list():
            batch_dict = module(batch_dict, train=train)
        if not train:
            batch_dict.update(self.post_processing_withfgscores(batch_dict))
        return batch_dict


class PartA2Net(Detector3DTemplate):
    """Part-aware + part-aggregation two-stage detector (reference
    ``pcdet/models/detectors/PartA2_net.py``)."""

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        for module in self.build_module_list():
            batch_dict = module(batch_dict, train=train)
        if not train:
            batch_dict.update(self.post_processing(batch_dict))
        return batch_dict


DETECTOR_REGISTRY = {'MGAF3DSSD': MGAF3DSSD, 'FromVoxelToPoint': FromVoxelToPoint,
                     'SECONDNet': SECONDNet, 'PointPillar': PointPillar,
                     'PVRCNN': PVRCNN, 'PointRCNN': PointRCNN,
                     'VoxelRCNN': VoxelRCNN, 'PartA2Net': PartA2Net}


def compute_training_loss(model, batch_dict):
    """Pure loss dispatch (kept outside flax method wrapping).

    MGAF3DSSD: loss = rpn loss (reference mgaf_3dssd.py:25-34)."""
    if isinstance(model, MGAF3DSSD):
        rpn_loss, tb = center_af_head_loss(
            StaticConfig(model.model_cfg.DENSE_HEAD), batch_dict['head_ret'])
        tb['loss'] = rpn_loss
        return rpn_loss, tb
    if isinstance(model, SECONDNet):  # includes PointPillar
        cfg = model.model_cfg
        if cfg.DENSE_HEAD.NAME == 'AnchorHeadMulti':
            a_np, _, _, _ = generate_anchors_multihead(
                cfg.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG,
                tuple(model.dataset_meta['grid_size']),
                tuple(model.dataset_meta['point_cloud_range']))
            rpn_loss, tb = anchor_head_multi_loss(
                StaticConfig(cfg.DENSE_HEAD), batch_dict['anchor_head_ret'],
                jnp.asarray(a_np), model.num_class)
            tb['loss'] = rpn_loss
            return rpn_loss, tb
        anchors = generate_anchors(
            cfg.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG,
            tuple(model.dataset_meta['grid_size']),
            tuple(model.dataset_meta['point_cloud_range']))
        rpn_loss, tb = anchor_head_loss(
            StaticConfig(cfg.DENSE_HEAD), batch_dict['anchor_head_ret'],
            jnp.asarray(anchors.reshape(-1, 7)), model.num_class)
        tb['loss'] = rpn_loss
        return rpn_loss, tb
    if isinstance(model, VoxelRCNN):
        cfg = model.model_cfg
        anchors = generate_anchors(
            cfg.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG,
            tuple(model.dataset_meta['grid_size']),
            tuple(model.dataset_meta['point_cloud_range']))
        rpn_loss, tb = anchor_head_loss(
            StaticConfig(cfg.DENSE_HEAD), batch_dict['anchor_head_ret'],
            jnp.asarray(anchors.reshape(-1, 7)), model.num_class)
        rcnn_loss, tb_r = voxelrcnn_head_loss(
            StaticConfig(cfg.ROI_HEAD), batch_dict['roi_head_ret'])
        tb.update(tb_r)
        loss = rpn_loss + rcnn_loss
        tb['loss'] = loss
        return loss, tb
    if isinstance(model, PointRCNN):
        cfg = model.model_cfg
        if cfg.POINT_HEAD.NAME == 'PointIntraPartOffsetHead':
            # PartA2-free variant (reference PartA2_free.yaml: PointRCNN
            # detector + part head with box branch)
            point_loss, tb = point_intra_part_head_loss(
                StaticConfig(cfg.POINT_HEAD), batch_dict['point_head_ret'])
        else:
            point_loss, tb = point_head_box_loss(
                StaticConfig(cfg.POINT_HEAD), batch_dict['point_head_ret'])
        rcnn_loss, tb_r = pointrcnn_head_loss(
            StaticConfig(cfg.ROI_HEAD), batch_dict['roi_head_ret'])
        tb.update(tb_r)
        loss = point_loss + rcnn_loss
        tb['loss'] = loss
        return loss, tb
    if isinstance(model, PVRCNN):
        cfg = model.model_cfg
        anchors = generate_anchors(
            cfg.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG,
            tuple(model.dataset_meta['grid_size']),
            tuple(model.dataset_meta['point_cloud_range']))
        rpn_loss, tb = anchor_head_loss(
            StaticConfig(cfg.DENSE_HEAD), batch_dict['anchor_head_ret'],
            jnp.asarray(anchors.reshape(-1, 7)), model.num_class)
        point_loss, tb_p = point_head_loss(
            StaticConfig(cfg.POINT_HEAD), batch_dict['point_head_ret'])
        rcnn_loss, tb_r = pvrcnn_head_loss(
            StaticConfig(cfg.ROI_HEAD), batch_dict['roi_head_ret'])
        tb.update(tb_p)
        tb.update(tb_r)
        loss = rpn_loss + point_loss + rcnn_loss
        tb['loss'] = loss
        return loss, tb
    if isinstance(model, PartA2Net):
        cfg = model.model_cfg
        anchors = generate_anchors(
            cfg.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG,
            tuple(model.dataset_meta['grid_size']),
            tuple(model.dataset_meta['point_cloud_range']))
        rpn_loss, tb = anchor_head_loss(
            StaticConfig(cfg.DENSE_HEAD), batch_dict['anchor_head_ret'],
            jnp.asarray(anchors.reshape(-1, 7)), model.num_class)
        point_loss, tb_p = point_intra_part_head_loss(
            StaticConfig(cfg.POINT_HEAD), batch_dict['point_head_ret'])
        rcnn_loss, tb_r = parta2_head_loss(
            StaticConfig(cfg.ROI_HEAD), batch_dict['roi_head_ret'])
        tb.update(tb_p)
        tb.update(tb_r)
        loss = rpn_loss + point_loss + rcnn_loss
        tb['loss'] = loss
        return loss, tb
    if isinstance(model, FromVoxelToPoint):
        cfg = model.model_cfg
        anchors = generate_anchors(
            cfg.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG,
            tuple(model.dataset_meta['grid_size']),
            tuple(model.dataset_meta['point_cloud_range']))
        rpn_loss, tb = anchor_head_loss(
            StaticConfig(cfg.DENSE_HEAD), batch_dict['anchor_head_ret'],
            jnp.asarray(anchors.reshape(-1, 7)), model.num_class)
        point_loss, tb_p = point_head_loss(
            StaticConfig(cfg.POINT_HEAD), batch_dict['point_head_ret'])
        rcnn_loss, tb_r = roi_head_loss(
            StaticConfig(cfg.ROI_HEAD), batch_dict['roi_head_ret'])
        tb.update(tb_p)
        tb.update(tb_r)
        loss = rpn_loss + point_loss + rcnn_loss
        tb['loss'] = loss
        return loss, tb
    raise NotImplementedError(type(model))


def build_detector(model_cfg, num_class, class_names, dataset_meta,
                   compute_dtype=None):
    return DETECTOR_REGISTRY[model_cfg.NAME](
        model_cfg=StaticConfig(model_cfg), num_class=num_class,
        class_names=tuple(class_names),
        dataset_meta=StaticConfig(dict(dataset_meta)),
        compute_dtype=compute_dtype)
