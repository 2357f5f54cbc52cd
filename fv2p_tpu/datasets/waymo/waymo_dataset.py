"""Waymo Open Dataset (reference ``pcdet/datasets/waymo/waymo_dataset.py``):
sequence-pkl infos with sampled interval, per-frame .npy lidar with NLZ
filter + tanh intensity, native / kitti-format prediction dicts, kitti-style
or official Waymo evaluation (the official path needs tensorflow +
waymo_open_dataset and is import-gated)."""
import copy
import pickle

import numpy as np

from ...utils import box_utils, common_utils
from ..dataset import DatasetTemplate


class WaymoDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.data_path = self.root_path / self.dataset_cfg.PROCESSED_DATA_TAG
        self.split = self.dataset_cfg.DATA_SPLIT[self.mode]
        split_dir = self.root_path / 'ImageSets' / (self.split + '.txt')
        self.sample_sequence_list = [x.strip() for x in open(split_dir).readlines()] \
            if split_dir.exists() else []
        self.infos = []
        self.include_waymo_data(self.mode)

    def include_waymo_data(self, mode):
        if self.logger:
            self.logger.info('Loading Waymo dataset')
        waymo_infos = []
        num_skipped = 0
        for k in range(len(self.sample_sequence_list)):
            sequence_name = self.sample_sequence_list[k].split('.')[0]
            info_path = self.data_path / sequence_name / ('%s.pkl' % sequence_name)
            if not info_path.exists():
                num_skipped += 1
                continue
            with open(info_path, 'rb') as f:
                waymo_infos.extend(pickle.load(f))
        self.infos.extend(waymo_infos)
        if self.logger:
            self.logger.info('Total skipped info %s' % num_skipped)
            self.logger.info('Total samples for Waymo dataset: %d' % len(waymo_infos))
        interval = self.dataset_cfg.SAMPLED_INTERVAL[mode]
        if interval > 1:
            self.infos = self.infos[::interval]
            if self.logger:
                self.logger.info('Total sampled samples for Waymo dataset: %d'
                                 % len(self.infos))

    def get_lidar(self, sequence_name, sample_idx):
        """(N, 7) npy [x,y,z,intensity,elongation,NLZ_flag] -> NLZ-filtered
        (N, 5) with tanh-squashed intensity (reference :103-110)."""
        lidar_file = self.data_path / sequence_name / ('%04d.npy' % sample_idx)
        point_features = np.load(lidar_file)
        points_all, nlz_flag = point_features[:, 0:5], point_features[:, 5]
        points_all = points_all[nlz_flag == -1]
        points_all[:, 3] = np.tanh(points_all[:, 3])
        return points_all

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * self.total_epochs
        return len(self.infos)

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = copy.deepcopy(self.infos[index])
        pc_info = info['point_cloud']
        points = self.get_lidar(pc_info['lidar_sequence'], pc_info['sample_idx'])
        input_dict = {'points': points, 'frame_id': info['frame_id']}
        if 'annos' in info:
            annos = common_utils.drop_info_with_name(info['annos'], name='unknown')
            input_dict.update({
                'gt_names': annos['name'],
                'gt_boxes': annos['gt_boxes_lidar'],
            })
        data_dict = self.prepare_data(data_dict=input_dict)
        data_dict['metadata'] = info.get('metadata', info['frame_id'])
        return data_dict

    @staticmethod
    def generate_prediction_dicts(batch_dict, pred_dicts, class_names,
                                  output_path=None):
        """Fixed-shape device outputs -> Waymo prediction dicts
        (reference :154-199)."""

        def get_template(num):
            return {'name': np.zeros(num), 'score': np.zeros(num),
                    'boxes_lidar': np.zeros([num, 7])}

        annos = []
        batch_size = np.asarray(pred_dicts['pred_scores']).shape[0] \
            if not isinstance(pred_dicts, list) else len(pred_dicts)
        for index in range(batch_size):
            if isinstance(pred_dicts, list):
                box_dict = pred_dicts[index]
            else:
                box_dict = {k: v[index] for k, v in pred_dicts.items()}
            valid = np.asarray(box_dict['pred_valid']) \
                if 'pred_valid' in box_dict else None
            scores = np.asarray(box_dict['pred_scores'])
            boxes = np.asarray(box_dict['pred_boxes'])
            labels = np.asarray(box_dict['pred_labels'])
            if valid is not None:
                scores, boxes, labels = scores[valid], boxes[valid], labels[valid]
            pred = get_template(scores.shape[0])
            if scores.shape[0] > 0:
                pred['name'] = np.array(class_names)[labels - 1]
                pred['score'] = scores
                pred['boxes_lidar'] = boxes
            pred['frame_id'] = batch_dict['frame_id'][index]
            if 'metadata' in batch_dict:
                pred['metadata'] = batch_dict['metadata'][index]
            annos.append(pred)
        return annos

    def kitti_eval(self, eval_det_annos, eval_gt_annos, class_names):
        """kitti-style AP with Waymo->KITTI class remap (reference :200-280)."""
        from ..kitti.kitti_object_eval import eval as kitti_eval

        map_name_to_kitti = {'Vehicle': 'Car', 'Pedestrian': 'Pedestrian',
                             'Cyclist': 'Cyclist', 'Sign': 'Sign', 'Car': 'Car'}

        def transform_to_kitti_format(annos, info_with_fakelidar=False,
                                      is_gt=False):
            for anno in annos:
                for k in range(anno['name'].shape[0]):
                    anno['name'][k] = map_name_to_kitti.get(anno['name'][k],
                                                            'Person_sitting')
                anno['bbox'] = np.zeros((len(anno['name']), 4))
                anno['bbox'][:, 2:4] = 50  # fake bbox: height 50 passes MIN_HEIGHT
                anno['truncated'] = np.zeros(len(anno['name']))
                anno['occluded'] = np.zeros(len(anno['name']))
                if 'boxes_lidar' in anno:
                    gt_boxes_lidar = anno['boxes_lidar'].copy()
                else:
                    gt_boxes_lidar = anno['gt_boxes_lidar'].copy()
                if is_gt and 'num_points_in_gt' in anno:
                    mask = anno['num_points_in_gt'] > 0
                    gt_boxes_lidar = gt_boxes_lidar[mask]
                    anno['name'] = anno['name'][mask]
                    if 'score' in anno:
                        anno['score'] = anno['score'][mask]
                anno['alpha'] = -np.arctan2(-gt_boxes_lidar[:, 1],
                                            gt_boxes_lidar[:, 0]) if len(
                    gt_boxes_lidar) else np.zeros(0)
                # lidar -> pseudo-camera: x_cam = -y, y_cam = -z, z_cam = x
                if len(gt_boxes_lidar) > 0:
                    anno['location'] = np.stack([
                        -gt_boxes_lidar[:, 1], -gt_boxes_lidar[:, 2],
                        gt_boxes_lidar[:, 0]], axis=1)
                    anno['dimensions'] = gt_boxes_lidar[:, [3, 5, 4]]  # l, h, w
                    anno['rotation_y'] = -gt_boxes_lidar[:, 6] - np.pi / 2
                else:
                    anno['location'] = np.zeros((0, 3))
                    anno['dimensions'] = np.zeros((0, 3))
                    anno['rotation_y'] = np.zeros(0)

        transform_to_kitti_format(eval_det_annos)
        transform_to_kitti_format(eval_gt_annos, is_gt=True)

        kitti_class_names = [map_name_to_kitti.get(x, x) for x in class_names]
        ap_result_str, ap_dict = kitti_eval.get_official_eval_result(
            gt_annos=eval_gt_annos, dt_annos=eval_det_annos,
            current_classes=kitti_class_names)
        return ap_result_str, ap_dict

    def waymo_eval(self, eval_det_annos, eval_gt_annos, class_names):
        """Official Waymo metrics (needs tensorflow + waymo_open_dataset)."""
        try:
            from .waymo_eval import OpenPCDetWaymoDetectionMetricsEstimator
        except ImportError as e:
            return ('waymo_open_dataset not available (%s); '
                    'use EVAL_METRIC: kitti' % e), {}
        eval_tool = OpenPCDetWaymoDetectionMetricsEstimator()
        ap_dict = eval_tool.waymo_evaluation(
            eval_det_annos, eval_gt_annos, class_name=class_names,
            distance_thresh=1000,
            fake_gt_infos=self.dataset_cfg.get('INFO_WITH_FAKELIDAR', False))
        ap_result_str = '\n'
        for key in ap_dict:
            ap_dict[key] = ap_dict[key][0]
            ap_result_str += '%s: %.4f \n' % (key, ap_dict[key])
        return ap_result_str, ap_dict

    def evaluation(self, det_annos, class_names, **kwargs):
        if 'annos' not in self.infos[0].keys():
            return 'No ground-truth boxes for evaluation', {}
        eval_det_annos = copy.deepcopy(det_annos)
        eval_gt_annos = [copy.deepcopy(info['annos']) for info in self.infos]
        metric = kwargs.get('eval_metric', 'kitti')
        if metric == 'kitti':
            return self.kitti_eval(eval_det_annos, eval_gt_annos, class_names)
        elif metric == 'waymo':
            return self.waymo_eval(eval_det_annos, eval_gt_annos, class_names)
        raise NotImplementedError(metric)
