"""nuScenes dataset (reference
``pcdet/datasets/nuscenes/nuscenes_dataset.py:13-299``): info-pkl loading,
CBGS class-balanced resampling, multi-sweep lidar aggregation with per-point
time lag, prediction dicts, and devkit-backed evaluation (import-gated — the
nuscenes devkit is optional)."""
import copy
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class NuScenesDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        root_path = (root_path if root_path is not None
                     else Path(dataset_cfg.DATA_PATH)) / dataset_cfg.VERSION
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.infos = []
        self.include_nuscenes_data(self.mode)
        if self.training and self.dataset_cfg.get('BALANCED_RESAMPLING', False):
            self.infos = self.balanced_infos_resampling(self.infos)

    def include_nuscenes_data(self, mode):
        infos = []
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            p = self.root_path / info_path
            if not p.exists():
                continue
            with open(p, 'rb') as f:
                infos.extend(pickle.load(f))
        self.infos.extend(infos)
        if self.logger is not None:
            self.logger.info('Total samples for NuScenes dataset: %d'
                             % len(infos))

    def balanced_infos_resampling(self, infos):
        """CBGS class-balanced resampling (reference :39-75,
        https://arxiv.org/abs/1908.09492): duplicate frames so every class
        contributes ~1/C of the samples."""
        if self.class_names is None:
            return infos
        cls_infos = {name: [] for name in self.class_names}
        for info in infos:
            for name in set(info['gt_names']):
                if name in self.class_names:
                    cls_infos[name].append(info)
        duplicated = sum(len(v) for v in cls_infos.values())
        if duplicated == 0:
            return infos
        cls_dist = {k: len(v) / duplicated for k, v in cls_infos.items()}
        frac = 1.0 / len(self.class_names)
        sampled = []
        for cur, ratio in zip(cls_infos.values(),
                              [frac / max(v, 1e-9) for v in cls_dist.values()]):
            if len(cur) == 0:
                continue
            idx = np.random.choice(len(cur), int(len(cur) * ratio))
            sampled += [cur[i] for i in idx]
        if self.logger is not None:
            self.logger.info('Total samples after balanced resampling: %d'
                             % len(sampled))
        return sampled

    def get_sweep(self, sweep_info):
        def remove_ego_points(points, center_radius=1.0):
            mask = ~((np.abs(points[:, 0]) < center_radius)
                     & (np.abs(points[:, 1]) < center_radius))
            return points[mask]

        lidar_path = self.root_path / sweep_info['lidar_path']
        pts = np.fromfile(str(lidar_path), dtype=np.float32,
                          count=-1).reshape([-1, 5])[:, :4]
        pts = remove_ego_points(pts).T
        if sweep_info['transform_matrix'] is not None:
            n = pts.shape[1]
            pts[:3, :] = sweep_info['transform_matrix'].dot(
                np.vstack((pts[:3, :], np.ones(n))))[:3, :]
        times = sweep_info['time_lag'] * np.ones((1, pts.shape[1]))
        return pts.T, times.T

    def get_lidar_with_sweeps(self, index, max_sweeps=1):
        info = self.infos[index]
        lidar_path = self.root_path / info['lidar_path']
        points = np.fromfile(str(lidar_path), dtype=np.float32,
                             count=-1).reshape([-1, 5])[:, :4]
        sweep_points = [points]
        sweep_times = [np.zeros((points.shape[0], 1))]
        n_avail = len(info['sweeps'])
        if n_avail > 0 and max_sweeps > 1:
            for k in np.random.choice(n_avail, min(max_sweeps - 1, n_avail),
                                      replace=False):
                p, t = self.get_sweep(info['sweeps'][k])
                sweep_points.append(p)
                sweep_times.append(t)
        points = np.concatenate(sweep_points, axis=0)
        times = np.concatenate(sweep_times, axis=0).astype(points.dtype)
        return np.concatenate((points, times), axis=1)

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, index):
        info = copy.deepcopy(self.infos[index])
        points = self.get_lidar_with_sweeps(
            index, max_sweeps=int(self.dataset_cfg.MAX_SWEEPS))
        input_dict = {
            'points': points,
            'frame_id': Path(info['lidar_path']).stem,
            'metadata': {'token': info['token']},
        }
        if 'gt_boxes' in info:
            if self.dataset_cfg.get('FILTER_MIN_POINTS_IN_GT', False):
                mask = (info['num_lidar_pts']
                        > self.dataset_cfg.FILTER_MIN_POINTS_IN_GT - 1)
            else:
                mask = None
            input_dict.update(
                gt_names=info['gt_names'] if mask is None
                else info['gt_names'][mask],
                gt_boxes=info['gt_boxes'] if mask is None
                else info['gt_boxes'][mask])

        data_dict = self.prepare_data(data_dict=input_dict)
        if self.dataset_cfg.get('SET_NAN_VELOCITY_TO_ZEROS', False) \
                and 'gt_boxes' in data_dict:
            gt = data_dict['gt_boxes']
            gt[np.isnan(gt)] = 0
            data_dict['gt_boxes'] = gt
        if not self.dataset_cfg.get('PRED_VELOCITY', True) \
                and 'gt_boxes' in data_dict:
            data_dict['gt_boxes'] = \
                data_dict['gt_boxes'][:, [0, 1, 2, 3, 4, 5, 6, -1]]
        return data_dict

    @staticmethod
    def generate_prediction_dicts(batch_dict, pred_dicts, class_names,
                                  output_path=None):
        def get_template_prediction(n):
            return {'name': np.zeros(n), 'score': np.zeros(n),
                    'boxes_lidar': np.zeros([n, 7]), 'pred_labels': np.zeros(n)}

        # accept both a per-sample list and the eval loop's dict of batched
        # arrays (same duality as KittiDataset.generate_prediction_dicts)
        if not isinstance(pred_dicts, list):
            bs = np.asarray(pred_dicts['pred_scores']).shape[0]
            pred_dicts = [{k: v[i] for k, v in pred_dicts.items()}
                          for i in range(bs)]
        annos = []
        for index, box_dict in enumerate(pred_dicts):
            valid = np.asarray(box_dict['pred_valid'])
            scores = np.asarray(box_dict['pred_scores'])[valid]
            boxes = np.asarray(box_dict['pred_boxes'])[valid]
            labels = np.asarray(box_dict['pred_labels'])[valid]
            d = get_template_prediction(scores.shape[0])
            if scores.shape[0] > 0:
                d['name'] = np.array(class_names)[labels - 1]
                d['score'] = scores
                d['boxes_lidar'] = boxes
                d['pred_labels'] = labels
            d['frame_id'] = batch_dict['frame_id'][index]
            if 'metadata' in batch_dict:
                d['metadata'] = batch_dict['metadata'][index]
            annos.append(d)
        return annos

    def create_groundtruth_database(self, used_classes=None, max_sweeps=10):
        """Crop per-object multi-sweep point clouds into the sampler database
        (reference :254-297); points-in-box test is host numpy instead of the
        reference's points_in_boxes_gpu CUDA kernel."""
        from ...utils import box_utils
        database_save_path = self.root_path \
            / f'gt_database_{max_sweeps}sweeps_withvelo'
        db_info_save_path = self.root_path \
            / f'nuscenes_dbinfos_{max_sweeps}sweeps_withvelo.pkl'
        database_save_path.mkdir(parents=True, exist_ok=True)
        all_db_infos = {}

        for idx in range(len(self.infos)):
            info = self.infos[idx]
            points = self.get_lidar_with_sweeps(idx, max_sweeps=max_sweeps)
            gt_boxes = info['gt_boxes']
            gt_names = info['gt_names']
            if gt_boxes.shape[0] == 0:
                continue
            in_bev = box_utils.in_box_bev_np(points[:, :2], gt_boxes[:, :7])
            dz = np.abs(points[None, :, 2] - gt_boxes[:, None, 2]) \
                <= gt_boxes[:, None, 5] / 2
            point_indices = in_bev & dz

            for i in range(gt_boxes.shape[0]):
                filename = '%s_%s_%d.bin' % (idx, gt_names[i], i)
                filepath = database_save_path / filename
                gt_points = points[point_indices[i] > 0]
                gt_points[:, :3] -= gt_boxes[i, :3]
                with open(filepath, 'w') as f:
                    gt_points.tofile(f)
                if (used_classes is None) or gt_names[i] in used_classes:
                    db_path = str(filepath.relative_to(self.root_path))
                    db_info = {'name': gt_names[i], 'path': db_path,
                               'image_idx': idx, 'gt_idx': i,
                               'box3d_lidar': gt_boxes[i],
                               'num_points_in_gt': gt_points.shape[0]}
                    all_db_infos.setdefault(gt_names[i], []).append(db_info)
        for k, v in all_db_infos.items():
            print('Database %s: %d' % (k, len(v)))
        with open(db_info_save_path, 'wb') as f:
            pickle.dump(all_db_infos, f)

    def evaluation(self, det_annos, class_names, **kwargs):
        """Official nuScenes eval via the devkit (reference :198-252) when
        installed; otherwise the native numpy re-implementation of the
        ``detection_cvpr_2019`` algorithm (``nuscenes_eval_native``) runs
        directly on det_annos vs ``self.infos`` — no NuScenes DB needed."""
        try:
            from nuscenes.nuscenes import NuScenes  # noqa: F401
        except ImportError:
            from .nuscenes_eval_native import nuscenes_detection_eval
            return nuscenes_detection_eval(det_annos, self.infos, class_names)
        import json

        from nuscenes.eval.detection.config import config_factory
        from nuscenes.eval.detection.evaluate import NuScenesEval
        from nuscenes.nuscenes import NuScenes

        from . import nuscenes_utils
        nusc = NuScenes(version=self.dataset_cfg.VERSION,
                        dataroot=str(self.root_path), verbose=True)
        nusc_annos = nuscenes_utils.transform_det_annos_to_nusc_annos(
            det_annos, nusc)
        nusc_annos['meta'] = {'use_camera': False, 'use_lidar': True,
                              'use_radar': False, 'use_map': False,
                              'use_external': False}
        output_path = Path(kwargs['output_path'])
        output_path.mkdir(exist_ok=True, parents=True)
        res_path = str(output_path / 'results_nusc.json')
        with open(res_path, 'w') as f:
            json.dump(nusc_annos, f)
        eval_set_map = {'v1.0-mini': 'mini_val', 'v1.0-trainval': 'val',
                        'v1.0-test': 'test'}
        eval_config = config_factory('detection_cvpr_2019')
        nusc_eval = NuScenesEval(
            nusc, config=eval_config, result_path=res_path,
            eval_set=eval_set_map[self.dataset_cfg.VERSION],
            output_dir=str(output_path), verbose=True)
        nusc_eval.main(plot_examples=0, render_curves=False)
        with open(output_path / 'metrics_summary.json', 'r') as f:
            metrics = json.load(f)
        result_str, result_dict = nuscenes_utils.format_nuscene_results(
            metrics, self.class_names)
        return result_str, result_dict


def create_nuscenes_info(version, data_path, save_path, max_sweeps=10):
    """Build split info pkls with the official scene splits (reference
    nuscenes_dataset.py:299-344)."""
    from nuscenes.nuscenes import NuScenes
    from nuscenes.utils import splits

    from . import nuscenes_utils
    data_path = data_path / version
    save_path = save_path / version
    assert version in ['v1.0-trainval', 'v1.0-test', 'v1.0-mini']
    if version == 'v1.0-trainval':
        train_scenes, val_scenes = splits.train, splits.val
    elif version == 'v1.0-test':
        train_scenes, val_scenes = splits.test, []
    else:
        train_scenes, val_scenes = splits.mini_train, splits.mini_val

    nusc = NuScenes(version=version, dataroot=data_path, verbose=True)
    available_scenes = nuscenes_utils.get_available_scenes(nusc)
    names = [s['name'] for s in available_scenes]
    train_scenes = set(available_scenes[names.index(s)]['token']
                       for s in train_scenes if s in names)
    val_scenes = set(available_scenes[names.index(s)]['token']
                     for s in val_scenes if s in names)
    print('%s: train scene(%d), val scene(%d)'
          % (version, len(train_scenes), len(val_scenes)))

    train_infos, val_infos = nuscenes_utils.fill_trainval_infos(
        data_path=data_path, nusc=nusc, train_scenes=train_scenes,
        val_scenes=val_scenes, test='test' in version, max_sweeps=max_sweeps)

    if version == 'v1.0-test':
        print('test sample: %d' % len(train_infos))
        with open(save_path / f'nuscenes_infos_{max_sweeps}sweeps_test.pkl',
                  'wb') as f:
            pickle.dump(train_infos, f)
    else:
        print('train sample: %d, val sample: %d'
              % (len(train_infos), len(val_infos)))
        with open(save_path / f'nuscenes_infos_{max_sweeps}sweeps_train.pkl',
                  'wb') as f:
            pickle.dump(train_infos, f)
        with open(save_path / f'nuscenes_infos_{max_sweeps}sweeps_val.pkl',
                  'wb') as f:
            pickle.dump(val_infos, f)


if __name__ == '__main__':
    import argparse

    import yaml

    from ...config import EasyDict
    from ...utils import common_utils

    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--cfg_file', type=str, default=None,
                        help='specify the config of dataset')
    parser.add_argument('--func', type=str, default='create_nuscenes_infos')
    parser.add_argument('--version', type=str, default='v1.0-trainval')
    args = parser.parse_args()
    if args.func == 'create_nuscenes_infos':
        dataset_cfg = EasyDict(yaml.safe_load(open(args.cfg_file)))
        ROOT_DIR = (Path(__file__).resolve().parent / '../../../').resolve()
        dataset_cfg.VERSION = args.version
        create_nuscenes_info(
            version=dataset_cfg.VERSION,
            data_path=ROOT_DIR / 'data' / 'nuscenes',
            save_path=ROOT_DIR / 'data' / 'nuscenes',
            max_sweeps=dataset_cfg.MAX_SWEEPS)
        nuscenes_dataset = NuScenesDataset(
            dataset_cfg=dataset_cfg, class_names=None,
            root_path=ROOT_DIR / 'data' / 'nuscenes',
            logger=common_utils.create_logger(), training=True)
        nuscenes_dataset.create_groundtruth_database(
            max_sweeps=dataset_cfg.MAX_SWEEPS)
