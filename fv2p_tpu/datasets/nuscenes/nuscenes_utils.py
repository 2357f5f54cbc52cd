"""nuScenes submission helpers (reference
``pcdet/datasets/nuscenes/nuscenes_utils.py:383-500``): lidar boxes ->
global-frame nuScenes annotations + result formatting. All devkit imports
are deferred — this module is importable without ``nuscenes-devkit``."""
import numpy as np

# most-likely attribute per detection class, used when motion heuristics are
# inconclusive (reference cls_attr_dist :43-120 — we keep only the argmax)
DEFAULT_ATTR = {
    'car': 'vehicle.parked',
    'truck': 'vehicle.parked',
    'construction_vehicle': 'vehicle.parked',
    'bus': 'vehicle.stopped',
    'trailer': 'vehicle.parked',
    'barrier': '',
    'motorcycle': 'cycle.without_rider',
    'bicycle': 'cycle.without_rider',
    'pedestrian': 'pedestrian.standing',
    'traffic_cone': '',
    'ignore': '',
}


def boxes_lidar_to_nuscenes(det_info):
    from nuscenes.utils.data_classes import Box
    from pyquaternion import Quaternion
    boxes3d = det_info['boxes_lidar']
    scores = det_info['score']
    labels = det_info['pred_labels']
    box_list = []
    for k in range(boxes3d.shape[0]):
        quat = Quaternion(axis=[0, 0, 1], radians=boxes3d[k, 6])
        velocity = (*boxes3d[k, 7:9], 0.0) if boxes3d.shape[1] == 9 \
            else (0.0, 0.0, 0.0)
        box_list.append(Box(
            boxes3d[k, :3], boxes3d[k, [4, 3, 5]],  # wlh
            quat, label=int(labels[k]), score=float(scores[k]),
            velocity=velocity))
    return box_list


def lidar_nusc_box_to_global(nusc, boxes, sample_token):
    from pyquaternion import Quaternion
    s_record = nusc.get('sample', sample_token)
    sd_record = nusc.get('sample_data', s_record['data']['LIDAR_TOP'])
    cs_record = nusc.get('calibrated_sensor',
                         sd_record['calibrated_sensor_token'])
    pose_record = nusc.get('ego_pose', sd_record['ego_pose_token'])
    out = []
    for box in boxes:
        box.rotate(Quaternion(cs_record['rotation']))
        box.translate(np.array(cs_record['translation']))
        box.rotate(Quaternion(pose_record['rotation']))
        box.translate(np.array(pose_record['translation']))
        out.append(box)
    return out


def transform_det_annos_to_nusc_annos(det_annos, nusc):
    nusc_annos = {'results': {}, 'meta': None}
    for det in det_annos:
        annos = []
        boxes = lidar_nusc_box_to_global(
            nusc, boxes_lidar_to_nuscenes(det), det['metadata']['token'])
        for k, box in enumerate(boxes):
            name = det['name'][k]
            if np.sqrt(box.velocity[0] ** 2 + box.velocity[1] ** 2) > 0.2:
                if name in ('car', 'construction_vehicle', 'bus', 'truck',
                            'trailer'):
                    attr = 'vehicle.moving'
                elif name in ('bicycle', 'motorcycle'):
                    attr = 'cycle.with_rider'
                else:
                    attr = DEFAULT_ATTR.get(name, '')
            else:
                if name == 'pedestrian':
                    attr = 'pedestrian.standing'
                elif name == 'bus':
                    attr = 'vehicle.stopped'
                else:
                    attr = DEFAULT_ATTR.get(name, '')
            annos.append({
                'sample_token': det['metadata']['token'],
                'translation': box.center.tolist(),
                'size': box.wlh.tolist(),
                'rotation': box.orientation.elements.tolist(),
                'velocity': box.velocity[:2].tolist(),
                'detection_name': name,
                'detection_score': box.score,
                'attribute_name': attr,
            })
        nusc_annos['results'][det['metadata']['token']] = annos
    return nusc_annos


def format_nuscene_results(metrics, class_names, version='default'):
    result = '----------------Nuscene %s results-----------------\n' % version
    for name in class_names:
        threshs = ', '.join(metrics['label_aps'][name].keys())
        ap_list = list(metrics['label_aps'][name].values())
        err_name = ', '.join(x.split('_')[0]
                             for x in metrics['label_tp_errors'][name])
        error_list = list(metrics['label_tp_errors'][name].values())
        result += f'***{name} error@{err_name} | AP@{threshs}\n'
        result += ', '.join('%.2f' % x for x in error_list) + ' | '
        result += ', '.join('%.2f' % (x * 100) for x in ap_list)
        result += f" | mean AP: {metrics['mean_dist_aps'][name]}\n"
    result += '--------------average performance-------------\n'
    details = {}
    for key, val in metrics['tp_errors'].items():
        result += '%s:\t %.4f\n' % (key, val)
        details[key] = val
    result += 'mAP:\t %.4f\n' % metrics['mean_ap']
    result += 'NDS:\t %.4f\n' % metrics['nd_score']
    details.update(mAP=metrics['mean_ap'], NDS=metrics['nd_score'])
    return result, details


# general annotation name -> 10-class detection name (reference :14-41)
map_name_from_general_to_detection = {
    'human.pedestrian.adult': 'pedestrian',
    'human.pedestrian.child': 'pedestrian',
    'human.pedestrian.wheelchair': 'ignore',
    'human.pedestrian.stroller': 'ignore',
    'human.pedestrian.personal_mobility': 'ignore',
    'human.pedestrian.police_officer': 'pedestrian',
    'human.pedestrian.construction_worker': 'pedestrian',
    'animal': 'ignore',
    'vehicle.car': 'car',
    'vehicle.motorcycle': 'motorcycle',
    'vehicle.bicycle': 'bicycle',
    'vehicle.bus.bendy': 'bus',
    'vehicle.bus.rigid': 'bus',
    'vehicle.truck': 'truck',
    'vehicle.construction': 'construction_vehicle',
    'vehicle.emergency.ambulance': 'ignore',
    'vehicle.emergency.police': 'ignore',
    'vehicle.trailer': 'trailer',
    'movable_object.barrier': 'barrier',
    'movable_object.trafficcone': 'traffic_cone',
    'movable_object.pushable_pullable': 'ignore',
    'movable_object.debris': 'ignore',
    'static_object.bicycle_rack': 'ignore',
}


def get_available_scenes(nusc):
    """Scenes whose first lidar frame exists on disk (reference :157-183)."""
    from pathlib import Path
    available_scenes = []
    for scene in nusc.scene:
        sample_rec = nusc.get('sample', scene['first_sample_token'])
        sd_rec = nusc.get('sample_data', sample_rec['data']['LIDAR_TOP'])
        lidar_path, _, _ = nusc.get_sample_data(sd_rec['token'])
        if Path(lidar_path).exists():
            available_scenes.append(scene)
    print('exist scene num: %d / %d' % (len(available_scenes), len(nusc.scene)))
    return available_scenes


def quaternion_yaw(q):
    """Yaw of a lidar/global-frame box quaternion (reference :234-249)."""
    v = np.dot(q.rotation_matrix, np.array([1, 0, 0]))
    return np.arctan2(v[1], v[0])


def get_sample_data(nusc, sample_data_token, selected_anntokens=None):
    """Data path + annotation boxes transformed into the sensor frame
    (reference :185-231)."""
    from pyquaternion import Quaternion
    sd_record = nusc.get('sample_data', sample_data_token)
    cs_record = nusc.get('calibrated_sensor',
                         sd_record['calibrated_sensor_token'])
    sensor_record = nusc.get('sensor', cs_record['sensor_token'])
    pose_record = nusc.get('ego_pose', sd_record['ego_pose_token'])
    data_path = nusc.get_sample_data_path(sample_data_token)
    cam_intrinsic = np.array(cs_record['camera_intrinsic']) \
        if sensor_record['modality'] == 'camera' else None

    if selected_anntokens is not None:
        boxes = list(map(nusc.get_box, selected_anntokens))
    else:
        boxes = nusc.get_boxes(sample_data_token)
    box_list = []
    for box in boxes:
        box.velocity = nusc.box_velocity(box.token)
        box.translate(-np.array(pose_record['translation']))
        box.rotate(Quaternion(pose_record['rotation']).inverse)
        box.translate(-np.array(cs_record['translation']))
        box.rotate(Quaternion(cs_record['rotation']).inverse)
        box_list.append(box)
    return data_path, box_list, cam_intrinsic


def fill_trainval_infos(data_path, nusc, train_scenes, val_scenes, test=False,
                        max_sweeps=10):
    """Build per-sample info dicts with (max_sweeps-1) past lidar sweeps and
    lidar-frame gt boxes [x y z dx dy dz yaw vx vy] (reference :252-380)."""
    from functools import reduce
    from pathlib import Path

    from nuscenes.utils.geometry_utils import transform_matrix
    from pyquaternion import Quaternion

    train_nusc_infos, val_nusc_infos = [], []
    for sample in nusc.sample:
        ref_sd_token = sample['data']['LIDAR_TOP']
        ref_sd_rec = nusc.get('sample_data', ref_sd_token)
        ref_cs_rec = nusc.get('calibrated_sensor',
                              ref_sd_rec['calibrated_sensor_token'])
        ref_pose_rec = nusc.get('ego_pose', ref_sd_rec['ego_pose_token'])
        ref_time = 1e-6 * ref_sd_rec['timestamp']
        ref_lidar_path, ref_boxes, _ = get_sample_data(nusc, ref_sd_token)
        ref_cam_path, _, ref_cam_intrinsic = nusc.get_sample_data(
            sample['data']['CAM_FRONT'])
        ref_from_car = transform_matrix(
            ref_cs_rec['translation'], Quaternion(ref_cs_rec['rotation']),
            inverse=True)
        car_from_global = transform_matrix(
            ref_pose_rec['translation'], Quaternion(ref_pose_rec['rotation']),
            inverse=True)

        info = {
            'lidar_path': str(Path(ref_lidar_path).relative_to(data_path)),
            'cam_front_path': str(Path(ref_cam_path).relative_to(data_path)),
            'cam_intrinsic': ref_cam_intrinsic,
            'token': sample['token'],
            'sweeps': [],
            'ref_from_car': ref_from_car,
            'car_from_global': car_from_global,
            'timestamp': ref_time,
        }

        curr_sd_rec = nusc.get('sample_data', sample['data']['LIDAR_TOP'])
        sweeps = []
        while len(sweeps) < max_sweeps - 1:
            if curr_sd_rec['prev'] == '':
                if len(sweeps) == 0:
                    sweeps.append({
                        'lidar_path': info['lidar_path'],
                        'sample_data_token': curr_sd_rec['token'],
                        'transform_matrix': None,
                        'time_lag': 0.0,
                    })
                else:
                    sweeps.append(sweeps[-1])
            else:
                curr_sd_rec = nusc.get('sample_data', curr_sd_rec['prev'])
                current_pose_rec = nusc.get('ego_pose',
                                            curr_sd_rec['ego_pose_token'])
                global_from_car = transform_matrix(
                    current_pose_rec['translation'],
                    Quaternion(current_pose_rec['rotation']), inverse=False)
                current_cs_rec = nusc.get(
                    'calibrated_sensor', curr_sd_rec['calibrated_sensor_token'])
                car_from_current = transform_matrix(
                    current_cs_rec['translation'],
                    Quaternion(current_cs_rec['rotation']), inverse=False)
                tm = reduce(np.dot, [ref_from_car, car_from_global,
                                     global_from_car, car_from_current])
                lidar_path = nusc.get_sample_data_path(curr_sd_rec['token'])
                sweeps.append({
                    'lidar_path': str(Path(lidar_path).relative_to(data_path)),
                    'sample_data_token': curr_sd_rec['token'],
                    'transform_matrix': tm,
                    'global_from_car': global_from_car,
                    'car_from_current': car_from_current,
                    'time_lag': ref_time - 1e-6 * curr_sd_rec['timestamp'],
                })
        info['sweeps'] = sweeps

        if not test:
            annotations = [nusc.get('sample_annotation', token)
                           for token in sample['anns']]
            num_lidar_pts = np.array([a['num_lidar_pts'] for a in annotations])
            num_radar_pts = np.array([a['num_radar_pts'] for a in annotations])
            mask = (num_lidar_pts + num_radar_pts > 0)

            locs = np.array([b.center for b in ref_boxes]).reshape(-1, 3)
            # wlh -> dx dy dz (lwh)
            dims = np.array([b.wlh for b in ref_boxes]).reshape(-1, 3)[:, [1, 0, 2]]
            velocity = np.array([b.velocity for b in ref_boxes]).reshape(-1, 3)
            rots = np.array([quaternion_yaw(b.orientation)
                             for b in ref_boxes]).reshape(-1, 1)
            names = np.array([b.name for b in ref_boxes])
            tokens = np.array([b.token for b in ref_boxes])
            gt_boxes = np.concatenate([locs, dims, rots, velocity[:, :2]],
                                      axis=1)
            info['gt_boxes'] = gt_boxes[mask, :]
            info['gt_boxes_velocity'] = velocity[mask, :]
            info['gt_names'] = np.array([
                map_name_from_general_to_detection[name]
                for name in names])[mask]
            info['gt_boxes_token'] = tokens[mask]
            info['num_lidar_pts'] = num_lidar_pts[mask]
            info['num_radar_pts'] = num_radar_pts[mask]

        if sample['scene_token'] in train_scenes:
            train_nusc_infos.append(info)
        else:
            val_nusc_infos.append(info)
    return train_nusc_infos, val_nusc_infos
