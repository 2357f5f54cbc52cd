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
