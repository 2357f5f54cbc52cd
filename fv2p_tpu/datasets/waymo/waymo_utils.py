"""Waymo tfrecord -> per-frame npy/pkl extraction (reference
``pcdet/datasets/waymo/waymo_utils.py``). Requires tensorflow +
waymo_open_dataset (import-gated: only needed for one-time preprocessing,
not for training/eval on the extracted data)."""
import pickle
from pathlib import Path

import numpy as np

try:
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2
    from waymo_open_dataset.utils import frame_utils, range_image_utils, \
        transform_utils
    _HAS_WAYMO = True
except ImportError:
    _HAS_WAYMO = False

WAYMO_CLASSES = ['unknown', 'Vehicle', 'Pedestrian', 'Sign', 'Cyclist']


def generate_labels(frame):
    obj_name, difficulty, dimensions, locations, heading_angles = [], [], [], [], []
    tracking_difficulty, speeds, accelerations, obj_ids = [], [], [], []
    num_points_in_gt = []
    laser_labels = frame.laser_labels
    for i in range(len(laser_labels)):
        box = laser_labels[i].box
        class_ind = laser_labels[i].type
        loc = [box.center_x, box.center_y, box.center_z]
        heading_angles.append(box.heading)
        obj_name.append(WAYMO_CLASSES[class_ind])
        difficulty.append(laser_labels[i].detection_difficulty_level)
        tracking_difficulty.append(laser_labels[i].tracking_difficulty_level)
        dimensions.append([box.length, box.width, box.height])
        locations.append(loc)
        obj_ids.append(laser_labels[i].id)
        num_points_in_gt.append(laser_labels[i].num_lidar_points_in_box)

    annotations = {
        'name': np.array(obj_name), 'difficulty': np.array(difficulty),
        'dimensions': np.array(dimensions), 'location': np.array(locations),
        'heading_angles': np.array(heading_angles),
        'obj_ids': np.array(obj_ids),
        'tracking_difficulty': np.array(tracking_difficulty),
        'num_points_in_gt': np.array(num_points_in_gt),
    }
    if annotations['name'].__len__() > 0:
        gt_boxes_lidar = np.concatenate([
            annotations['location'], annotations['dimensions'],
            annotations['heading_angles'][..., np.newaxis]], axis=1)
    else:
        gt_boxes_lidar = np.zeros((0, 7))
    annotations['gt_boxes_lidar'] = gt_boxes_lidar
    return annotations


def convert_range_image_to_point_cloud(frame, range_images, camera_projections,
                                       range_image_top_pose, ri_index=0):
    """Range images -> per-return point clouds with intensity/elongation/NLZ."""
    calibrations = sorted(frame.context.laser_calibrations,
                          key=lambda c: c.name)
    points, cp_points = [], []
    points_NLZ, points_intensity, points_elongation = [], [], []

    frame_pose = tf.convert_to_tensor(
        np.reshape(np.array(frame.pose.transform), [4, 4]))
    range_image_top_pose_tensor = tf.reshape(
        tf.convert_to_tensor(range_image_top_pose.data),
        range_image_top_pose.shape.dims)
    range_image_top_pose_rotation = transform_utils.get_rotation_matrix(
        range_image_top_pose_tensor[..., 0],
        range_image_top_pose_tensor[..., 1],
        range_image_top_pose_tensor[..., 2])
    range_image_top_pose_translation = range_image_top_pose_tensor[..., 3:]
    range_image_top_pose_tensor = transform_utils.get_transform(
        range_image_top_pose_rotation, range_image_top_pose_translation)

    for c in calibrations:
        range_image = range_images[c.name][ri_index]
        if len(c.beam_inclinations) == 0:
            beam_inclinations = range_image_utils.compute_inclination(
                tf.constant([c.beam_inclination_min, c.beam_inclination_max]),
                height=range_image.shape.dims[0])
        else:
            beam_inclinations = tf.constant(c.beam_inclinations)
        beam_inclinations = tf.reverse(beam_inclinations, axis=[-1])
        extrinsic = np.reshape(np.array(c.extrinsic.transform), [4, 4])

        range_image_tensor = tf.reshape(
            tf.convert_to_tensor(range_image.data), range_image.shape.dims)
        pixel_pose_local = None
        frame_pose_local = None
        if c.name == dataset_pb2.LaserName.TOP:
            pixel_pose_local = tf.expand_dims(range_image_top_pose_tensor, 0)
            frame_pose_local = tf.expand_dims(frame_pose, 0)
        range_image_mask = range_image_tensor[..., 0] > 0
        range_image_NLZ = range_image_tensor[..., 3]
        range_image_intensity = range_image_tensor[..., 1]
        range_image_elongation = range_image_tensor[..., 2]
        range_image_cartesian = range_image_utils.extract_point_cloud_from_range_image(
            tf.expand_dims(range_image_tensor[..., 0], axis=0),
            tf.expand_dims(extrinsic, axis=0),
            tf.expand_dims(tf.convert_to_tensor(beam_inclinations), axis=0),
            pixel_pose=pixel_pose_local, frame_pose=frame_pose_local)

        range_image_cartesian = tf.squeeze(range_image_cartesian, axis=0)
        points_tensor = tf.gather_nd(range_image_cartesian,
                                     tf.where(range_image_mask))
        points_NLZ_tensor = tf.gather_nd(
            range_image_NLZ, tf.compat.v1.where(range_image_mask))
        points_intensity_tensor = tf.gather_nd(
            range_image_intensity, tf.compat.v1.where(range_image_mask))
        points_elongation_tensor = tf.gather_nd(
            range_image_elongation, tf.compat.v1.where(range_image_mask))

        points.append(points_tensor.numpy())
        points_NLZ.append(points_NLZ_tensor.numpy())
        points_intensity.append(points_intensity_tensor.numpy())
        points_elongation.append(points_elongation_tensor.numpy())

    return points, points_intensity, points_elongation, points_NLZ


def save_lidar_points(frame, cur_save_path):
    (range_images, camera_projections, range_image_top_pose) = \
        frame_utils.parse_range_image_and_camera_projection(frame)
    points, points_intensity, points_elongation, points_NLZ = \
        convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, range_image_top_pose)

    points_all = np.concatenate(points, axis=0)
    points_intensity = np.concatenate(points_intensity, axis=0).reshape(-1, 1)
    points_elongation = np.concatenate(points_elongation, axis=0).reshape(-1, 1)
    points_NLZ = np.concatenate(points_NLZ, axis=0).reshape(-1, 1)

    save_points = np.concatenate(
        [points_all, points_intensity, points_elongation, points_NLZ],
        axis=-1).astype(np.float32)
    np.save(cur_save_path, save_points)


def process_single_sequence(sequence_file, save_path, sampled_interval,
                            has_label=True):
    if not _HAS_WAYMO:
        raise ImportError('waymo_open_dataset + tensorflow are required for '
                          'tfrecord extraction')
    sequence_file = Path(sequence_file)
    sequence_name = sequence_file.stem.replace('.tfrecord', '')
    cur_save_dir = Path(save_path) / sequence_name
    cur_save_dir.mkdir(parents=True, exist_ok=True)
    pkl_file = cur_save_dir / ('%s.pkl' % sequence_name)
    if pkl_file.exists():
        with open(pkl_file, 'rb') as f:
            return pickle.load(f)

    dataset = tf.data.TFRecordDataset(str(sequence_file), compression_type='')
    sequence_infos = []
    for cnt, data in enumerate(dataset):
        if cnt % sampled_interval != 0:
            continue
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data.numpy()))

        info = {}
        pc_info = {'num_features': 5, 'lidar_sequence': sequence_name,
                   'sample_idx': cnt}
        info['point_cloud'] = pc_info
        info['frame_id'] = sequence_name + ('_%03d' % cnt)
        info['metadata'] = {
            'context_name': frame.context.name,
            'timestamp_micros': frame.timestamp_micros,
        }
        image_info = {}
        for j in range(5):
            width = frame.context.camera_calibrations[j].width
            height = frame.context.camera_calibrations[j].height
            image_info.update({'image_shape_%d' % j: (height, width)})
        info['image'] = image_info

        if has_label:
            info['annos'] = generate_labels(frame)

        save_lidar_points(frame, cur_save_dir / ('%04d.npy' % cnt))
        sequence_infos.append(info)

    with open(pkl_file, 'wb') as f:
        pickle.dump(sequence_infos, f)
    print('Infos are saved to %s' % pkl_file)
    return sequence_infos
