"""Generate a tiny synthetic Waymo tree (per-sequence info pkls + per-frame
.npy lidar + gt database) so the Waymo pipeline — info pkl -> __getitem__ ->
fixed-shape batch -> large-grid model forward -> kitti-style eval — can be
driven without tensorflow or real tfrecords. NOT part of the reference
surface — a development fixture (mirrors tools/make_synthetic_kitti.py)."""
import pickle
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _frame_points(rng, objs, n=30000):
    """(n, 6) [x, y, z, intensity, elongation, NLZ(-1)] with planted objects."""
    pts = np.zeros((n, 6), np.float32)
    pts[:, 0] = rng.uniform(-70.0, 70.0, n)
    pts[:, 1] = rng.uniform(-70.0, 70.0, n)
    pts[:, 2] = rng.uniform(-1.8, 3.0, n)
    pts[:, 3] = rng.rand(n)
    pts[:, 4] = rng.rand(n)
    pts[:, 5] = -1.0
    cursor = 0
    for (cx, cy, l, w, h, name) in objs:
        m = 400 if name == 'Vehicle' else 120
        sl = slice(cursor, cursor + m)
        cursor += m
        # front-biased fill (75% of points in the heading-ward half): a
        # uniformly-filled box makes heading unobservable modulo pi, so the
        # rot head's bin CE saturates at ln2 and eval headings are a coin
        # flip (measured: Waymo APH 0.0094 at AP 1.0). Real vehicles are
        # asymmetric; this keeps the +-pi disambiguation learnable.
        n_front = int(m * 0.75)
        xs = np.concatenate([rng.uniform(cx, cx + l / 2, n_front),
                             rng.uniform(cx - l / 2, cx, m - n_front)])
        pts[sl, 0] = xs
        pts[sl, 1] = rng.uniform(cy - w / 2, cy + w / 2, m)
        pts[sl, 2] = rng.uniform(0.0, h, m)
    return pts


def main(root=None, n_train_seq=2, n_val_seq=1, n_frames=2, seed=0):
    root = Path(root or (REPO / 'data' / 'waymo'))
    rng = np.random.RandomState(seed)
    tag = 'waymo_processed_data'
    (root / 'ImageSets').mkdir(parents=True, exist_ok=True)

    seqs = ['segment-%07d_synth' % i for i in range(n_train_seq + n_val_seq)]
    (root / 'ImageSets' / 'train.txt').write_text(
        '\n'.join(s + '.tfrecord' for s in seqs[:n_train_seq]) + '\n')
    (root / 'ImageSets' / 'val.txt').write_text(
        '\n'.join(s + '.tfrecord' for s in seqs[n_train_seq:]) + '\n')

    all_train_infos = []
    for si, seq in enumerate(seqs):
        seq_dir = root / tag / seq
        seq_dir.mkdir(parents=True, exist_ok=True)
        infos = []
        for fi in range(n_frames):
            objs = [
                (12.0 + 4 * si + 2 * fi, 3.0, 4.7, 2.1, 1.7, 'Vehicle'),
                (-20.0 + 3 * fi, -8.0 - 2 * si, 4.7, 2.1, 1.7, 'Vehicle'),
                (8.0 + fi, -15.0, 0.9, 0.8, 1.8, 'Pedestrian'),
            ]
            pts = _frame_points(rng, objs)
            np.save(seq_dir / ('%04d.npy' % fi), pts)
            n_obj = len(objs)
            # z center: objects sit on z=0 ground, box center at h/2
            boxes = np.array([[cx, cy, h / 2, l, w, h, 0.0]
                              for cx, cy, l, w, h, _ in objs], np.float32)
            names = np.array([o[5] for o in objs])
            counts = np.array([400 if nm == 'Vehicle' else 120
                               for nm in names])
            infos.append({
                'point_cloud': {'lidar_sequence': seq, 'sample_idx': fi,
                                'num_features': 5},
                'frame_id': '%s_%03d' % (seq, fi),
                'metadata': {'context_name': seq, 'timestamp_micros': fi},
                'annos': {
                    'name': names,
                    'difficulty': np.zeros(n_obj, np.int32),
                    'dimensions': boxes[:, [3, 5, 4]],   # l, h, w
                    'location': boxes[:, :3],
                    'heading_angles': boxes[:, 6],
                    'obj_ids': np.array(['%s_obj%d' % (seq, i)
                                         for i in range(n_obj)]),
                    'tracking_difficulty': np.zeros(n_obj, np.int32),
                    'num_points_in_gt': counts,
                    'gt_boxes_lidar': boxes,
                },
            })
        with open(seq_dir / ('%s.pkl' % seq), 'wb') as f:
            pickle.dump(infos, f)
        if si < n_train_seq:
            all_train_infos.extend(infos)

    merged = root / ('waymo_infos_train.pkl')
    with open(merged, 'wb') as f:
        pickle.dump(all_train_infos, f)

    # gt database for the gt_sampling augmentor (TF-free path)
    from fv2p_tpu.config import EasyDict, cfg_from_yaml_file
    cfg = EasyDict()
    cfg_from_yaml_file(
        str(REPO / 'tools/cfgs/dataset_configs/waymo_dataset.yaml'), cfg)
    cfg.DATA_PATH = str(root)
    from fv2p_tpu.datasets.waymo.waymo_dataset import WaymoDataset
    # training=False: the train-mode ctor builds the gt_sampling augmentor,
    # which needs the very db this call creates
    ds = WaymoDataset(cfg, ['Vehicle', 'Pedestrian', 'Cyclist'],
                      training=False, root_path=root)
    ds.create_groundtruth_database(merged, root, split='train',
                                   sampled_interval=10,
                                   used_classes=['Vehicle', 'Pedestrian',
                                                 'Cyclist'])
    print('synthetic Waymo tree at', root)


if __name__ == '__main__':
    main(*(sys.argv[1:2]))
