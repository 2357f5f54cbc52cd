"""Generate a tiny synthetic nuScenes tree (info pkls + .bin lidar + gt
database) so the nuScenes pipeline — info pkl -> CBGS resampling ->
__getitem__ (multi-sweep) -> fixed-shape batch -> multihead forward — can be
driven without the nuscenes-devkit or real data. NOT part of the reference
surface — a development fixture (mirrors tools/make_synthetic_kitti.py)."""
import pickle
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CLASSES = ['car', 'truck', 'construction_vehicle', 'bus', 'trailer',
           'barrier', 'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone']
DIMS = {'car': (4.6, 1.9, 1.7), 'truck': (6.9, 2.5, 2.8),
        'construction_vehicle': (6.4, 2.7, 3.2), 'bus': (11.0, 2.9, 3.5),
        'trailer': (12.3, 2.9, 3.9), 'barrier': (0.5, 2.5, 1.0),
        'motorcycle': (2.1, 0.8, 1.5), 'bicycle': (1.7, 0.6, 1.3),
        'pedestrian': (0.7, 0.7, 1.8), 'traffic_cone': (0.4, 0.4, 1.1)}


def _frame(rng, objs, n=25000):
    """(n, 5) [x, y, z, intensity, ring/timestamp-slot] raw lidar."""
    pts = np.zeros((n, 5), np.float32)
    pts[:, 0] = rng.uniform(-50.0, 50.0, n)
    pts[:, 1] = rng.uniform(-50.0, 50.0, n)
    pts[:, 2] = rng.uniform(-3.0, 2.0, n)
    pts[:, 3] = rng.rand(n) * 255
    cursor = 0
    for (cx, cy, name) in objs:
        l, w, h = DIMS[name]
        m = 300 if name in ('car', 'truck', 'bus') else 100
        sl = slice(cursor, cursor + m)
        cursor += m
        pts[sl, 0] = rng.uniform(cx - l / 2, cx + l / 2, m)
        pts[sl, 1] = rng.uniform(cy - w / 2, cy + w / 2, m)
        pts[sl, 2] = rng.uniform(-1.8, -1.8 + h, m)
    return pts


def main(root=None, n_train=4, n_val=2, seed=0):
    # NuScenesDataset roots itself at DATA_PATH / VERSION
    root = Path(root or (REPO / 'data' / 'nuscenes' / 'v1.0-trainval'))
    rng = np.random.RandomState(seed)
    (root / 'samples' / 'LIDAR_TOP').mkdir(parents=True, exist_ok=True)

    split_infos = {'train': [], 'val': []}
    for i in range(n_train + n_val):
        split = 'train' if i < n_train else 'val'
        name = 'synth_%04d' % i
        # every class in every frame (gt_sampling needs every SAMPLE_GROUPS
        # class in the db), so CBGS duplicates each frame
        # int(frac * class-frame pairs) = 4x per class (epoch grows 4 -> 40)
        objs = [(12.0 + 3 * i, 4.0, 'car'),
                (-18.0 + 2 * i, -6.0, 'car')]
        for ci, cname in enumerate(CLASSES[1:]):
            ang = 2 * np.pi * ci / 9
            objs.append((30.0 * np.cos(ang) + i, 30.0 * np.sin(ang), cname))
        pts = _frame(rng, objs)
        rel = 'samples/LIDAR_TOP/%s.bin' % name
        pts.astype(np.float32).tofile(root / rel)
        n_obj = len(objs)
        boxes = np.zeros((n_obj, 9), np.float32)
        for j, (cx, cy, cname) in enumerate(objs):
            l, w, h = DIMS[cname]
            boxes[j] = [cx, cy, -1.8 + h / 2, l, w, h, 0.0, 0.0, 0.0]
        counts = np.array([300 if o[2] in ('car', 'truck', 'bus') else 100
                           for o in objs])
        split_infos[split].append({
            'lidar_path': rel,
            'token': 'token_%04d' % i,
            'sweeps': [],
            'gt_boxes': boxes,
            'gt_names': np.array([o[2] for o in objs]),
            'num_lidar_pts': counts,
        })

    for split, infos in split_infos.items():
        with open(root / ('nuscenes_infos_10sweeps_%s.pkl' % split), 'wb') as f:
            pickle.dump(infos, f)

    from fv2p_tpu.config import EasyDict, cfg_from_yaml_file
    cfg = EasyDict()
    cfg_from_yaml_file(
        str(REPO / 'tools/cfgs/dataset_configs/nuscenes_dataset.yaml'), cfg)
    from fv2p_tpu.datasets.nuscenes.nuscenes_dataset import NuScenesDataset
    # training=False: the train ctor builds the gt_sampling augmentor, which
    # needs the very db this call creates
    ds = NuScenesDataset(cfg, CLASSES, training=False,
                         root_path=root.parent)  # ctor re-appends VERSION
    ds.infos = split_infos['train']
    ds.create_groundtruth_database(max_sweeps=10)
    print('synthetic nuScenes tree at', root)


if __name__ == '__main__':
    main(*(sys.argv[1:2]))
