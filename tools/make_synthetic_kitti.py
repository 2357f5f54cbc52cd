"""Generate a tiny synthetic KITTI tree (velodyne/calib/label/image_2 stubs +
infos + gt database) so tools/train.py / test.py can be driven without the
real dataset. NOT part of the reference surface — a development fixture."""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(root=None, n_train=4, n_val=2, seed=0):
    root = Path(root or (REPO / 'data' / 'kitti'))
    rng = np.random.RandomState(seed)
    (root / 'ImageSets').mkdir(parents=True, exist_ok=True)
    for sub in ['velodyne', 'calib', 'label_2', 'image_2', 'planes']:
        (root / 'training' / sub).mkdir(parents=True, exist_ok=True)

    ids = ['%06d' % i for i in range(n_train + n_val)]
    (root / 'ImageSets' / 'train.txt').write_text(
        '\n'.join(ids[:n_train]) + '\n')
    (root / 'ImageSets' / 'val.txt').write_text(
        '\n'.join(ids[n_train:]) + '\n')

    # identity-ish calib: velodyne == rect camera frame up to axis remap
    calib_txt = '\n'.join([
        'P0: 700 0 600 0 0 700 180 0 0 0 1 0',
        'P1: 700 0 600 0 0 700 180 0 0 0 1 0',
        'P2: 700 0 600 0 0 700 180 0 0 0 1 0',
        'P3: 700 0 600 0 0 700 180 0 0 0 1 0',
        'R0_rect: 1 0 0 0 1 0 0 0 1',
        'Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0',
        'Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 0',
    ]) + '\n'

    for i, sid in enumerate(ids):
        n = 18000
        pts = np.zeros((n, 4), np.float32)
        pts[:, 0] = rng.uniform(0, 70.0, n)
        pts[:, 1] = rng.uniform(-39.0, 39.0, n)
        pts[:, 2] = rng.uniform(-2.5, 0.5, n)
        pts[:, 3] = rng.rand(n)
        # plant 2 cars + 1 pedestrian per scan
        objs = []
        for (cx, cy, l, w, h, name) in [
                (10 + 3 * i, 2.0, 3.9, 1.6, 1.56, 'Car'),
                (20 + 2 * i, -4.0, 3.9, 1.6, 1.56, 'Car'),
                (15 + i, 6.0, 0.8, 0.6, 1.73, 'Pedestrian')]:
            m = 300 if name == 'Car' else 80
            sl = slice(len(objs) * 300, len(objs) * 300 + m)
            pts[sl, 0] = rng.uniform(cx - l / 2, cx + l / 2, m)
            pts[sl, 1] = rng.uniform(cy - w / 2, cy + w / 2, m)
            pts[sl, 2] = rng.uniform(-1.6, -1.6 + h, m)
            # KITTI label (camera frame): x_cam = -y_velo, y_cam = -z_velo,
            # z_cam = x_velo; location is the BOTTOM center
            loc_cam = (-cy, 1.6, cx)
            objs.append(
                f'{name} 0.00 0 0.0 100 100 200 200 '
                f'{h:.2f} {w:.2f} {l:.2f} '
                f'{loc_cam[0]:.2f} {loc_cam[1]:.2f} {loc_cam[2]:.2f} 0.00')
        pts.astype(np.float32).tofile(root / 'training' / 'velodyne' / f'{sid}.bin')
        (root / 'training' / 'calib' / f'{sid}.txt').write_text(calib_txt)
        (root / 'training' / 'label_2' / f'{sid}.txt').write_text(
            '\n'.join(objs) + '\n')
        # minimal png stub for image-shape reads (640x1280 header-only is not
        # enough; write a real tiny png via matplotlib-free minimal encoder)
        import struct, zlib
        wpx, hpx = 1280, 384
        row = b'\x00' + b'\x80' * wpx
        raw = zlib.compress(row * hpx)
        def chunk(tag, data):
            c = struct.pack('>I', len(data)) + tag + data
            return c + struct.pack('>I', zlib.crc32(tag + data) & 0xffffffff)
        png = (b'\x89PNG\r\n\x1a\n'
               + chunk(b'IHDR', struct.pack('>IIBBBBB', wpx, hpx, 8, 0, 0, 0, 0))
               + chunk(b'IDAT', raw) + chunk(b'IEND', b''))
        (root / 'training' / 'image_2' / f'{sid}.png').write_bytes(png)
        (root / 'training' / 'planes' / f'{sid}.txt').write_text(
            '# Plane\nWidth 4\nHeight 1\n0 -1 0 1.65\n')

    from fv2p_tpu.config import EasyDict, cfg_from_yaml_file
    cfg = EasyDict()
    cfg_from_yaml_file(str(REPO / 'tools/cfgs/dataset_configs/kitti_dataset.yaml'), cfg)
    from fv2p_tpu.datasets.kitti.kitti_dataset import create_kitti_infos
    create_kitti_infos(cfg, ['Car', 'Pedestrian', 'Cyclist'], root, root,
                       workers=2)
    print('synthetic KITTI tree at', root)


if __name__ == '__main__':
    main(*(sys.argv[1:2]))
