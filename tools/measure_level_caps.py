"""Measure sparse level occupancy tails under the full train augmentor.

The per-mode LEVEL_CAPACITIES in the flagship yamls are measured numbers
(reference never truncates — pcdet spconv sizes buffers dynamically; our
fixed-shape programs must budget the tail instead). A finite measurement
underestimates the max: the r4 full-resolution MGAF gate run crashed after
~2000 augmented draws on x_conv3 = 18683 vs the cap 18432 that had been
sized from a shorter sweep. This tool draws N augmented samples through the
real dataset pipeline (gt-sampling + flip + rotation + scaling + voxelize)
and prints per-level max / p99 / suggested cap (max * (1+headroom) rounded
up to 512) so caps can be set with an explicit tail budget.

Usage:
  python tools/measure_level_caps.py --cfg_file cfgs/kitti_models/... \
      [--draws 400] [--headroom 0.15] [--seed 7]
"""
import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.chdir(Path(__file__).resolve().parent)

from fv2p_tpu.config import cfg, cfg_from_yaml_file
from fv2p_tpu.datasets import build_dataset
from fv2p_tpu.ops.sparse import host_rulebook


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', required=True)
    parser.add_argument('--draws', type=int, default=400)
    parser.add_argument('--headroom', type=float, default=0.15)
    parser.add_argument('--seed', type=int, default=7)
    args = parser.parse_args()

    cfg_from_yaml_file(args.cfg_file, cfg)
    np.random.seed(args.seed)

    dataset = build_dataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=True)
    # huge non-strict caps: we want the true ntotal, never a raise/truncate
    from fv2p_tpu.datasets import dataset_meta_from_cfg
    meta = dataset_meta_from_cfg(cfg.DATA_CONFIG, 'train')
    spec = host_rulebook.backbone_spec(
        cfg.MODEL.BACKBONE_3D.NAME, meta['grid_size'], meta['voxel_capacity'],
        caps_override={lvl: 200000 for lvl in
                       ('x_conv1', 'x_conv2', 'x_conv3', 'x_conv4', 'out')},
        strict=False)
    dataset.rulebook_spec = spec

    counts = {lvl: [] for lvl in spec['levels']}
    n = len(dataset)
    for i in range(args.draws):
        d = dataset[i % n]
        for lvl in spec['levels']:
            counts[lvl].append(int(d['_rb_sample'][f'ntotal_{lvl}']))
        if (i + 1) % 100 == 0:
            print(f'  ... {i + 1}/{args.draws}', flush=True)

    print(f'\n{args.draws} augmented draws over {n} scans '
          f'(voxel cap {meta["voxel_capacity"]}):')
    print(f'{"level":10s} {"max":>8s} {"p99":>8s} {"mean":>8s} '
          f'{"suggested cap":>14s}')
    for lvl in spec['levels']:
        a = np.array(counts[lvl])
        sug = int(np.ceil(a.max() * (1 + args.headroom) / 512) * 512)
        print(f'{lvl:10s} {a.max():8d} {int(np.percentile(a, 99)):8d} '
              f'{a.mean():8.0f} {sug:14d}')


if __name__ == '__main__':
    main()
