"""Shared builder for the flagship-config multi-device checks (VERDICT r3
item 6): the REAL yaml topology (mgaf-3dssd.yaml via its overfit child —
full DCN BEV backbone, CenterAF head, post_processing_withfgscores) with
reduced sparse capacities so the 8-virtual-CPU-device programs stay
CI-sized. Used by tests/test_flagship_multichip.py and tests/dist_worker.py
(DIST_MODE=flagship)."""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

MGAF_OVERFIT_YAML = 'tools/cfgs/kitti_models/MGAF-3DSSD/mgaf-3dssd_overfit.yaml'

# reduced-cap pins (n_cap=4096 scans): every level shape shrinks ~3x vs the
# committed 12000-voxel gate pins, keeping the batch-8 CPU programs fast
REDUCED_CAPS = {'x_conv1': 4096, 'x_conv2': 6144, 'x_conv3': 4096,
                'x_conv4': 2048, 'out': 2048}
N_CAP = 4096
N_FILL = 3072


def build_flagship_reduced(split='test', batch_size=8, seed=0, with_gt=False):
    """Flagship-topology MGAF at 0.1 m voxels with reduced caps.

    Returns (cfg, model, batch) — batch is a dict of numpy arrays with
    leading batch axis (host rulebooks attached), ready for jnp.asarray or
    shard_batch_global."""
    from fv2p_tpu.config import EasyDict, cfg_from_yaml_file
    from fv2p_tpu.datasets import dataset_meta_from_cfg
    from fv2p_tpu.models import build_network

    import __graft_entry__ as ge

    cfg = EasyDict()
    cfg_from_yaml_file(str(REPO / MGAF_OVERFIT_YAML), cfg)
    vox = [p for p in cfg.DATA_CONFIG.DATA_PROCESSOR
           if p.NAME == 'transform_points_to_voxels'][0]
    vox.MAX_NUMBER_OF_VOXELS = {'train': N_CAP, 'test': N_CAP}
    cfg.MODEL.BACKBONE_3D.LEVEL_CAPACITIES = {
        'train': dict(REDUCED_CAPS), 'test': dict(REDUCED_CAPS)}

    meta = dataset_meta_from_cfg(cfg.DATA_CONFIG, split)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          class_names=cfg.CLASS_NAMES, dataset_meta=meta)
    batch = ge._synthetic_batch(meta, batch_size=batch_size, n_cap=N_CAP,
                                n_fill=N_FILL, seed=seed, with_gt=with_gt,
                                max_objs=10, host_rulebooks=True,
                                backbone=cfg.MODEL.BACKBONE_3D.NAME)
    batch_np = {}
    for k, v in batch.items():
        if isinstance(v, dict):
            batch_np[k] = {kk: np.asarray(vv) for kk, vv in v.items()}
        else:
            batch_np[k] = np.asarray(v)
    return cfg, model, batch_np
