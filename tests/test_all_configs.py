"""Every shipped model yaml must parse and build a network.

Mirrors the reference's config surface (``tools/cfgs/**``): this is the
cheapest guard that every registry name referenced by a released config
(VFE / backbones / heads / assigners / coders) actually exists in the
TPU build. Full forward/train coverage for the flagship configs lives in
test_fv2p_model / test_mgaf_model / test_model_zoo.
"""
from pathlib import Path

import pytest

from fv2p_tpu.config import EasyDict, cfg_from_yaml_file
from fv2p_tpu.datasets import dataset_meta_from_cfg
from fv2p_tpu.models import build_network

REPO = Path(__file__).resolve().parent.parent
CFG_ROOT = REPO / 'tools' / 'cfgs'
MODEL_YAMLS = sorted(p for p in CFG_ROOT.rglob('*.yaml')
                     if p.parent.name != 'dataset_configs')


@pytest.mark.parametrize('yaml_path', MODEL_YAMLS,
                         ids=[str(p.relative_to(CFG_ROOT)) for p in MODEL_YAMLS])
def test_config_builds_network(yaml_path):
    cfg = EasyDict()
    cfg.ROOT_DIR = REPO / 'tools'
    cfg_from_yaml_file(str(yaml_path), cfg)
    assert 'MODEL' in cfg and 'CLASS_NAMES' in cfg
    meta = dataset_meta_from_cfg(cfg.DATA_CONFIG, 'train')
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          class_names=cfg.CLASS_NAMES, dataset_meta=meta)
    assert model is not None
