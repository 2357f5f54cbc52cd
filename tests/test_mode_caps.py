"""Per-mode LEVEL_CAPACITIES selection (host_rulebook.select_mode_caps):
KITTI's train/test voxel caps differ (16000/40000), so a flat override sized
for train must not leak into eval programs (r3 smoke caught a 160000-vs-64000
broadcast fault) — nested {'train': ...} dicts select by mode and a missing
mode falls back to the derived defaults."""
from fv2p_tpu.ops.sparse.host_rulebook import (backbone_spec,
                                               select_mode_caps)

FLAT = {'x_conv1': 12000, 'x_conv2': 17056}
NESTED = {'train': {'x_conv1': 16000, 'x_conv2': 26624}}


def test_flat_applies_to_both_modes():
    assert select_mode_caps(FLAT, True) == FLAT
    assert select_mode_caps(FLAT, False) == FLAT


def test_nested_selects_by_mode():
    assert select_mode_caps(NESTED, True) == NESTED['train']
    assert select_mode_caps(NESTED, False) is None  # derived defaults
    assert select_mode_caps(None, True) is None


def test_mixed_mode_and_flat_keys_rejected():
    """A _BASE_CONFIG_ merge of flat child pins over nested base caps yields
    a dict with BOTH mode keys and level keys; silently preferring the mode
    keys would discard the child's pins (r3 advisor finding), so it raises."""
    import pytest
    mixed = {'train': {'x_conv1': 16000}, 'x_conv1': 12000, 'x_conv2': 17056}
    with pytest.raises(ValueError, match='mixes per-mode keys'):
        select_mode_caps(mixed, True)
    with pytest.raises(ValueError, match='mixes per-mode keys'):
        select_mode_caps(mixed, False)


def test_overfit_yaml_pins_survive_base_merge():
    """The overfit gate configs pin nested per-mode caps; after the
    _BASE_CONFIG_ recursive merge the pins must fully shadow the base's
    16000-voxel train caps in BOTH modes (not fall back to the base's)."""
    from pathlib import Path
    from fv2p_tpu.config import EasyDict, cfg_from_yaml_file
    root = Path(__file__).resolve().parents[1] / 'tools'
    for name, x2_train, x2_test in [
            ('cfgs/kitti_models/MGAF-3DSSD/mgaf-3dssd_overfit.yaml', 17056, 17056),
            ('cfgs/kitti_models/FV2P/fv2p_overfit.yaml', 22000, 22000)]:
        c = cfg_from_yaml_file(str(root / name), EasyDict())
        caps = c.MODEL.BACKBONE_3D.LEVEL_CAPACITIES
        assert select_mode_caps(caps, True)['x_conv2'] == x2_train, name
        assert select_mode_caps(caps, False)['x_conv2'] == x2_test, name
        # the base's 16000-voxel train caps must NOT leak through
        assert select_mode_caps(caps, True)['x_conv1'] == 12000, name


def test_backbone_spec_mode_caps():
    spec_train = backbone_spec('VoxelResBackBone8x', (1408, 1600, 40), 16000,
                               caps_override=select_mode_caps(NESTED, True))
    assert spec_train['caps']['x_conv2'] == 26624
    spec_test = backbone_spec('VoxelResBackBone8x', (1408, 1600, 40), 40000,
                              caps_override=select_mode_caps(NESTED, False))
    # derived default of the 40000-voxel test cap
    assert spec_test['caps']['x_conv2'] == int(1.4 * 40000) + 256
    assert spec_test['caps']['x_conv1'] == 40000
