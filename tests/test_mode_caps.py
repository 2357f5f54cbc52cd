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


def test_backbone_spec_mode_caps():
    spec_train = backbone_spec('VoxelResBackBone8x', (1408, 1600, 40), 16000,
                               caps_override=select_mode_caps(NESTED, True))
    assert spec_train['caps']['x_conv2'] == 26624
    spec_test = backbone_spec('VoxelResBackBone8x', (1408, 1600, 40), 40000,
                              caps_override=select_mode_caps(NESTED, False))
    # derived default of the 40000-voxel test cap
    assert spec_test['caps']['x_conv2'] == int(1.4 * 40000) + 256
    assert spec_test['caps']['x_conv1'] == 40000
