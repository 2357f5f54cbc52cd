"""Host-built rulebooks must reproduce the device-built backbone exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from fv2p_tpu.models import build_network
from fv2p_tpu.ops.sparse import host_rulebook
from tests.test_mgaf_model import TINY_DATA_CFG, TINY_MODEL_CFG, make_batch


def _clustered_batch(batch_size=2, n_cap=256, n_fill=24, seed=0):
    """Few, spatially clustered voxels so no downsample level overflows its
    capacity (overflow truncation order differs host vs device by design:
    host truncates per sample, device globally)."""
    from fv2p_tpu.datasets import dataset_meta_from_cfg
    meta = dataset_meta_from_cfg(TINY_DATA_CFG, 'train')
    rng = np.random.RandomState(seed)
    nx, ny, nz = meta['grid_size']
    coords = np.zeros((batch_size, n_cap, 3), np.int32)
    voxels = np.zeros((batch_size, n_cap, 5, 4), np.float32)
    nums = np.zeros((batch_size, n_cap), np.int32)
    valid = np.zeros((batch_size, n_cap), bool)
    for b in range(batch_size):
        lin = rng.choice(10 * 10 * 10, n_fill, replace=False)
        z = lin % 10 + 5
        y = (lin // 10) % 10 + 20
        x = lin // 100 + 30
        coords[b, :n_fill] = np.stack([z, y, x], 1)
        voxels[b, :n_fill] = rng.rand(n_fill, 5, 4)
        nums[b, :n_fill] = rng.randint(1, 6, n_fill)
        valid[b, :n_fill] = True
    gt = np.zeros((batch_size, 10, 8), np.float32)
    gt[:, 0] = [3.0, 0.0, -1.0, 3.7, 1.6, 1.5, 0.3, 1]
    batch = {
        'voxels': jnp.asarray(voxels), 'voxel_coords': jnp.asarray(coords),
        'voxel_num_points': jnp.asarray(nums), 'voxel_valid': jnp.asarray(valid),
        'gt_boxes': jnp.asarray(gt),
    }
    return batch, meta


def test_host_rulebooks_match_device_path():
    batch, meta = _clustered_batch(batch_size=2, n_cap=256)
    model = build_network(TINY_MODEL_CFG, num_class=1, class_names=['Car'],
                         dataset_meta=meta)
    variables = model.init(jax.random.PRNGKey(0), dict(batch), train=False)

    out_dev = model.apply(variables, dict(batch), train=False)

    batch_np = {k: np.asarray(v).copy() for k, v in batch.items()}
    host_rulebook.prepare_batch_rulebooks(
        batch_np, 'VoxelResBackBone8x', meta['grid_size'])
    batch_host = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else
                      {kk: jnp.asarray(vv) for kk, vv in v.items()})
                  for k, v in batch_np.items()}
    out_host = model.apply(variables, dict(batch_host), train=False)

    np.testing.assert_allclose(
        np.asarray(out_dev['spatial_features']),
        np.asarray(out_host['spatial_features']), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_dev['batch_box_preds']),
        np.asarray(out_host['batch_box_preds']), rtol=1e-3, atol=1e-3)
