"""Mean voxel feature encoder (reference ``pcdet/models/backbones_3d/vfe/mean_vfe.py``)."""
import flax.linen as nn
import jax.numpy as jnp


class MeanVFE(nn.Module):
    """Per-voxel mean over (padded) points. Reference mean_vfe.py:25-29."""
    model_cfg: dict = None
    num_point_features: int = 4

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        voxels = batch_dict['voxels']                     # (B, N_cap, max_pts, C)
        num_points = batch_dict['voxel_num_points']       # (B, N_cap)
        points_sum = jnp.sum(voxels, axis=-2)
        normalizer = jnp.clip(num_points, min=1.0).astype(voxels.dtype)[..., None]
        batch_dict['voxel_features'] = points_sum / normalizer
        return batch_dict

    def get_output_feature_dim(self):
        return self.num_point_features
