"""Sparse -> dense BEV (reference ``height_compression.py:10-25``).

Produces NHWC ``spatial_features`` (B, H, W, C*D) — channel index c*D + z to
match the torch (N, C, D, H, W) -> (N, C*D, H, W) fold."""
import flax.linen as nn

from ....ops.sparse.sparse_tensor import to_dense_zfolded


class HeightCompression(nn.Module):
    model_cfg: dict = None

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        st = batch_dict['encoded_spconv_tensor']
        batch_dict['spatial_features'] = to_dense_zfolded(st)
        batch_dict['spatial_features_stride'] = batch_dict['encoded_spconv_tensor_stride']
        return batch_dict
