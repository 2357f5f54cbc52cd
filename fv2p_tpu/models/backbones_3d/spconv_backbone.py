"""Sparse 3D backbones (TPU-native re-design of reference
``pcdet/models/backbones_3d/spconv_backbone.py``).

Design notes (vs. the reference):
  * Rulebooks are built once per level inside the forward (pure jnp integer
    work) and shared by every subm conv of that level — reproducing the
    ``indice_key`` caching of the reference (conv.py:149-183) without mutable
    state.
  * All voxel sets live in fixed-capacity SparseTensors; per-level capacities
    shrink with stride (active voxel count drops ~2x per downsample).
"""
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.sparse import rulebook
from ...ops.sparse.conv import SparseBasicBlock, SparseConvBNReLU
from ...ops.sparse.sparse_tensor import from_coords


def input_sparse_tensor(batch_dict, sparse_shape):
    """(B, N_cap, ...) per-sample arrays -> one flat SparseTensor.

    The batch index is implicit in the leading axis, which makes data
    parallelism a plain shard of axis 0 over the mesh (whole samples stay on
    one device; no cross-device sort)."""
    coords = batch_dict['voxel_coords']          # (B, N_cap, 3) int32 (z,y,x)
    feats = batch_dict['voxel_features']         # (B, N_cap, C)
    valid = batch_dict.get('voxel_valid')        # (B, N_cap) bool
    b, cap = coords.shape[0], coords.shape[1]
    batch_col = jnp.broadcast_to(
        jnp.arange(b, dtype=coords.dtype)[:, None, None], (b, cap, 1))
    coords_bzyx = jnp.concatenate([batch_col, coords], axis=-1).reshape(b * cap, 4)
    feats = feats.reshape(b * cap, feats.shape[-1])
    if valid is not None:
        valid = valid.reshape(b * cap)
    return from_coords(coords_bzyx, feats, sparse_shape, b, valid_mask=valid)


def level_capacities(base_capacity):
    """Default fixed capacities for levels 1..4 + conv_out."""
    c = base_capacity
    return {'x_conv1': c, 'x_conv2': c, 'x_conv3': c // 2, 'x_conv4': c // 4,
            'out': c // 4}


class VoxelResBackBone8x(nn.Module):
    """Residual sparse backbone used by FV2P and MGAF-3DSSD
    (reference spconv_backbone.py:189-290).

    Channel plan: 16 -> (16,16) res -> 32 stride2 -> (32,32) res -> 64 stride2
    -> (64,64) res -> 128 stride2 pad(0,1,1) -> (128,128) res -> conv_out 128
    with kernel (3,1,1) stride (2,1,1).
    """
    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, int, int]   # (nx, ny, nz) from the voxel grid
    voxel_capacity: int = 16000
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        nx, ny, nz = self.grid_size
        sparse_shape = (nz + 1, ny, nx)  # reference: grid_size[::-1] + [1,0,0]
        st = input_sparse_tensor(batch_dict, sparse_shape)
        caps = level_capacities(st.capacity)
        if self.model_cfg is not None and 'LEVEL_CAPACITIES' in self.model_cfg:
            caps.update(self.model_cfg['LEVEL_CAPACITIES'])
        cd = self.compute_dtype

        # level 1 (stride 1)
        nbr1 = rulebook.subm_rulebook(st, 3)
        x = SparseConvBNReLU(16, 3, 'subm', cd, name='conv_input')(st, nbr1, train=train)
        x = SparseBasicBlock(16, cd, name='res1a')(x, nbr1, train=train)
        x_conv1 = SparseBasicBlock(16, cd, name='res1b')(x, nbr1, train=train)

        # level 2 (stride 2)
        out2, nbrd2 = rulebook.downsample_rulebook(x_conv1, 3, 2, 1, caps['x_conv2'])
        x = SparseConvBNReLU(32, 3, 'spconv', cd, name='down2')(x_conv1, out2, nbrd2, train=train)
        nbr2 = rulebook.subm_rulebook(x, 3)
        x = SparseBasicBlock(32, cd, name='res2a')(x, nbr2, train=train)
        x_conv2 = SparseBasicBlock(32, cd, name='res2b')(x, nbr2, train=train)

        # level 3 (stride 4)
        out3, nbrd3 = rulebook.downsample_rulebook(x_conv2, 3, 2, 1, caps['x_conv3'])
        x = SparseConvBNReLU(64, 3, 'spconv', cd, name='down3')(x_conv2, out3, nbrd3, train=train)
        nbr3 = rulebook.subm_rulebook(x, 3)
        x = SparseBasicBlock(64, cd, name='res3a')(x, nbr3, train=train)
        x_conv3 = SparseBasicBlock(64, cd, name='res3b')(x, nbr3, train=train)

        # level 4 (stride 8), z-pad (0,1,1) like the reference
        out4, nbrd4 = rulebook.downsample_rulebook(
            x_conv3, 3, 2, (0, 1, 1), caps['x_conv4'])
        x = SparseConvBNReLU(128, 3, 'spconv', cd, name='down4')(x_conv3, out4, nbrd4, train=train)
        nbr4 = rulebook.subm_rulebook(x, 3)
        x = SparseBasicBlock(128, cd, name='res4a')(x, nbr4, train=train)
        x_conv4 = SparseBasicBlock(128, cd, name='res4b')(x, nbr4, train=train)

        # z-squash for the BEV head: kernel (3,1,1) stride (2,1,1)
        out5, nbrd5 = rulebook.downsample_rulebook(
            x_conv4, (3, 1, 1), (2, 1, 1), 0, caps['out'])
        out = SparseConvBNReLU(128, (3, 1, 1), 'spconv', cd, name='conv_out')(
            x_conv4, out5, nbrd5, train=train)

        batch_dict.update({
            'encoded_spconv_tensor': out,
            'encoded_spconv_tensor_stride': 8,
            'multi_scale_3d_features': {
                'x_conv1': x_conv1, 'x_conv2': x_conv2,
                'x_conv3': x_conv3, 'x_conv4': x_conv4,
            },
            'multi_scale_3d_strides': {
                'x_conv1': 1, 'x_conv2': 2, 'x_conv3': 4, 'x_conv4': 8,
            },
        })
        return batch_dict

    num_point_features = 128


class VoxelBackBone8x(nn.Module):
    """Plain (non-residual) sparse backbone (reference spconv_backbone.py:71-186).
    Channel plan 16/16/32/64/64, conv_out 128."""
    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, int, int]
    voxel_capacity: int = 16000
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        nx, ny, nz = self.grid_size
        sparse_shape = (nz + 1, ny, nx)
        st = input_sparse_tensor(batch_dict, sparse_shape)
        caps = level_capacities(st.capacity)
        cd = self.compute_dtype

        nbr1 = rulebook.subm_rulebook(st, 3)
        x = SparseConvBNReLU(16, 3, 'subm', cd, name='conv_input')(st, nbr1, train=train)
        x_conv1 = SparseConvBNReLU(16, 3, 'subm', cd, name='conv1')(x, nbr1, train=train)

        out2, nbrd2 = rulebook.downsample_rulebook(x_conv1, 3, 2, 1, caps['x_conv2'])
        x = SparseConvBNReLU(32, 3, 'spconv', cd, name='down2')(x_conv1, out2, nbrd2, train=train)
        nbr2 = rulebook.subm_rulebook(x, 3)
        x = SparseConvBNReLU(32, 3, 'subm', cd, name='conv2a')(x, nbr2, train=train)
        x_conv2 = SparseConvBNReLU(32, 3, 'subm', cd, name='conv2b')(x, nbr2, train=train)

        out3, nbrd3 = rulebook.downsample_rulebook(x_conv2, 3, 2, 1, caps['x_conv3'])
        x = SparseConvBNReLU(64, 3, 'spconv', cd, name='down3')(x_conv2, out3, nbrd3, train=train)
        nbr3 = rulebook.subm_rulebook(x, 3)
        x = SparseConvBNReLU(64, 3, 'subm', cd, name='conv3a')(x, nbr3, train=train)
        x_conv3 = SparseConvBNReLU(64, 3, 'subm', cd, name='conv3b')(x, nbr3, train=train)

        out4, nbrd4 = rulebook.downsample_rulebook(
            x_conv3, 3, 2, (0, 1, 1), caps['x_conv4'])
        x = SparseConvBNReLU(64, 3, 'spconv', cd, name='down4')(x_conv3, out4, nbrd4, train=train)
        nbr4 = rulebook.subm_rulebook(x, 3)
        x = SparseConvBNReLU(64, 3, 'subm', cd, name='conv4a')(x, nbr4, train=train)
        x_conv4 = SparseConvBNReLU(64, 3, 'subm', cd, name='conv4b')(x, nbr4, train=train)

        out5, nbrd5 = rulebook.downsample_rulebook(
            x_conv4, (3, 1, 1), (2, 1, 1), 0, caps['out'])
        out = SparseConvBNReLU(128, (3, 1, 1), 'spconv', cd, name='conv_out')(
            x_conv4, out5, nbrd5, train=train)

        batch_dict.update({
            'encoded_spconv_tensor': out,
            'encoded_spconv_tensor_stride': 8,
            'multi_scale_3d_features': {
                'x_conv1': x_conv1, 'x_conv2': x_conv2,
                'x_conv3': x_conv3, 'x_conv4': x_conv4,
            },
            'multi_scale_3d_strides': {
                'x_conv1': 1, 'x_conv2': 2, 'x_conv3': 4, 'x_conv4': 8,
            },
        })
        return batch_dict

    num_point_features = 128
