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
from ...ops.sparse.sparse_tensor import from_coords, from_host_coords


def _out_shape(shape, kernel, stride, padding):
    k = rulebook._as3(kernel)
    st = rulebook._as3(stride)
    p = rulebook._as3(padding)
    return tuple((shape[i] + 2 * p[i] - k[i]) // st[i] + 1 for i in range(3))


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
    """Default fixed capacities for levels 1..4 + conv_out (canonical
    definition: ops.sparse.host_rulebook.level_capacities — strided sparse
    convs dilate, so deeper levels need MORE rows than the input)."""
    from ...ops.sparse.host_rulebook import level_capacities as _lc
    return _lc(base_capacity)


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
        s1 = (nz + 1, ny, nx)  # reference: grid_size[::-1] + [1,0,0]
        s2 = _out_shape(s1, 3, 2, 1)
        s3 = _out_shape(s2, 3, 2, 1)
        s4 = _out_shape(s3, 3, 2, (0, 1, 1))
        s5 = _out_shape(s4, (3, 1, 1), (2, 1, 1), 0)
        cd = self.compute_dtype

        rb = batch_dict.get('rulebooks')
        if rb is not None:
            # host-precomputed rulebooks: voxel arrays arrive pre-sorted in
            # key order; the device does zero integer bookkeeping.
            feats = batch_dict['voxel_features']
            b, cap = feats.shape[0], feats.shape[1]
            st = from_host_coords(batch_dict['voxel_coords'],
                                  batch_dict['voxel_valid'],
                                  feats.reshape(b * cap, -1), s1, b)
            caps = {k: rb[f'coords_{k}'].shape[1] * b
                    for k in ('x_conv2', 'x_conv3', 'x_conv4', 'out')}

            def glob(t, in_cap):
                # (B, K, cap_out) local row tables (-1 = missing) ->
                # (K, B*cap_out) of global rows into the SOURCE level, whose
                # per-sample block size is in_cap (zero row = B*in_cap).
                nb, k, cap_out = t.shape
                off = jnp.arange(nb, dtype=t.dtype)[:, None, None] * in_cap
                g = jnp.where(t >= 0, t + off, nb * in_cap)
                return g.transpose(1, 0, 2).reshape(k, nb * cap_out)

            nbr1 = glob(rb['subm_x_conv1'], cap)
            nbr2 = glob(rb['subm_x_conv2'], rb['coords_x_conv2'].shape[1])
            nbr3 = glob(rb['subm_x_conv3'], rb['coords_x_conv3'].shape[1])
            nbr4 = glob(rb['subm_x_conv4'], rb['coords_x_conv4'].shape[1])

            def mk_out(lvl, shape):
                return from_host_coords(
                    rb[f'coords_{lvl}'], rb[f'valid_{lvl}'],
                    jnp.zeros((caps[lvl], 0), feats.dtype), shape, b)

            out2 = mk_out('x_conv2', s2)
            out3 = mk_out('x_conv3', s3)
            out4 = mk_out('x_conv4', s4)
            out5 = mk_out('out', s5)
            nbrd2 = glob(rb['down_x_conv1->x_conv2'], cap)
            nbrd3 = glob(rb['down_x_conv2->x_conv3'],
                         rb['coords_x_conv2'].shape[1])
            nbrd4 = glob(rb['down_x_conv3->x_conv4'],
                         rb['coords_x_conv3'].shape[1])
            nbrd5 = glob(rb['down_x_conv4->out'],
                         rb['coords_x_conv4'].shape[1])
            invd2 = glob(rb['down_inv_x_conv1->x_conv2'],
                         rb['coords_x_conv2'].shape[1])
            invd3 = glob(rb['down_inv_x_conv2->x_conv3'],
                         rb['coords_x_conv3'].shape[1])
            invd4 = glob(rb['down_inv_x_conv3->x_conv4'],
                         rb['coords_x_conv4'].shape[1])
            invd5 = glob(rb['down_inv_x_conv4->out'],
                         rb['coords_out'].shape[1])
        else:
            st = input_sparse_tensor(batch_dict, s1)
            caps = level_capacities(st.capacity)
            if self.model_cfg is not None and 'LEVEL_CAPACITIES' in self.model_cfg:
                from ...ops.sparse.host_rulebook import select_mode_caps
                sel = select_mode_caps(self.model_cfg['LEVEL_CAPACITIES'], train)
                if sel:
                    caps.update(sel)
            nbr1 = rulebook.subm_rulebook(st, 3)

        # level 1 (stride 1)
        x = SparseConvBNReLU(16, 3, 'subm', cd, name='conv_input')(st, nbr1, train=train)
        x = SparseBasicBlock(16, cd, name='res1a')(x, nbr1, train=train)
        x_conv1 = SparseBasicBlock(16, cd, name='res1b')(x, nbr1, train=train)

        # level 2 (stride 2)
        if rb is None:
            out2, nbrd2, invd2 = rulebook.downsample_rulebook(
                x_conv1, 3, 2, 1, caps['x_conv2'])
        x = SparseConvBNReLU(32, 3, 'spconv', cd, name='down2')(
            x_conv1, out2, nbrd2, invd2, train=train)
        if rb is None:
            nbr2 = rulebook.subm_rulebook(x, 3)
        x = SparseBasicBlock(32, cd, name='res2a')(x, nbr2, train=train)
        x_conv2 = SparseBasicBlock(32, cd, name='res2b')(x, nbr2, train=train)

        # level 3 (stride 4)
        if rb is None:
            out3, nbrd3, invd3 = rulebook.downsample_rulebook(
                x_conv2, 3, 2, 1, caps['x_conv3'])
        x = SparseConvBNReLU(64, 3, 'spconv', cd, name='down3')(
            x_conv2, out3, nbrd3, invd3, train=train)
        if rb is None:
            nbr3 = rulebook.subm_rulebook(x, 3)
        x = SparseBasicBlock(64, cd, name='res3a')(x, nbr3, train=train)
        x_conv3 = SparseBasicBlock(64, cd, name='res3b')(x, nbr3, train=train)

        # level 4 (stride 8), z-pad (0,1,1) like the reference
        if rb is None:
            out4, nbrd4, invd4 = rulebook.downsample_rulebook(
                x_conv3, 3, 2, (0, 1, 1), caps['x_conv4'])
        x = SparseConvBNReLU(128, 3, 'spconv', cd, name='down4')(
            x_conv3, out4, nbrd4, invd4, train=train)
        if rb is None:
            nbr4 = rulebook.subm_rulebook(x, 3)
        x = SparseBasicBlock(128, cd, name='res4a')(x, nbr4, train=train)
        x_conv4 = SparseBasicBlock(128, cd, name='res4b')(x, nbr4, train=train)

        # z-squash for the BEV head: kernel (3,1,1) stride (2,1,1)
        if rb is None:
            out5, nbrd5, invd5 = rulebook.downsample_rulebook(
                x_conv4, (3, 1, 1), (2, 1, 1), 0, caps['out'])
        out = SparseConvBNReLU(128, (3, 1, 1), 'spconv', cd, name='conv_out')(
            x_conv4, out5, nbrd5, invd5, train=train)

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

        out2, nbrd2, invd2 = rulebook.downsample_rulebook(
            x_conv1, 3, 2, 1, caps['x_conv2'])
        x = SparseConvBNReLU(32, 3, 'spconv', cd, name='down2')(
            x_conv1, out2, nbrd2, invd2, train=train)
        nbr2 = rulebook.subm_rulebook(x, 3)
        x = SparseConvBNReLU(32, 3, 'subm', cd, name='conv2a')(x, nbr2, train=train)
        x_conv2 = SparseConvBNReLU(32, 3, 'subm', cd, name='conv2b')(x, nbr2, train=train)

        out3, nbrd3, invd3 = rulebook.downsample_rulebook(
            x_conv2, 3, 2, 1, caps['x_conv3'])
        x = SparseConvBNReLU(64, 3, 'spconv', cd, name='down3')(
            x_conv2, out3, nbrd3, invd3, train=train)
        nbr3 = rulebook.subm_rulebook(x, 3)
        x = SparseConvBNReLU(64, 3, 'subm', cd, name='conv3a')(x, nbr3, train=train)
        x_conv3 = SparseConvBNReLU(64, 3, 'subm', cd, name='conv3b')(x, nbr3, train=train)

        out4, nbrd4, invd4 = rulebook.downsample_rulebook(
            x_conv3, 3, 2, (0, 1, 1), caps['x_conv4'])
        x = SparseConvBNReLU(64, 3, 'spconv', cd, name='down4')(
            x_conv3, out4, nbrd4, invd4, train=train)
        nbr4 = rulebook.subm_rulebook(x, 3)
        x = SparseConvBNReLU(64, 3, 'subm', cd, name='conv4a')(x, nbr4, train=train)
        x_conv4 = SparseConvBNReLU(64, 3, 'subm', cd, name='conv4b')(x, nbr4, train=train)

        out5, nbrd5, invd5 = rulebook.downsample_rulebook(
            x_conv4, (3, 1, 1), (2, 1, 1), 0, caps['out'])
        out = SparseConvBNReLU(128, (3, 1, 1), 'spconv', cd, name='conv_out')(
            x_conv4, out5, nbrd5, invd5, train=train)

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
