"""UNetV2: sparse-conv UNet for point-wise feature learning (PartA2).

TPU-native re-design of reference ``pcdet/models/backbones_3d/spconv_unet.py``
(UNetV2, :49-238): same encoder as VoxelBackBone8x (16-32-64-64 + conv_out
128), plus an inverse-conv decoder. The decoder's ``inverseconv`` blocks
(reference ``conv_type='inverseconv'`` with a shared ``indice_key``) fall out
of our rulebook design for free: the inverse table built for the scatter-free
downsample backward IS the forward gather table of the inverse conv (see
``SparseInverseConv3d``).

Reference quirk note: this fork's UNetV2 never writes ``point_coords``
(upstream OpenPCDet does); we follow upstream and emit voxel centers of the
stride-1 level so PointIntraPartOffsetHead can assign targets.
"""
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.sparse import rulebook
from ...ops.sparse.conv import SparseBasicBlock, SparseConvBNReLU
from ...ops.sparse.sparse_tensor import decode_keys, from_host_coords
from ...utils import common_utils
from .spconv_backbone import (_out_shape, input_sparse_tensor,
                              level_capacities)


class UNetV2(nn.Module):
    model_cfg: Any
    input_channels: int
    grid_size: Tuple[int, int, int]   # (nx, ny, nz)
    voxel_capacity: int = 16000
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    compute_dtype: Any = None

    num_point_features: int = 16

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        nx, ny, nz = self.grid_size
        s1 = (nz + 1, ny, nx)
        s2 = _out_shape(s1, 3, 2, 1)
        s3 = _out_shape(s2, 3, 2, 1)
        s4 = _out_shape(s3, 3, 2, (0, 1, 1))
        s5 = _out_shape(s4, (3, 1, 1), (2, 1, 1), 0)
        cd = self.compute_dtype

        rb = batch_dict.get('rulebooks')
        if rb is not None:
            feats = batch_dict['voxel_features']
            b, cap = feats.shape[0], feats.shape[1]
            st = from_host_coords(batch_dict['voxel_coords'],
                                  batch_dict['voxel_valid'],
                                  feats.reshape(b * cap, -1), s1, b)
            caps = {k: rb[f'coords_{k}'].shape[1] * b
                    for k in ('x_conv2', 'x_conv3', 'x_conv4', 'out')}

            def glob(t, in_cap):
                nb, k, cap_out = t.shape
                off = jnp.arange(nb, dtype=t.dtype)[:, None, None] * in_cap
                g = jnp.where(t >= 0, t + off, nb * in_cap)
                return g.transpose(1, 0, 2).reshape(k, nb * cap_out)

            c2 = rb['coords_x_conv2'].shape[1]
            c3 = rb['coords_x_conv3'].shape[1]
            c4 = rb['coords_x_conv4'].shape[1]
            nbr1 = glob(rb['subm_x_conv1'], cap)
            nbr2 = glob(rb['subm_x_conv2'], c2)
            nbr3 = glob(rb['subm_x_conv3'], c3)
            nbr4 = glob(rb['subm_x_conv4'], c4)

            def mk_out(lvl, shape):
                return from_host_coords(
                    rb[f'coords_{lvl}'], rb[f'valid_{lvl}'],
                    jnp.zeros((caps[lvl], 0), feats.dtype), shape, b)

            out2, out3 = mk_out('x_conv2', s2), mk_out('x_conv3', s3)
            out4, out5 = mk_out('x_conv4', s4), mk_out('out', s5)
            nbrd2 = glob(rb['down_x_conv1->x_conv2'], cap)
            nbrd3 = glob(rb['down_x_conv2->x_conv3'], c2)
            nbrd4 = glob(rb['down_x_conv3->x_conv4'], c3)
            nbrd5 = glob(rb['down_x_conv4->out'], c4)
            invd2 = glob(rb['down_inv_x_conv1->x_conv2'], c2)
            invd3 = glob(rb['down_inv_x_conv2->x_conv3'], c3)
            invd4 = glob(rb['down_inv_x_conv3->x_conv4'], c4)
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

        # -- encoder (reference spconv_unet.py:64-106) ----------------------
        x = SparseConvBNReLU(16, 3, 'subm', cd, name='conv_input')(
            st, nbr1, train=train)
        x_conv1 = SparseConvBNReLU(16, 3, 'subm', cd, name='conv1')(
            x, nbr1, train=train)

        if rb is None:
            out2, nbrd2, invd2 = rulebook.downsample_rulebook(
                x_conv1, 3, 2, 1, caps['x_conv2'])
        x = SparseConvBNReLU(32, 3, 'spconv', cd, name='down2')(
            x_conv1, out2, nbrd2, invd2, train=train)
        if rb is None:
            nbr2 = rulebook.subm_rulebook(x, 3)
        x = SparseConvBNReLU(32, 3, 'subm', cd, name='conv2a')(x, nbr2, train=train)
        x_conv2 = SparseConvBNReLU(32, 3, 'subm', cd, name='conv2b')(x, nbr2, train=train)

        if rb is None:
            out3, nbrd3, invd3 = rulebook.downsample_rulebook(
                x_conv2, 3, 2, 1, caps['x_conv3'])
        x = SparseConvBNReLU(64, 3, 'spconv', cd, name='down3')(
            x_conv2, out3, nbrd3, invd3, train=train)
        if rb is None:
            nbr3 = rulebook.subm_rulebook(x, 3)
        x = SparseConvBNReLU(64, 3, 'subm', cd, name='conv3a')(x, nbr3, train=train)
        x_conv3 = SparseConvBNReLU(64, 3, 'subm', cd, name='conv3b')(x, nbr3, train=train)

        if rb is None:
            out4, nbrd4, invd4 = rulebook.downsample_rulebook(
                x_conv3, 3, 2, (0, 1, 1), caps['x_conv4'])
        x = SparseConvBNReLU(64, 3, 'spconv', cd, name='down4')(
            x_conv3, out4, nbrd4, invd4, train=train)
        if rb is None:
            nbr4 = rulebook.subm_rulebook(x, 3)
        x = SparseConvBNReLU(64, 3, 'subm', cd, name='conv4a')(x, nbr4, train=train)
        x_conv4 = SparseConvBNReLU(64, 3, 'subm', cd, name='conv4b')(x, nbr4, train=train)

        if self.model_cfg is None or self.model_cfg.get('RETURN_ENCODED_TENSOR', True):
            if rb is None:
                out5, nbrd5, invd5 = rulebook.downsample_rulebook(
                    x_conv4, (3, 1, 1), (2, 1, 1), 0, caps['out'])
            out = SparseConvBNReLU(128, (3, 1, 1), 'spconv', cd, name='conv_out')(
                x_conv4, out5, nbrd5, invd5, train=train)
            batch_dict['encoded_spconv_tensor'] = out
            batch_dict['encoded_spconv_tensor_stride'] = 8

        # -- decoder (reference spconv_unet.py:110-131,134-144) -------------
        def ur_block(lateral, bottom, subm_tbl, channels, name,
                     inv=None):
            """conv_t -> concat(bottom, trans) -> conv_m + channel-reduced
            skip -> inverse conv (or subm for the top level)."""
            trans = SparseBasicBlock(channels, cd, name=f'{name}_t')(
                lateral, subm_tbl, train=train)
            cat = jnp.concatenate([bottom.features, trans.features], axis=-1)
            x_cat = trans.replace(features=cat)
            x_m = SparseConvBNReLU(channels, 3, 'subm', cd, name=f'{name}_m')(
                x_cat, subm_tbl, train=train)
            n = cat.shape[0]
            red = cat.reshape(n, channels, -1).sum(axis=2)
            x = x_m.replace(features=x_m.features + red)
            if inv is None:
                return x
            out_st, out_ch, inv_tbl, fwd_tbl = inv
            return SparseConvBNReLU(out_ch, 3, 'inverseconv', cd,
                                    name=f'{name}_inv')(
                x, out_st, inv_tbl, fwd_tbl, train=train)

        x_up4 = ur_block(x_conv4, x_conv4, nbr4, 64, 'up4',
                         inv=(x_conv3, 64, invd4, nbrd4))
        x_up3 = ur_block(x_conv3, x_up4, nbr3, 64, 'up3',
                         inv=(x_conv2, 32, invd3, nbrd3))
        x_up2 = ur_block(x_conv2, x_up3, nbr2, 32, 'up2',
                         inv=(x_conv1, 16, invd2, nbrd2))
        x_up1 = ur_block(x_conv1, x_up2, nbr1, 16, 'up1')
        x_up1 = SparseConvBNReLU(16, 3, 'subm', cd, name='conv5')(
            x_up1, nbr1, train=train)

        batch_dict['multi_scale_3d_features'] = {
            'x_conv1': x_up2, 'x_conv2': x_up3,
            'x_conv3': x_up4, 'x_conv4': x_conv4,
        }
        batch_dict['multi_scale_3d_strides'] = {
            'x_conv1': 1, 'x_conv2': 2, 'x_conv3': 4, 'x_conv4': 8,
        }

        b = st.batch_size
        cap1 = st.capacity // b
        coords1 = decode_keys(st.keys, s1)
        centers = common_utils.get_voxel_centers(
            coords1[:, 1:4], 1, self.voxel_size, self.point_cloud_range)
        valid1 = st.valid_mask()
        # park padding rows far outside the range: background for target
        # assignment, never inside any gt/roi box
        centers = jnp.where(valid1[:, None], centers, 1e4)
        batch_dict['point_features'] = x_up1.features.reshape(b, cap1, -1)
        batch_dict['point_coords'] = centers.reshape(b, cap1, 3)
        batch_dict['point_valid'] = valid1.reshape(b, cap1)
        return batch_dict
