"""Dense BEV backbones, NHWC (reference ``base_bev_backbone.py`` /
``dcn_bev_backbone.py``).

Each level: k3 conv (stride s, explicit pad 1 to match torch ZeroPad2d(1))
+ BN + ReLU, then LAYER_NUMS more k3 convs; deblocks upsample each level with
ConvTranspose (optionally prefixed by a modulated deformable conv block when
USE_DCN) and the ups are concatenated to ``spatial_features_2d``."""
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...utils.compile_tame import stage_barrier

from ...ops.dcn import MdeformConvBlock

_BN = dict(momentum=0.99, epsilon=1e-3)


class _Block(nn.Module):
    num_filters: int
    layer_num: int
    stride: int
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype or x.dtype
        x = nn.Conv(self.num_filters, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=dt)(x)
        x = nn.BatchNorm(use_running_average=not train, **_BN)(x)
        x = nn.relu(x)
        for _ in range(self.layer_num):
            x = nn.Conv(self.num_filters, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=dt)(x)
            x = nn.BatchNorm(use_running_average=not train, **_BN)(x)
            x = nn.relu(x)
        return x


class _Deblock(nn.Module):
    num_upsample_filters: int
    upsample_stride: int
    use_dcn: bool = False
    num_filters: int = 0  # input channels (needed for the DCN block)
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.compute_dtype or x.dtype
        if self.use_dcn:
            x = MdeformConvBlock(self.num_filters, 3, deformable_groups=1,
                                 compute_dtype=self.compute_dtype, name='dcn')(x)
            x = nn.BatchNorm(use_running_average=not train, **_BN)(x)
            x = nn.relu(x)
        s = self.upsample_stride
        if s >= 1:
            x = nn.ConvTranspose(self.num_upsample_filters, (s, s),
                                 strides=(s, s), use_bias=False, dtype=dt)(x)
        else:
            s = int(np.round(1 / s))
            x = nn.Conv(self.num_upsample_filters, (s, s), strides=(s, s),
                        use_bias=False, dtype=dt)(x)
        x = nn.BatchNorm(use_running_average=not train, **_BN)(x)
        return nn.relu(x)


class BaseBEVBackbone(nn.Module):
    model_cfg: Any
    input_channels: int
    use_dcn: bool = False
    compute_dtype: Any = None

    @property
    def num_bev_features(self):
        ups = self.model_cfg.get('NUM_UPSAMPLE_FILTERS', None)
        if ups:
            return int(sum(ups))
        return int(self.model_cfg['NUM_FILTERS'][-1])

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        cfg = self.model_cfg
        layer_nums = cfg.get('LAYER_NUMS', [])
        layer_strides = cfg.get('LAYER_STRIDES', [])
        num_filters = cfg.get('NUM_FILTERS', [])
        upsample_strides = cfg.get('UPSAMPLE_STRIDES', [])
        num_up_filters = cfg.get('NUM_UPSAMPLE_FILTERS', [])

        use_dcn = self.use_dcn or bool(cfg.get('USE_DCN', False))
        x = batch_dict['spatial_features']
        ups = []
        for i in range(len(layer_nums)):
            x = _Block(num_filters[i], layer_nums[i], layer_strides[i],
                       self.compute_dtype, name=f'block{i}')(x, train=train)
            stride = batch_dict['spatial_features'].shape[1] // x.shape[1]
            batch_dict[f'spatial_features_{stride}x'] = x
            if len(upsample_strides) > 0:
                ups.append(_Deblock(num_up_filters[i], upsample_strides[i],
                                    use_dcn, num_filters[i],
                                    self.compute_dtype, name=f'deblock{i}')(
                    x, train=train))
            else:
                ups.append(x)

        x = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if len(upsample_strides) > len(layer_nums):
            s = upsample_strides[-1]
            x = nn.ConvTranspose(x.shape[-1], (s, s), strides=(s, s),
                                 use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, **_BN)(x)
            x = nn.relu(x)
        # fusion boundary: see utils/compile_tame.py (450 s -> 60 s cold)
        batch_dict['spatial_features_2d'] = stage_barrier(x)
        return batch_dict


class DCNBEVBackbone(BaseBEVBackbone):
    """BaseBEVBackbone with an MDCN block before each deblock when cfg
    USE_DCN is set (reference dcn_bev_backbone.py:56-72; MGAF: 3 levels
    [5,5,5], ups [1,2,4] -> 768 channels)."""
    pass
