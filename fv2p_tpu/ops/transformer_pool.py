"""Point-neighbor cross-attention pooling (reference
``pcdet/ops/pointnet2/pointnet2_stack/voxel_pool_trans_modules.py:167-284``:
``PointNeighborTransformer`` + ``TransformerDecoderLayerPreNorm``).

Present in the reference op inventory but unused by the shipped configs; kept
for API parity. Each grid point (query) cross-attends over its grouped voxel
neighbors (memory) with a shared xyz positional-encoding MLP, a pre-norm
decoder layer (no self-attention) and a final projection. Pure flax — the
(M, N_mem) attention is a plain batched matmul on the MXU.
"""
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

_BN = dict(momentum=0.99, epsilon=1e-3)


class _PosEnc(nn.Module):
    """conv1x1-BN-ReLU-conv1x1 on xyz (reference ``self.pe``)."""
    out_channels: int

    @nn.compact
    def __call__(self, xyz, *, train: bool):
        h = nn.Dense(self.out_channels // 2, use_bias=False, name='fc1')(xyz)
        s = h.shape
        h = nn.BatchNorm(use_running_average=not train, **_BN, name='bn')(
            h.reshape(-1, s[-1])).reshape(s)
        return nn.Dense(self.out_channels, name='fc2')(nn.relu(h))


class TransformerDecoderLayerPreNorm(nn.Module):
    """Pre-norm cross-attention + FFN (reference :167-224; no self-attn)."""
    d_model: int
    nc_mem: int
    nhead: int = 4
    dim_feedforward: int = 128
    dropout: float = 0.0

    @nn.compact
    def __call__(self, tgt, memory, *, train: bool):
        # tgt (M, L1, E); memory (M, L2, E_mem)
        q = nn.LayerNorm(name='norm2')(tgt)
        mem = nn.LayerNorm(name='norm_mem')(memory)
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            out_features=self.d_model, dropout_rate=self.dropout,
            deterministic=not train, name='multihead_attn')(
            q, mem, mem)
        tgt = tgt + att
        h = nn.LayerNorm(name='norm3')(tgt)
        h = nn.Dense(self.dim_feedforward, name='linear1')(h)
        h = nn.relu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, name='linear2')(h)
        return tgt + h


class PointNeighborTransformer(nn.Module):
    dim_in: int
    dim_out: int
    nhead: int = 4
    num_layers: int = 1
    drop: float = 0.0
    dim_feature: int = 32

    @nn.compact
    def __call__(self, xyz_tgt, xyz_mem, features_tgt, features_mem, *,
                 train: bool = False):
        """Args:
            xyz_tgt: (M, 3) grid points; xyz_mem: (M, N_mem, 3) neighbors.
            features_tgt: (M, dim_in); features_mem: (M, N_mem, dim_feature).
        Returns: (M, 1, dim_out).

        Note: the reference shares one positional-encoding MLP between tgt
        and mem, which requires dim_in == dim_feature to add onto the memory
        features — the same constraint holds here.
        """
        pe = _PosEnc(self.dim_in, name='pe')
        tgt = features_tgt[:, None, :] + pe(xyz_tgt[:, None, :], train=train)
        mem = features_mem + pe(xyz_mem, train=train)
        for i in range(self.num_layers):
            tgt = TransformerDecoderLayerPreNorm(
                d_model=self.dim_in, nc_mem=self.dim_feature,
                nhead=self.nhead, dim_feedforward=2 * self.dim_in,
                dropout=self.drop, name=f'layer{i}')(tgt, mem, train=train)
        return nn.Dense(self.dim_out, name='fc')(tgt)
