"""Sparse convolution apply + flax modules (gather-GEMM, MXU-friendly).

TPU-native replacement for the reference ``indiceConv`` gather-GEMM-scatter
loop (``include/spconv/spconv_ops.h:261-344``): with the output-gather
rulebook from ``rulebook.py`` the whole conv is

    out[o] = sum_k  in_padded[nbr_idx[k, o]] @ W[k]

i.e. one gather + one batched matmul (einsum) per layer; the zero pad row at
index N_cap makes masking implicit. The backward pass is XLA autodiff: the
gather VJP is a scatter-add, mirroring ``indice_conv_backward``.
"""
from typing import Any, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .rulebook import _as3
from .sparse_tensor import SparseTensor


def _conv_fwd_core(features, weights, nbr_idx):
    pad = jnp.concatenate(
        [features, jnp.zeros((1, features.shape[1]), features.dtype)], axis=0)
    gathered = pad[nbr_idx]  # (K, N_out, Cin)
    return jnp.einsum('kni,kio->no', gathered, weights,
                      preferred_element_type=jnp.float32)


@jax.custom_vjp
def _sparse_conv_core(features, weights, nbr_idx, inv_idx):
    """inv_idx: (K, N_in_cap) int32 — for input row i and tap k, the output
    row it feeds (sentinel N_out == zero row). Enables a gather-GEMM backward
    (TPU scatter-adds with colliding indices serialize: the autodiff VJP of
    the forward gather costs ~seconds per layer)."""
    return _conv_fwd_core(features, weights, nbr_idx)


def _sparse_conv_core_fwd(features, weights, nbr_idx, inv_idx):
    return _conv_fwd_core(features, weights, nbr_idx), (
        features, weights, nbr_idx, inv_idx)


def _sparse_conv_core_bwd(res, dout):
    features, weights, nbr_idx, inv_idx = res
    dout = dout.astype(features.dtype)
    pad_f = jnp.concatenate(
        [features, jnp.zeros((1, features.shape[1]), features.dtype)], axis=0)
    gathered = pad_f[nbr_idx]                                 # (K, N_out, Cin)
    dw = jnp.einsum('kni,no->kio', gathered, dout,
                    preferred_element_type=jnp.float32).astype(weights.dtype)
    pad_d = jnp.concatenate(
        [dout, jnp.zeros((1, dout.shape[1]), dout.dtype)], axis=0)
    gd = pad_d[inv_idx]                                       # (K, N_in, Cout)
    dfeat = jnp.einsum('kno,kio->ni', gd, weights,
                       preferred_element_type=jnp.float32).astype(features.dtype)
    return dfeat, dw, None, None


_sparse_conv_core.defvjp(_sparse_conv_core_fwd, _sparse_conv_core_bwd)


def sparse_conv_apply(features, nbr_idx, weights, compute_dtype=None,
                      inv_idx=None):
    """Args:
        features: (N_in_cap, Cin).
        nbr_idx: (K, N_out) int32 in [0, N_in_cap]; N_in_cap == zero row.
        weights: (K, Cin, Cout).
        inv_idx: optional (K, N_in_cap) inverse table for the scatter-free
            custom backward; without it XLA autodiff (scatter-add) is used.
    Returns: (N_out, Cout) float32.
    """
    if compute_dtype is not None:
        features = features.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    if inv_idx is not None:
        return _sparse_conv_core(features, weights, nbr_idx, inv_idx)
    return _conv_fwd_core(features, weights, nbr_idx)


class SubMConv3d(nn.Module):
    """Submanifold sparse conv (reference ``spconv.SubMConv3d``)."""
    out_channels: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    use_bias: bool = False
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, st: SparseTensor, nbr_idx, inv_idx=None):
        k = int(np.prod(_as3(self.kernel_size)))
        cin = st.num_channels
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (k, cin, self.out_channels))
        if inv_idx is None:
            # subm kernels are symmetric: the inverse table is the tap-
            # mirrored forward table (out coords == in coords)
            inv_idx = jnp.flip(nbr_idx, axis=0)
        feats = sparse_conv_apply(st.features, nbr_idx, w, self.compute_dtype,
                                  inv_idx=inv_idx)
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros, (self.out_channels,))
            feats = feats + b
        feats = jnp.where(st.valid_mask()[:, None], feats, 0.0)
        return st.replace(features=feats)


class SparseConv3d(nn.Module):
    """Strided sparse conv; consumes the (out_st, nbr_idx) from
    ``rulebook.downsample_rulebook`` (reference ``spconv.SparseConv3d``)."""
    out_channels: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    use_bias: bool = False
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, in_st: SparseTensor, out_st: SparseTensor, nbr_idx,
                 inv_idx=None):
        k = int(np.prod(_as3(self.kernel_size)))
        cin = in_st.num_channels
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (k, cin, self.out_channels))
        feats = sparse_conv_apply(in_st.features, nbr_idx, w, self.compute_dtype,
                                  inv_idx=inv_idx)
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros, (self.out_channels,))
            feats = feats + b
        feats = jnp.where(out_st.valid_mask()[:, None], feats, 0.0)
        return out_st.replace(features=feats)


class SparseInverseConv3d(nn.Module):
    """Inverse (transposed) sparse conv: upsamples from the downsampled
    level back onto the source level's voxel set (reference
    ``spconv.SparseInverseConv3d`` with a shared ``indice_key`` — the
    forward rulebook reused with in/out roles swapped,
    ``spconv/functional.py:60-102`` inverse=True path).

    With our table design this is literally the strided conv with the two
    tables swapped: ``inv_table`` (K, N_src_cap), built for the scatter-free
    backward of the downsample, IS the forward gather table of the inverse
    conv, and the downsample's ``nbr_idx`` is its backward table."""
    out_channels: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    use_bias: bool = False
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, down_st: SparseTensor, out_st: SparseTensor,
                 inv_table, fwd_table=None):
        k = int(np.prod(_as3(self.kernel_size)))
        cin = down_st.num_channels
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (k, cin, self.out_channels))
        feats = sparse_conv_apply(down_st.features, inv_table, w,
                                  self.compute_dtype, inv_idx=fwd_table)
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros, (self.out_channels,))
            feats = feats + b
        feats = jnp.where(out_st.valid_mask()[:, None], feats, 0.0)
        return out_st.replace(features=feats)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid voxel rows only (padding excluded from stats).

    Matches reference ``nn.BatchNorm1d(eps=1e-3, momentum=0.01)`` — torch
    momentum 0.01 == keep 0.99 of the running stat.
    """
    momentum: float = 0.99
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool):
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask.astype(jnp.float32)[:, None]
            n = jnp.clip(jnp.sum(m), min=1.0)
            xf = x.astype(jnp.float32)
            mean = jnp.sum(xf * m, axis=0) / n
            var = jnp.sum(jnp.square(xf - mean) * m, axis=0) / n
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return jnp.where(mask[:, None], y, 0.0)


class SparseConvBNReLU(nn.Module):
    """post_act_block equivalent: conv -> masked BN -> ReLU
    (reference ``spconv_backbone.py:10-29``)."""
    out_channels: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    conv_type: str = 'subm'  # 'subm' | 'spconv'
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, st, *rulebook_args, train: bool):
        if self.conv_type == 'subm':
            (nbr_idx,) = rulebook_args
            st = SubMConv3d(self.out_channels, self.kernel_size,
                            compute_dtype=self.compute_dtype, name='conv')(st, nbr_idx)
        elif self.conv_type == 'spconv':
            if len(rulebook_args) == 3:
                out_st, nbr_idx, inv_idx = rulebook_args
            else:
                out_st, nbr_idx = rulebook_args
                inv_idx = None
            st = SparseConv3d(self.out_channels, self.kernel_size,
                              compute_dtype=self.compute_dtype, name='conv')(
                st, out_st, nbr_idx, inv_idx)
        elif self.conv_type == 'inverseconv':
            if len(rulebook_args) == 3:
                out_st, inv_table, fwd_table = rulebook_args
            else:
                out_st, inv_table = rulebook_args
                fwd_table = None
            st = SparseInverseConv3d(self.out_channels, self.kernel_size,
                                     compute_dtype=self.compute_dtype,
                                     name='conv')(st, out_st, inv_table,
                                                  fwd_table)
        else:
            raise NotImplementedError(self.conv_type)
        feats = MaskedBatchNorm(name='bn')(st.features, st.valid_mask(),
                                           use_running_average=not train)
        return st.replace(features=nn.relu(feats))


class SparseBasicBlock(nn.Module):
    """Residual block of two subm convs (reference ``spconv_backbone.py:32-68``).

    Both convs share the level's subm rulebook (same ``indice_key`` in the
    reference)."""
    channels: int
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, st, nbr_idx, *, train: bool):
        identity = st.features
        out = SubMConv3d(self.channels, 3, use_bias=True,
                         compute_dtype=self.compute_dtype, name='conv1')(st, nbr_idx)
        f = MaskedBatchNorm(name='bn1')(out.features, out.valid_mask(),
                                        use_running_average=not train)
        out = out.replace(features=nn.relu(f))
        out = SubMConv3d(self.channels, 3, use_bias=True,
                         compute_dtype=self.compute_dtype, name='conv2')(out, nbr_idx)
        f = MaskedBatchNorm(name='bn2')(out.features, out.valid_mask(),
                                        use_running_average=not train)
        f = nn.relu(f + identity)
        return out.replace(features=jnp.where(out.valid_mask()[:, None], f, 0.0))


def sparse_maxpool(features, nbr_idx):
    """Sparse max pooling over a rulebook (reference ``indice_maxpool``,
    ``spconv/maxpool_cuda.cu`` + ``pool.py SparseMaxPool3d``): for output o,
    max over the kernel taps' gathered inputs; cells with no contributing
    input yield 0.

    Args: features (N_in_cap, C); nbr_idx (K, N_out) with sentinel N_in_cap.
    Returns: (N_out, C).
    """
    neg = jnp.full((1, features.shape[1]), -jnp.inf, features.dtype)
    pad = jnp.concatenate([features, neg], axis=0)
    gathered = pad[nbr_idx]                                  # (K, N_out, C)
    out = jnp.max(gathered, axis=0)
    return jnp.where(jnp.isneginf(out), 0.0, out)


def sparse_group(features, nbr_idx):
    """Group features by rulebook without convolving (reference
    ``indice_group`` / ``SparseGroup3d``, ``include/spconv/group_ops.h``):
    returns the (K, N_out, C) neighborhood tensor with zeros at missing
    taps."""
    pad = jnp.concatenate(
        [features, jnp.zeros((1, features.shape[1]), features.dtype)], axis=0)
    return pad[nbr_idx]
