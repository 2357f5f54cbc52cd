"""Modulated deformable convolution v2 (DCNv2) in pure XLA.

TPU-native replacement for the reference CUDA extension
``pcdet/ops/DeformableConvolutionV2PyTorch`` (bilinear-sampled im2col,
``src/cuda/modulated_deform_im2col_cuda.cuh``): the learned-offset bilinear
sampling becomes four batched gathers + interpolation weights, and the conv
itself is a single einsum over the K sampled taps — which XLA maps onto the
MXU. Out-of-bounds samples contribute zero (same as the CUDA kernel).

Layout: NHWC. Offsets/masks are produced by a regular conv; we define the
channel layout as [dy (G*K), dx (G*K), mask (G*K)] — self-consistent since
the offset conv is zero-initialized and learned end-to-end.
"""
import functools
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_sample_impl(x_grouped, sy, sx, h, w):
    """Sample x at fractional locations with zero padding outside.

    Args:
        x_grouped: (B, G, H*W, Cg).
        sy, sx: (B, G, S) fractional sample coords (S = H*W*K).
    Returns: (B, G, S, Cg).

    Implementation note: the two x-adjacent corners are fetched as ONE
    row-pair gather (``lax.gather`` with slice_sizes (2, Cg)) — x-neighbors
    are contiguous in NHWC, and halving the gather count with double-width
    rows is ~1.6x faster on TPU than four independent row gathers.
    """
    b, g = x_grouped.shape[0], x_grouped.shape[1]
    cg = x_grouped.shape[-1]
    s = sy.shape[-1]
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy1 = sy - y0
    wx1 = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # pad one trailing row so j+1 of the last row is in range
    flat_src = x_grouped.reshape(b * g, h * w, cg)
    flat_src = jnp.concatenate(
        [flat_src, jnp.zeros((b * g, 1, cg), flat_src.dtype)], axis=1)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0,))

    def row_pair(yi, xi):
        """Gather (x, x+1) channel rows at clamped (yi, xi): (BG, S, 2, Cg).

        Out-of-bounds handled by weight masking in the caller."""
        flat = (jnp.clip(yi, 0, h - 1) * w
                + jnp.clip(xi, 0, w - 2)).reshape(b * g, s)
        return jax.vmap(lambda arr, idx: jax.lax.gather(
            arr, idx[:, None], dnums, slice_sizes=(2, cg)))(flat_src, flat)

    # weights with zero-pad semantics (sample outside the map contributes 0)
    def wmask(yi, xi):
        return ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))

    p0 = row_pair(y0i, x0i).reshape(b, g, s, 2, cg)
    p1 = row_pair(y0i + 1, x0i).reshape(b, g, s, 2, cg)

    # the pair gather clamps x0 into [0, w-2]; remap which slot holds the
    # true x0 / x0+1 corner at the borders (the out-of-range corner's weight
    # is zero, so its slot content is irrelevant)
    shift_hi = (x0i > w - 2)[..., None, None]   # x0 clamped down: x0 -> slot 1
    shift_lo = (x0i < 0)[..., None, None]       # x0 < 0: x0+1 -> slot 0

    def corner0(p):
        return jnp.where(shift_hi, p[..., 1:2, :], p[..., 0:1, :])[..., 0, :]

    def corner1(p):
        return jnp.where(shift_lo, p[..., 0:1, :], p[..., 1:2, :])[..., 0, :]

    m00 = wmask(y0i, x0i).astype(sy.dtype)
    m01 = wmask(y0i, x0i + 1).astype(sy.dtype)
    m10 = wmask(y0i + 1, x0i).astype(sy.dtype)
    m11 = wmask(y0i + 1, x0i + 1).astype(sy.dtype)
    w00 = (1 - wy1) * (1 - wx1) * m00
    w01 = (1 - wy1) * wx1 * m01
    w10 = wy1 * (1 - wx1) * m10
    w11 = wy1 * wx1 * m11

    corners = (corner0(p0), corner1(p0), corner0(p1), corner1(p1))
    weights = (w00, w01, w10, w11)
    masks = (m00, m01, m10, m11)
    out = sum(v * wc[..., None] for v, wc in zip(corners, weights))
    return out, (corners, weights, masks, (y0i, x0i, wy1, wx1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bilinear_sample(x_grouped, sy, sx, h, w):
    """Custom VJP: XLA's transpose of the row-pair gather scatters
    overlapping (2, Cg) slices, which the TPU executes ~300x slower than a
    plain row scatter-add (measured 10 s vs 0.037 s per DCN block backward at
    (4, 200, 176, 128)). The hand-written backward uses one full-row
    ``.at[].add`` for d(x) and re-gathered corner values for d(sy)/d(sx)."""
    return _bilinear_sample_impl(x_grouped, sy, sx, h, w)[0]


def _bilinear_sample_fwd(x_grouped, sy, sx, h, w):
    out, _ = _bilinear_sample_impl(x_grouped, sy, sx, h, w)
    return out, (x_grouped, sy, sx)


def _bilinear_sample_bwd(h, w, res, dout):
    x_grouped, sy, sx = res
    b, g, hw, cg = x_grouped.shape
    s = sy.shape[-1]
    _, (corners, weights, masks, (y0i, x0i, wy1, wx1)) = _bilinear_sample_impl(
        x_grouped, sy, sx, h, w)
    v00, v01, v10, v11 = corners
    m00, m01, m10, m11 = masks

    # rowwise <dout, corner> dots for the offset gradients
    d00 = jnp.sum(dout * v00, axis=-1)
    d01 = jnp.sum(dout * v01, axis=-1)
    d10 = jnp.sum(dout * v10, axis=-1)
    d11 = jnp.sum(dout * v11, axis=-1)
    dsy = (-(1 - wx1) * m00 * d00 - wx1 * m01 * d01
           + (1 - wx1) * m10 * d10 + wx1 * m11 * d11)
    dsx = (-(1 - wy1) * m00 * d00 + (1 - wy1) * m01 * d01
           - wy1 * m10 * d10 + wy1 * m11 * d11)

    # d(x): scatter-add of full Cg rows (4 corners per sample); out-of-bounds
    # corners route to a dropped sentinel row
    def flat_idx(yi, xi):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        return jnp.where(ok, yi * w + xi, hw)

    idx = jnp.concatenate([flat_idx(y0i, x0i), flat_idx(y0i, x0i + 1),
                           flat_idx(y0i + 1, x0i), flat_idx(y0i + 1, x0i + 1)],
                          axis=-1).reshape(b * g, 4 * s)
    w00, w01, w10, w11 = weights
    upd = jnp.concatenate(
        [dout * w00[..., None], dout * w01[..., None],
         dout * w10[..., None], dout * w11[..., None]],
        axis=2).reshape(b * g, 4 * s, cg)
    dx = jnp.zeros((b * g, hw + 1, cg), dout.dtype)
    dx = dx.at[jnp.arange(b * g)[:, None], idx].add(upd, mode='drop')
    dx = dx[:, :hw].reshape(b, g, hw, cg).astype(x_grouped.dtype)
    return dx, dsy.astype(sy.dtype), dsx.astype(sx.dtype)


_bilinear_sample.defvjp(_bilinear_sample_fwd, _bilinear_sample_bwd)


def modulated_deform_conv(x, offset_dy, offset_dx, mask, weights,
                          kernel_size=3, deformable_groups=1):
    """Args:
        x: (B, H, W, C) input features.
        offset_dy/offset_dx: (B, H, W, G*K) learned offsets (pixels).
        mask: (B, H, W, G*K) modulation in [0, 1] (already sigmoided).
        weights: (K, C, Cout).
    Returns: (B, H, W, Cout) float32.

    Memory note: the K kernel taps are accumulated under ``lax.scan`` with a
    checkpointed body — a single fused formulation keeps (B, G, H*W*K, Cg)
    gather temporaries live through the backward pass and OOMs training at
    realistic sizes; the scan bounds peak memory to one tap.
    """
    b, h, w, c = x.shape
    g = deformable_groups
    k = kernel_size * kernel_size
    cg = c // g
    pad = (kernel_size - 1) // 2
    cout = weights.shape[-1]

    ky, kx = np.meshgrid(np.arange(kernel_size), np.arange(kernel_size),
                         indexing='ij')
    tap_y = jnp.asarray(ky.reshape(-1), x.dtype) - pad  # (K,)
    tap_x = jnp.asarray(kx.reshape(-1), x.dtype) - pad
    base_y = jax.lax.broadcasted_iota(x.dtype, (h, w), 0).reshape(h * w)
    base_x = jax.lax.broadcasted_iota(x.dtype, (h, w), 1).reshape(h * w)

    dy = offset_dy.reshape(b, h * w, g, k).transpose(3, 0, 2, 1)  # (K,B,G,HW)
    dx = offset_dx.reshape(b, h * w, g, k).transpose(3, 0, 2, 1)
    m = mask.reshape(b, h * w, g, k).transpose(3, 0, 2, 1)

    xg = x.reshape(b, h * w, g, cg).transpose(0, 2, 1, 3)  # (B, G, H*W, Cg)

    @jax.checkpoint
    def tap_body(carry, inputs):
        dy_k, dx_k, m_k, ty, tx, w_k = inputs
        sy = base_y[None, None, :] + ty + dy_k             # (B, G, HW)
        sx = base_x[None, None, :] + tx + dx_k
        sampled = _bilinear_sample(xg, sy, sx, h, w)       # (B, G, HW, Cg)
        sampled = sampled * m_k[..., None]
        flat = sampled.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        out_k = jnp.einsum('bnc,co->bno', flat, w_k,
                           preferred_element_type=jnp.float32)
        return carry + out_k, None

    init = jnp.zeros((b, h * w, cout), jnp.float32)
    out, _ = jax.lax.scan(tap_body, init,
                          (dy, dx, m, tap_y, tap_x, weights))
    return out.reshape(b, h, w, -1)


class MdeformConvBlock(nn.Module):
    """Offset/mask conv + modulated deform conv, no activation
    (reference ``mdeformable_conv_block.py:31-97``; zero-init offsets)."""
    out_channels: int
    kernel_size: int = 3
    deformable_groups: int = 1
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        g, ks = self.deformable_groups, self.kernel_size
        k = ks * ks
        cin = x.shape[-1]
        om = nn.Conv(g * k * 3, (ks, ks), padding=((1, 1), (1, 1)),
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name='conv_offset_mask')(x)
        dy, dx, mask = jnp.split(om, 3, axis=-1)
        mask = jax.nn.sigmoid(mask)
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (k, cin, self.out_channels))
        xin = x if self.compute_dtype is None else x.astype(self.compute_dtype)
        win = w if self.compute_dtype is None else w.astype(self.compute_dtype)
        return modulated_deform_conv(
            xin, dy.astype(xin.dtype), dx.astype(xin.dtype),
            mask.astype(xin.dtype), win, ks, g)


class FeatureAdaption(nn.Module):
    """MDCN feature adaptation for the CenterAF head (reference
    ``feature_adaptor/mdeformable_convs.py:14-91``: deformable_groups=4,
    ReLU on the output)."""
    out_channels: int
    kernel_size: int = 3
    deformable_groups: int = 4
    activate_out: bool = True
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = MdeformConvBlock(self.out_channels, self.kernel_size,
                             self.deformable_groups, self.compute_dtype,
                             name='mdcn')(x)
        return nn.relu(y) if self.activate_out else y
