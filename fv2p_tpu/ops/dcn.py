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


def build_quad(x_grouped, h, w):
    """Pre-arrange the sampling source as "quad rows": one 4*Cg row per
    (y, x) cell of the (H+1, W+1) zero-padded cell grid, holding all four
    bilinear corners [v(y,x) v(y,x+1) v(y+1,x) v(y+1,x+1)], plus a trailing
    all-zero sentinel row for fully-out-of-range samples.

    TPU gather cost is dominated by entry count, not bytes (measured
    9.3 GB/s at 64-lane rows vs 33.8 GB/s at 256-lane rows): packing the four
    corners into one row turns four narrow gathers per sample into ONE wide
    one. Built once per conv with plain (differentiable) ops and shared by
    all K taps; the pad/concat transposes route the backward scatter
    contributions back to x automatically.

    Args: x_grouped (B, G, H*W, Cg). Returns (B*G, (H+1)*(W+1)+1, 4*Cg).
    """
    b, g = x_grouped.shape[0], x_grouped.shape[1]
    cg = x_grouped.shape[-1]
    img = x_grouped.reshape(b * g, h, w, cg)
    img = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [img[:, :-1, :-1], img[:, :-1, 1:], img[:, 1:, :-1], img[:, 1:, 1:]],
        axis=-1)                                     # (BG, H+1, W+1, 4Cg)
    quad = quad.reshape(b * g, (h + 1) * (w + 1), 4 * cg)
    return jnp.concatenate(
        [quad, jnp.zeros((b * g, 1, 4 * cg), quad.dtype)], axis=1)


def _quad_sample_impl(quad, sy, sx, mod, h, w):
    """Bilinear sample from quad rows (see build_quad), scaled by the DCN
    modulation — folding the modulation into the four interpolation weights
    saves a full pass over the sampled tensor.

    Args:
        quad: (B*G, (H+1)*(W+1)+1, 4*Cg).
        sy, sx: (B, G, S) fractional sample coords, float32.
        mod: (B, G, S) modulation scalars.
    Returns: out (B, G, S, Cg) and residuals for the backward pass.
    """
    cg = quad.shape[-1] // 4
    bg = quad.shape[0]
    b = sy.shape[0]
    g = bg // b
    s = sy.shape[-1]
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy1 = sy - y0
    wx1 = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    hq, wq = h + 1, w + 1
    # cell (y0+1, x0+1) is valid iff every corner lands inside the padded
    # image: y0 in [-1, h-1], x0 in [-1, w-1]; otherwise the sentinel row
    ok = ((y0i >= -1) & (y0i <= h - 1) & (x0i >= -1) & (x0i <= w - 1))
    cell = jnp.where(ok, (y0i + 1) * wq + (x0i + 1), hq * wq)

    # NOTE: this row gather MUST stay jnp.take_along_axis. The equivalent
    # vmapped jax.lax.gather (GatherDimensionNumbers + mode='clip') is
    # miscompiled by the axon TPU runtime: with trained (non-zero-offset)
    # weights the compiled full-resolution MGAF eval program kills the TPU
    # worker ("kernel fault"), even though every `cell` index is in-bounds
    # by construction. Bisected 2026-08-19: identical program with this
    # take_along_axis lowering runs clean; the vmapped-gather variant
    # crashes deterministically. See tools/repro_axon_gather_fault.py.
    rows = jnp.take_along_axis(quad, cell.reshape(bg, s)[..., None], axis=1)
    rows = rows.reshape(b, g, s, 4, cg)

    wdt = quad.dtype
    modf = mod.astype(jnp.float32)
    w00 = ((1 - wy1) * (1 - wx1) * modf).astype(wdt)
    w01 = ((1 - wy1) * wx1 * modf).astype(wdt)
    w10 = (wy1 * (1 - wx1) * modf).astype(wdt)
    w11 = (wy1 * wx1 * modf).astype(wdt)
    corners = (rows[..., 0, :], rows[..., 1, :],
               rows[..., 2, :], rows[..., 3, :])
    weights = (w00, w01, w10, w11)
    out = (corners[0] * w00[..., None] + corners[1] * w01[..., None]
           + corners[2] * w10[..., None] + corners[3] * w11[..., None])
    return out, (corners, weights, cell, (wy1, wx1, modf))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _bilinear_sample(quad, sy, sx, mod, h, w):
    """Custom VJP: XLA's transpose of the row gather emits overlapping-slice
    scatters, which the TPU executes ~300x slower than a plain row
    scatter-add. The hand-written backward does ONE 4*Cg-wide row
    ``.at[].add`` into the quad source per sample for d(quad) and rowwise
    <dout, corner> dots for d(sy)/d(sx); the (differentiable) quad build then
    routes d(quad) back to d(x) through cheap pad/concat transposes."""
    return _quad_sample_impl(quad, sy, sx, mod, h, w)[0]


def _bilinear_sample_fwd(quad, sy, sx, mod, h, w):
    out, _ = _quad_sample_impl(quad, sy, sx, mod, h, w)
    return out, (quad, sy, sx, mod)


def _bilinear_sample_bwd(h, w, res, dout):
    quad, sy, sx, mod = res
    bg, q1, cg4 = quad.shape
    cg = cg4 // 4
    b, g, s = sy.shape
    _, (corners, weights, cell, (wy1, wx1, modf)) = _quad_sample_impl(
        quad, sy, sx, mod, h, w)
    v00, v01, v10, v11 = corners

    # offset grads: rowwise <dout, corner> dots (OOB corners are zero rows,
    # so no explicit masking is needed)
    d00 = jnp.sum(dout * v00, axis=-1)
    d01 = jnp.sum(dout * v01, axis=-1)
    d10 = jnp.sum(dout * v10, axis=-1)
    d11 = jnp.sum(dout * v11, axis=-1)
    dsy = modf * (-(1 - wx1) * d00 - wx1 * d01
                  + (1 - wx1) * d10 + wx1 * d11)
    dsx = modf * (-(1 - wy1) * d00 + (1 - wy1) * d01
                  - wy1 * d10 + wy1 * d11)
    dmod = ((1 - wy1) * (1 - wx1) * d00 + (1 - wy1) * wx1 * d01
            + wy1 * (1 - wx1) * d10 + wy1 * wx1 * d11)

    # d(quad): one wide row scatter-add per sample; sentinel-row updates are
    # dropped by the quad build's concat transpose
    w00, w01, w10, w11 = weights
    upd = jnp.concatenate(
        [dout * w00[..., None], dout * w01[..., None],
         dout * w10[..., None], dout * w11[..., None]],
        axis=-1).reshape(bg, s, cg4)
    dquad = jnp.zeros((bg, q1, cg4), dout.dtype)
    dquad = dquad.at[jnp.arange(bg)[:, None], cell.reshape(bg, s)].add(upd)
    return (dquad.astype(quad.dtype), dsy.astype(sy.dtype),
            dsx.astype(sx.dtype), dmod.astype(mod.dtype))


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

    # sample coordinates in float32 ALWAYS: bf16's 8 mantissa bits cannot
    # represent fractional positions beyond x ~ 128 (0.5-pixel error at the
    # far edge of a 176-wide BEV map)
    ky, kx = np.meshgrid(np.arange(kernel_size), np.arange(kernel_size),
                         indexing='ij')
    tap_y = jnp.asarray(ky.reshape(-1), jnp.float32) - pad  # (K,)
    tap_x = jnp.asarray(kx.reshape(-1), jnp.float32) - pad
    base_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(h * w)
    base_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(h * w)

    dy = offset_dy.astype(jnp.float32).reshape(
        b, h * w, g, k).transpose(3, 0, 2, 1)               # (K,B,G,HW)
    dx = offset_dx.astype(jnp.float32).reshape(
        b, h * w, g, k).transpose(3, 0, 2, 1)
    m = mask.reshape(b, h * w, g, k).transpose(3, 0, 2, 1)

    xg = x.reshape(b, h * w, g, cg).transpose(0, 2, 1, 3)  # (B, G, H*W, Cg)
    quad = build_quad(xg, h, w)   # tap-independent, built ONCE (not 9x)

    # tap weights split per deformable group so the sampled tensor feeds the
    # MXU directly in (B, G, HW, Cg) layout — no (B, HW, C) transpose
    w_g = weights.reshape(k, g, cg, cout)

    out = _mdcn_all_taps(quad, dy, dx, m, w_g, tap_y, tap_x, h, w)
    return out.reshape(b, h, w, -1)


def _pick_chunks(hw):
    """Chunk samples within a tap so the gathered-rows temporary stays small
    (~(B*G*chunk*4Cg) elements); the peak HBM cost would otherwise be
    quad + a full (B, G, HW, 4, Cg) rows buffer per tap."""
    n_chunks = 1
    while hw // n_chunks > 8192 and hw % (n_chunks * 2) == 0:
        n_chunks *= 2
    while hw // n_chunks > 8192 and hw % (n_chunks * 5) == 0:
        n_chunks *= 5
    return n_chunks, hw // n_chunks


def _base_yx(h, w):
    base_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(h * w)
    base_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(h * w)
    return base_y, base_x


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _mdcn_all_taps(quad, dy, dx, m, w_g, tap_y, tap_x, h, w):
    """All K deformable taps: sample + accumulate into the output.

    Args: quad (B*G, (H+1)(W+1)+1, 4Cg); dy/dx/m (K, B, G, HW);
    w_g (K, G, Cg, Cout); tap_y/tap_x (K,). Returns (B, HW, Cout) float32.

    Whole-conv custom VJP: the per-chunk ``_bilinear_sample`` VJP inside a
    scan makes every chunk's backward materialize (zero + add) a fresh
    FULL-SIZE d(quad) cotangent — K*n_chunks full passes over a buffer the
    size of 4x the input (~40 GB of HBM traffic per conv at BEV sizes,
    measured 790 ms of the MGAF train step). Here the backward carries ONE
    f32 d(quad) accumulator through a (taps x chunks) scan — the carry is
    donated, so each step is just its own rows' scatter-add — and recomputes
    samples instead of saving them (same rematerialization the forward
    jax.checkpoint bought, without the transpose blowup)."""
    out, _ = _mdcn_fwd_impl(quad, dy, dx, m, w_g, tap_y, tap_x, h, w)
    return out


def _mdcn_fwd_impl(quad, dy, dx, m, w_g, tap_y, tap_x, h, w):
    k, b, g, hw = dy.shape
    cg = quad.shape[-1] // 4
    n_chunks, chunk = _pick_chunks(hw)
    base_y, base_x = _base_yx(h, w)

    def tap_body(carry, inputs):
        dy_k, dx_k, m_k, ty, tx, w_k = inputs
        sy = base_y[None, None, :] + ty + dy_k             # (B, G, HW)
        sx = base_x[None, None, :] + tx + dx_k
        if n_chunks > 1:
            sampled = jax.lax.map(
                lambda t: _quad_sample_impl(quad, t[0], t[1], t[2], h, w)[0],
                (sy.reshape(b, g, n_chunks, chunk).transpose(2, 0, 1, 3),
                 sx.reshape(b, g, n_chunks, chunk).transpose(2, 0, 1, 3),
                 m_k.reshape(b, g, n_chunks, chunk).transpose(2, 0, 1, 3)))
            sampled = sampled.transpose(1, 2, 0, 3, 4).reshape(b, g, hw, cg)
        else:
            sampled = _quad_sample_impl(quad, sy, sx, m_k, h, w)[0]
        out_k = jnp.einsum('bgnc,gco->bno', sampled, w_k,
                           preferred_element_type=jnp.float32)
        return carry + out_k, None

    cout = w_g.shape[-1]
    init = jnp.zeros((b, hw, cout), jnp.float32)
    out, _ = jax.lax.scan(tap_body, init, (dy, dx, m, tap_y, tap_x, w_g))
    return out, (quad, dy, dx, m, w_g, tap_y, tap_x)


def _mdcn_all_taps_fwd(quad, dy, dx, m, w_g, tap_y, tap_x, h, w):
    return _mdcn_fwd_impl(quad, dy, dx, m, w_g, tap_y, tap_x, h, w)


def _mdcn_all_taps_bwd(h, w, res, dout):
    quad, dy, dx, m, w_g, tap_y, tap_x = res
    k, b, g, hw = dy.shape
    bg, q1, cg4 = quad.shape
    cg = cg4 // 4
    base_y, base_x = _base_yx(h, w)
    doutf = dout.astype(jnp.float32)                       # (B, HW, Cout)

    # NOTE on structure: scattering into the CARRIED accumulator inside the
    # scan defeats XLA's carry aliasing — each of the K (x chunks) steps
    # copied the full ~300 MB d(quad) buffer before the .at[].add, which
    # measured as ~500 ms/conv at level-1 BEV shapes while the raw scatter
    # of a whole tap's rows is only ~13 ms. Each tap therefore scatters into
    # its OWN fresh zeros and the accumulator only ever sees elementwise
    # adds (alias-friendly). One tap's f32 temporaries (~300 MB at level 1)
    # fit comfortably, so the backward needs no inner chunking.

    def tap_body(dquad, inputs):
        dy_k, dx_k, m_k, ty, tx, w_k = inputs
        sy = base_y[None, None, :] + ty + dy_k             # (B, G, HW)
        sx = base_x[None, None, :] + tx + dx_k
        sampled, (corners, weights, cell, (wy1, wx1, modf)) = \
            _quad_sample_impl(quad, sy, sx, m_k, h, w)
        # d(w_k) and d(sampled) through the tap einsum
        dw_k = jnp.einsum('bgnc,bno->gco', sampled, doutf,
                          preferred_element_type=jnp.float32)
        dsamp = jnp.einsum('bno,gco->bgnc', doutf,
                           w_k.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        v00, v01, v10, v11 = corners
        d00 = jnp.sum(dsamp * v00, axis=-1)
        d01 = jnp.sum(dsamp * v01, axis=-1)
        d10 = jnp.sum(dsamp * v10, axis=-1)
        d11 = jnp.sum(dsamp * v11, axis=-1)
        dsy_k = modf * (-(1 - wx1) * d00 - wx1 * d01
                        + (1 - wx1) * d10 + wx1 * d11)
        dsx_k = modf * (-(1 - wy1) * d00 + (1 - wy1) * d01
                        - wy1 * d10 + wy1 * d11)
        dmod_k = ((1 - wy1) * (1 - wx1) * d00 + (1 - wy1) * wx1 * d01
                  + wy1 * (1 - wx1) * d10 + wy1 * wx1 * d11)
        # ONE row scatter-add per sample into fresh zeros; sentinel-row
        # updates are dropped by the quad build's concat transpose
        w00, w01, w10, w11 = weights
        w00f, w01f = w00.astype(jnp.float32), w01.astype(jnp.float32)
        w10f, w11f = w10.astype(jnp.float32), w11.astype(jnp.float32)
        upd = jnp.concatenate(
            [dsamp * w00f[..., None], dsamp * w01f[..., None],
             dsamp * w10f[..., None], dsamp * w11f[..., None]],
            axis=-1).reshape(bg, hw, cg4)
        dquad_k = jnp.zeros((bg, q1, cg4), jnp.float32).at[
            jnp.arange(bg)[:, None], cell.reshape(bg, hw)].add(upd)
        return dquad + dquad_k, (dsy_k, dsx_k, dmod_k, dw_k)

    dquad0 = jnp.zeros((bg, q1, cg4), jnp.float32)
    dquad, (dsy, dsx, dmod, dw) = jax.lax.scan(
        tap_body, dquad0, (dy, dx, m, tap_y, tap_x, w_g))
    return (dquad.astype(quad.dtype), dsy.astype(dy.dtype),
            dsx.astype(dx.dtype), dmod.astype(m.dtype),
            dw.astype(w_g.dtype),
            jnp.zeros_like(tap_y), jnp.zeros_like(tap_x))


_mdcn_all_taps.defvjp(_mdcn_all_taps_fwd, _mdcn_all_taps_bwd)


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
            xin, dy, dx, mask.astype(xin.dtype), win, ks, g)


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
