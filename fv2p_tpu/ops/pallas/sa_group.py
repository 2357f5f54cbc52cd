"""Fused set-abstraction grouping + 2-layer MLP + maxpool, as one Pallas
TPU kernel.

The XLA formulation of multi-scale-grouping SA (``pointops.ball_query_group``
+ per-slot MLP + max) materializes, per radius, a (R, G, P, S) one-hot
selection tensor and a (R, G, S, 3+C) grouped tensor in HBM — at FV2P RoI
shapes (R=400 rois, G=216 grid points, P=512 pooled points, S=16/32 slots)
that is ~3 GB of HBM traffic per radius per pass and the whole SA stage is
bandwidth-bound (~50 ms of the 192 ms RoI head). Here a center tile's
distance matrix, slot selection and both MLP layers live in VMEM; the only
HBM traffic is the per-point first-layer activations Z (R, P, H) and the
(R, G, H) pooled output. The first MLP layer commutes through the one-hot
gather (sel @ (rows @ W1) == (sel @ rows) @ W1), so the big matmul runs at
the hidden width instead of 3+C, and the center-point distance matrix is
itself one MXU matmul of lane-packed geometry (d2 = A @ B with
A = [c, 1, |c|^2, 0...], B = [-2x; |x|^2 + inv; 1; 0...]) so every block is
a legal (sublane, 128k)-tile.

Semantics match ``pointops.ball_query_group`` (reference
``pointnet2_batch/src/ball_query_gpu.cu``: first-``nsample`` in-ball points
by index, empty slots backfilled with the first hit, empty balls produce
exactly-zero grouped rows) followed by the 2-layer Dense(+bias or folded
eval-BatchNorm)+ReLU MLP and a max over slots — modulo float reassociation
(d2 and layer 1 accumulate in f32 through matmuls).

Used by ``_SAModuleMSG`` (iouguided_roi_head.py) at eval on TPU; training
keeps the XLA path (this kernel has no VJP).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10
_GEO = 8  # lanes used of the 128-lane geometry packing


def _kernel(a_ref, b_ref, z0_ref, z1_ref, cw0_ref, cw1_ref,
            w20_ref, w21_ref, b10_ref, b11_ref, b20_ref, b21_ref, out_ref,
            *, radii, nsamples, gt, p, hidden):
    a = a_ref[0]                                            # (gt, 128) f32
    b = b_ref[0]                                            # (128, p) f32
    d2 = jax.lax.dot(a, b, preferred_element_type=jnp.float32)  # (gt, p)

    # upper-triangular (incl. diagonal) ones: cumsum-by-matmul stays exact in
    # f32 for counts <= p
    qi = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    pi = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    ut = (qi <= pi).astype(jnp.float32)

    z_refs = (z0_ref, z1_ref)
    cw_refs = (cw0_ref, cw1_ref)
    w2_refs = (w20_ref, w21_ref)
    b1_refs = (b10_ref, b11_ref)
    b2_refs = (b20_ref, b21_ref)

    for i, (rad, s) in enumerate(zip(radii, nsamples)):
        ib = (d2 < rad * rad).astype(jnp.float32)          # (gt, p)
        cs = jax.lax.dot(ib, ut,
                         preferred_element_type=jnp.float32)  # (gt, p)
        cnt = cs[:, p - 1:p]                                # (gt, 1)
        first = ib * (cs == 1.0)
        slot = jax.lax.broadcasted_iota(
            jnp.int32, (1, s, 1), 1).astype(jnp.float32) + 1.0  # (1, s, 1)
        sel3 = ib[:, None, :] * (cs[:, None, :] == slot) \
            + first[:, None, :] * (slot > cnt[:, None, :])
        sel2 = sel3.reshape(gt * s, p).astype(jnp.bfloat16)

        z = z_refs[i][0]                                    # (p, hidden) bf16
        t = jax.lax.dot(sel2, z,
                        preferred_element_type=jnp.float32)  # (gt*s, hidden)
        cw = cw_refs[i][0]                                  # (gt, hidden) f32
        # empty balls feed an exactly-zero MLP input in the XLA path
        # (pointops.ball_query_group zeroes grouped_xyz AND grouped_feats),
        # so their center term collapses to -b1
        cw = jnp.where(cnt > 0.0, cw, -b1_refs[i][...])
        h1 = jnp.maximum(t.reshape(gt, s, hidden) - cw[:, None, :], 0.0)
        h1 = h1.reshape(gt * s, hidden).astype(jnp.bfloat16)
        h2 = jax.lax.dot(h1, w2_refs[i][...],
                         preferred_element_type=jnp.float32)
        h2 = jnp.maximum(h2 + b2_refs[i][...], 0.0)         # (gt*s, hidden)
        m = jnp.max(h2.reshape(gt, s, hidden), axis=1)      # (gt, hidden)
        out_ref[0, :, i * (hidden // 2):(i + 1) * (hidden // 2)] = \
            m[:, :hidden // 2].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=('radii', 'nsamples', 'gt', 'interpret'))
def sa_group_pool_fused(centers, xyz, valid, z_list, cw_list, w2_list,
                        b1_list, b2_list, radii, nsamples, gt=32,
                        interpret=False):
    """Fused ball-group + MLP(2x Dense->ReLU) + slot-max for two radii.

    Args:
        centers: (R, G, 3) f32 query/grid points.
        xyz: (R, P, 3) f32 source points; valid (R, P) bool.
        z_list: per radius, (R, P, H) layer-1 activations of the sources:
            ``xyz @ W1[:3] + feats @ W1[3:]`` with W1 already BN/bias-folded;
            H is the padded hidden width (out_ch padded to a lane multiple
            with zeros).
        cw_list: per radius, (R, G, H) f32 ``centers @ W1[:3] - b1`` (the
            center term of the relative-xyz contribution, bias folded in).
        w2_list: per radius, (H, H) bf16 layer-2 weights (zero-padded).
        b1_list: per radius, (1, H) f32 folded layer-1 bias (zero-padded) —
            needed separately to reproduce the XLA path's empty-ball
            convention (zero MLP input => center term -b1).
        b2_list: per radius, (1, H) f32 layer-2 bias (zero-padded).
        radii / nsamples: static tuples of length 2.
    Returns:
        (R, G, H) bf16: columns [0:H/2] = radius-0 pooled output (the real
        out_ch channels of it), [H/2:H] = radius-1 — i.e. exactly
        ``concat([max_s mlp0(...), max_s mlp1(...)], -1)`` when out_ch==H/2.
    """
    assert len(radii) == len(nsamples) == 2
    r, g = centers.shape[0], centers.shape[1]
    p0 = xyz.shape[1]
    p = ((p0 + 127) // 128) * 128
    hidden = z_list[0].shape[-1]
    g_pad = ((g + gt - 1) // gt) * gt

    c32 = centers.astype(jnp.float32)
    x32 = xyz.astype(jnp.float32)
    pinv = jnp.where(valid, 0.0, _BIG).astype(jnp.float32)

    # geometry packing: d2[g, q] = A[g] . B[:, q]
    #   A = [cx, cy, cz, 1, |c|^2, 0...]   (R, Gpad, 128)
    #   B = [-2x; |x|^2 + pinv; 1; 0...]   (R, 128, P)
    a = jnp.concatenate(
        [c32, jnp.ones((r, g, 1), jnp.float32),
         jnp.sum(c32 * c32, -1, keepdims=True),
         jnp.zeros((r, g, 128 - 5), jnp.float32)], axis=-1)
    a = jnp.pad(a, ((0, 0), (0, g_pad - g), (0, 0)))
    bmat = jnp.concatenate(
        [-2.0 * x32, (jnp.sum(x32 * x32, -1) + pinv)[..., None],
         jnp.ones((r, p0, 1), jnp.float32),
         jnp.zeros((r, p0, 128 - 5), jnp.float32)], axis=-1)
    # pad points to a lane multiple as invalid (pinv -> _BIG via row 3)
    pad_rows = jnp.zeros((r, p - p0, 128), jnp.float32)
    pad_rows = pad_rows.at[..., 3].set(_BIG).at[..., 4].set(1.0)
    bmat = jnp.concatenate([bmat, pad_rows], axis=1)        # (R, P, 128)
    bmat = jnp.swapaxes(bmat, 1, 2)                         # (R, 128, P)

    zp = [jnp.pad(z.astype(jnp.bfloat16), ((0, 0), (0, p - p0), (0, 0)))
          for z in z_list]
    cw_pad = [jnp.pad(cw.astype(jnp.float32), ((0, 0), (0, g_pad - g), (0, 0)))
              for cw in cw_list]

    kernel = functools.partial(_kernel, radii=tuple(radii),
                               nsamples=tuple(nsamples), gt=gt, p=p,
                               hidden=hidden)
    out = pl.pallas_call(
        kernel,
        grid=(r, g_pad // gt),
        in_specs=[
            pl.BlockSpec((1, gt, 128), lambda r_, g_: (r_, g_, 0),
                         memory_space=pltpu.VMEM),      # A
            pl.BlockSpec((1, 128, p), lambda r_, g_: (r_, 0, 0),
                         memory_space=pltpu.VMEM),      # B
            pl.BlockSpec((1, p, hidden), lambda r_, g_: (r_, 0, 0),
                         memory_space=pltpu.VMEM),      # z0
            pl.BlockSpec((1, p, hidden), lambda r_, g_: (r_, 0, 0),
                         memory_space=pltpu.VMEM),      # z1
            pl.BlockSpec((1, gt, hidden), lambda r_, g_: (r_, g_, 0),
                         memory_space=pltpu.VMEM),      # cw0
            pl.BlockSpec((1, gt, hidden), lambda r_, g_: (r_, g_, 0),
                         memory_space=pltpu.VMEM),      # cw1
            pl.BlockSpec((hidden, hidden), lambda r_, g_: (0, 0),
                         memory_space=pltpu.VMEM),      # w20
            pl.BlockSpec((hidden, hidden), lambda r_, g_: (0, 0),
                         memory_space=pltpu.VMEM),      # w21
            pl.BlockSpec((1, hidden), lambda r_, g_: (0, 0),
                         memory_space=pltpu.VMEM),      # b10
            pl.BlockSpec((1, hidden), lambda r_, g_: (0, 0),
                         memory_space=pltpu.VMEM),      # b11
            pl.BlockSpec((1, hidden), lambda r_, g_: (0, 0),
                         memory_space=pltpu.VMEM),      # b20
            pl.BlockSpec((1, hidden), lambda r_, g_: (0, 0),
                         memory_space=pltpu.VMEM),      # b21
        ],
        out_specs=pl.BlockSpec((1, gt, hidden), lambda r_, g_: (r_, g_, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, g_pad, hidden), jnp.bfloat16),
        interpret=interpret,
    )(a, bmat, zp[0], zp[1], cw_pad[0], cw_pad[1],
      w2_list[0].astype(jnp.bfloat16), w2_list[1].astype(jnp.bfloat16),
      b1_list[0].astype(jnp.float32), b1_list[1].astype(jnp.float32),
      b2_list[0].astype(jnp.float32), b2_list[1].astype(jnp.float32))

    return out[:, :g, :]
