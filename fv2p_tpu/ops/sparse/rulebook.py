"""Rulebook (neighbor-table) construction for sparse 3D convolution.

TPU-native replacement for the reference CUDA indice-pair build
(``pcdet/ops/spconv/src/indice_cuda.cu`` / ``include/spconv/spconv_ops.h:28-141``).

Instead of (kernelVolume, 2, N) gather/scatter index pairs, we build an
*output-gather* table ``nbr_idx`` of shape (K, N_out): for output voxel ``o``
and kernel tap ``k``, ``nbr_idx[k, o]`` is the row of the contributing input
voxel (or the sentinel ``N_in_cap``, pointing at an implicit zero row). The
convolution is then pure gather + batched matmul on the MXU.

Lookups use the SparseTensor's per-column z-occupancy bitmask index
(``SparseTensor.lookup``): gathers + popcounts only — NO device sorts,
searches, or ``unique`` anywhere (TPU sorts are slow; the first-generation
searchsorted design spent ~60 ms/scan here).
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from .sparse_tensor import (INVALID_KEY, SparseTensor, decode_keys,
                            from_occupancy_grid)


def _as3(v):
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def kernel_offsets(kernel_size):
    """Static (K, 3) numpy array of (dz, dy, dx) taps, row-major order."""
    kd, kh, kw = _as3(kernel_size)
    return np.array(list(itertools.product(range(kd), range(kh), range(kw))),
                    dtype=np.int32)


def subm_rulebook(st: SparseTensor, kernel_size=3):
    """Submanifold conv rulebook: output coords == input coords.

    For each voxel and each kernel tap, find the input voxel at
    ``coord + tap - kernel//2`` (reference SubMConv3d semantics).
    Returns: nbr_idx (K, N_cap) int32.
    """
    offsets = kernel_offsets(kernel_size)
    kd, kh, kw = _as3(kernel_size)
    center = np.array([kd // 2, kh // 2, kw // 2], np.int32)
    rel = jnp.asarray(offsets - center)
    d, h, w = st.spatial_shape

    coords = decode_keys(st.keys, st.spatial_shape)
    valid = st.valid_mask()

    z = coords[None, :, 1] + rel[:, 0:1]      # (K, N)
    y = coords[None, :, 2] + rel[:, 1:2]
    x = coords[None, :, 3] + rel[:, 2:3]
    b = jnp.broadcast_to(coords[None, :, 0], z.shape)
    ok = ((z >= 0) & (z < d) & (y >= 0) & (y < h)
          & (x >= 0) & (x < w) & valid[None, :])
    return st.lookup(b, z, y, x, ok)


def _downsample_grid(st, kernel, stride, padding, out_shape):
    """Active output cells of a strided conv, from input occupancy planes.

    out(b, oz, oy, ox) active iff any input (b, oz*sd-pd+tz, oy*sh-ph+ty,
    ox*sw-pw+tx) active. Computed with static bit extraction over z and
    strided spatial slices over (y, x) — zero scatters.

    Returns flat bool grid (B*OH*OW*OD,) in z-last raster order.
    """
    kd, kh, kw = kernel
    sd, sh, sw = stride
    pd, ph, pw = padding
    d, h, w = st.spatial_shape
    od, oh, ow = out_shape
    b = st.batch_size

    occ0 = st.occ0.reshape(b, h, w)
    occ1 = st.occ1.reshape(b, h, w)

    def in_bit(z):
        if z < 32:
            return ((occ0 >> np.uint32(z)) & jnp.uint32(1)).astype(bool)
        return ((occ1 >> np.uint32(z - 32)) & jnp.uint32(1)).astype(bool)

    # spatial padding once, shared by all taps
    pr = max(0, (oh - 1) * sh - ph + (kh - 1) - (h - 1))
    pc = max(0, (ow - 1) * sw - pw + (kw - 1) - (w - 1))

    def spatial_or(zplane):
        p = jnp.pad(zplane, ((0, 0), (ph, pr), (pw, pc)))
        acc = None
        for ty in range(kh):
            for tx in range(kw):
                sl = p[:, ty: ty + (oh - 1) * sh + 1: sh,
                       tx: tx + (ow - 1) * sw + 1: sw]
                acc = sl if acc is None else (acc | sl)
        return acc                                   # (B, OH, OW)

    out_bits = []
    for oz in range(od):
        zb = None
        for t in range(kd):
            z = oz * sd - pd + t
            if 0 <= z < d:
                zb = in_bit(z) if zb is None else (zb | in_bit(z))
        if zb is None:
            out_bits.append(jnp.zeros((b, oh, ow), bool))
        else:
            out_bits.append(spatial_or(zb))

    grid = jnp.stack(out_bits, axis=-1)              # (B, OH, OW, OD)
    return grid.reshape(-1)


def downsample_rulebook(st: SparseTensor, kernel_size, stride, padding,
                        out_capacity):
    """Strided (regular) sparse conv rulebook + output voxel set.

    Conv semantics (reference SparseConv3d / getIndicePair):
    out size = (in + 2p - k) // s + 1; output ``o`` gathers input
    ``o*s - p + tap``. The active output set is computed by OR-scattering
    all per-input candidate cells into a dense bool grid of the (smaller)
    output level and ranking active cells with a cumsum — no sort/unique.

    Returns (out_st with empty features, nbr_idx (K, out_capacity),
    inv_idx (K, in_capacity) — the transpose table for the scatter-free
    conv backward; unique per tap so the build scatter vectorizes).
    """
    kd, kh, kw = _as3(kernel_size)
    sd, sh, sw = _as3(stride)
    pd, ph, pw = _as3(padding)
    d, h, w = st.spatial_shape
    od = (d + 2 * pd - kd) // sd + 1
    oh = (h + 2 * ph - kh) // sh + 1
    ow = (w + 2 * pw - kw) // sw + 1
    out_shape = (od, oh, ow)

    offsets = jnp.asarray(kernel_offsets(kernel_size))
    coords = decode_keys(st.keys, st.spatial_shape)
    valid = st.valid_mask()

    # 1) active output set from the INPUT occupancy planes, pure bit math:
    # no scatter (TPU scatters with colliding indices serialize).
    grid = _downsample_grid(st, (kd, kh, kw), (sd, sh, sw), (pd, ph, pw),
                            out_shape)
    out_st = from_occupancy_grid(grid, out_capacity, out_shape,
                                 st.batch_size, st.features.dtype)

    # 2) output-side gather table, resolved on the input's column index
    out_coords = decode_keys(out_st.keys, out_shape)
    out_valid = out_st.valid_mask()
    iz = out_coords[None, :, 1] * sd - pd + offsets[:, 0:1]
    iy = out_coords[None, :, 2] * sh - ph + offsets[:, 1:2]
    ix = out_coords[None, :, 3] * sw - pw + offsets[:, 2:3]
    ib = jnp.broadcast_to(out_coords[None, :, 0], iz.shape)
    in_bounds = ((iz >= 0) & (iz < d) & (iy >= 0) & (iy < h)
                 & (ix >= 0) & (ix < w) & out_valid[None, :])
    nbr_idx = st.lookup(ib, iz, iy, ix, in_bounds)

    # inverse table: inv[k, i] = o with nbr[k, o] = i (unique per tap)
    n_in = st.capacity
    n_out = out_capacity
    k = nbr_idx.shape[0]
    o_ids = jnp.broadcast_to(
        jnp.arange(n_out, dtype=jnp.int32)[None, :], nbr_idx.shape)
    inv_idx = jnp.full((k, n_in + 1), n_out, jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(k)[:, None], nbr_idx.shape)
    inv_idx = inv_idx.at[rows, nbr_idx].set(
        o_ids, mode='drop', unique_indices=True)[:, :n_in]
    return out_st, nbr_idx, inv_idx
