"""Rulebook (neighbor-table) construction for sparse 3D convolution.

TPU-native replacement for the reference CUDA indice-pair build
(``pcdet/ops/spconv/src/indice_cuda.cu`` / ``include/spconv/spconv_ops.h:28-141``).

Instead of (kernelVolume, 2, N) gather/scatter index pairs, we build an
*output-gather* table ``nbr_idx`` of shape (K, N_out): for output voxel ``o``
and kernel tap ``k``, ``nbr_idx[k, o]`` is the row of the contributing input
voxel (or the sentinel ``N_in_cap``, which points at an implicit zero row).
This turns the convolution into pure gather + batched matmul — no scatter-add
on the forward path, which maps cleanly onto the TPU MXU.

Lookups are vectorized binary searches over the sorted key array
(``jnp.searchsorted``) — O(K * N * log N) integer work, all inside jit.
"""
import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .sparse_tensor import INVALID_KEY, SparseTensor, decode_keys, encode_keys


def _as3(v):
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def kernel_offsets(kernel_size):
    """Static (K, 3) numpy array of (dz, dy, dx) taps, row-major order."""
    kd, kh, kw = _as3(kernel_size)
    return np.array(list(itertools.product(range(kd), range(kh), range(kw))),
                    dtype=np.int32)


def _lookup(sorted_keys, query_keys, query_valid):
    """Binary-search query keys in sorted_keys; return row idx or sentinel.

    Returns int32 indices in [0, N_cap]; N_cap == not-found sentinel.
    """
    n_cap = sorted_keys.shape[0]
    pos = jnp.searchsorted(sorted_keys, query_keys, method='sort')
    pos = jnp.clip(pos, 0, n_cap - 1)
    found = (sorted_keys[pos] == query_keys) & query_valid
    return jnp.where(found, pos, n_cap).astype(jnp.int32)


def subm_rulebook(st: SparseTensor, kernel_size=3):
    """Submanifold conv rulebook: output coords == input coords.

    For each voxel and each kernel tap, find the input voxel at
    ``coord + tap - kernel//2`` (reference SubMConv3d semantics: padding
    kernel//2, stride 1, identity at the center tap).

    Returns: nbr_idx (K, N_cap) int32.
    """
    offsets = kernel_offsets(kernel_size)
    kd, kh, kw = _as3(kernel_size)
    center = np.array([kd // 2, kh // 2, kw // 2], np.int32)
    rel = offsets - center  # (K, 3) relative taps
    d, h, w = st.spatial_shape

    coords = decode_keys(st.keys, st.spatial_shape)  # (N, 4)
    valid = st.valid_mask()

    tables = []
    for k in range(rel.shape[0]):
        dz, dy, dx = int(rel[k, 0]), int(rel[k, 1]), int(rel[k, 2])
        if dz == 0 and dy == 0 and dx == 0:
            n_cap = st.capacity
            idx = jnp.arange(n_cap, dtype=jnp.int32)
            tables.append(jnp.where(valid, idx, n_cap))
            continue
        z = coords[:, 1] + dz
        y = coords[:, 2] + dy
        x = coords[:, 3] + dx
        in_bounds = ((z >= 0) & (z < d) & (y >= 0) & (y < h)
                     & (x >= 0) & (x < w) & valid)
        q = encode_keys(
            jnp.stack([coords[:, 0], z, y, x], axis=1), st.spatial_shape)
        q = jnp.where(in_bounds, q, INVALID_KEY)
        tables.append(_lookup(st.keys, q, in_bounds))
    return jnp.stack(tables, axis=0)


def downsample_rulebook(st: SparseTensor, kernel_size, stride, padding,
                        out_capacity):
    """Strided (regular) sparse conv rulebook + output voxel set.

    Conv semantics (reference SparseConv3d / getIndicePair,
    ``spconv_ops.h:28-141``): out spatial size = (in + 2p - k) // s + 1;
    output voxel ``o`` gathers input ``o*s - p + tap`` for tap in [0, k).

    The active output set is the union over inputs of their reachable output
    cells, computed as K*N candidates -> ``jnp.unique(size=out_capacity)``.

    Returns:
        out_st: SparseTensor with zero features (C=0 placeholder) holding the
            output keys/coords — features filled by the conv apply.
        nbr_idx: (K, out_capacity) int32 gather table into input rows.
    """
    kd, kh, kw = _as3(kernel_size)
    sd, sh, sw = _as3(stride)
    pd, ph, pw = _as3(padding)
    d, h, w = st.spatial_shape
    od = (d + 2 * pd - kd) // sd + 1
    oh = (h + 2 * ph - kh) // sh + 1
    ow = (w + 2 * pw - kw) // sw + 1
    out_shape = (od, oh, ow)

    offsets = kernel_offsets(kernel_size)
    coords = decode_keys(st.keys, st.spatial_shape)
    valid = st.valid_mask()

    # 1) candidate output cells from the input side
    cand = []
    for k in range(offsets.shape[0]):
        dz, dy, dx = int(offsets[k, 0]), int(offsets[k, 1]), int(offsets[k, 2])
        z_num = coords[:, 1] + pd - dz
        y_num = coords[:, 2] + ph - dy
        x_num = coords[:, 3] + pw - dx
        oz, oy, ox = z_num // sd, y_num // sh, x_num // sw
        ok = ((z_num % sd == 0) & (y_num % sh == 0) & (x_num % sw == 0)
              & (oz >= 0) & (oz < od) & (oy >= 0) & (oy < oh)
              & (ox >= 0) & (ox < ow) & valid)
        q = encode_keys(jnp.stack([coords[:, 0], oz, oy, ox], 1), out_shape)
        cand.append(jnp.where(ok, q, INVALID_KEY))
    cand = jnp.concatenate(cand)

    out_keys = jnp.unique(cand, size=out_capacity, fill_value=INVALID_KEY)
    out_valid = out_keys != INVALID_KEY
    n_out = jnp.sum(out_valid.astype(jnp.int32))

    # 2) output-side gather table
    out_coords = decode_keys(out_keys, out_shape)
    tables = []
    for k in range(offsets.shape[0]):
        dz, dy, dx = int(offsets[k, 0]), int(offsets[k, 1]), int(offsets[k, 2])
        z = out_coords[:, 1] * sd - pd + dz
        y = out_coords[:, 2] * sh - ph + dy
        x = out_coords[:, 3] * sw - pw + dx
        in_bounds = ((z >= 0) & (z < d) & (y >= 0) & (y < h)
                     & (x >= 0) & (x < w) & out_valid)
        q = encode_keys(
            jnp.stack([out_coords[:, 0], z, y, x], 1), st.spatial_shape)
        q = jnp.where(in_bounds, q, INVALID_KEY)
        tables.append(_lookup(st.keys, q, in_bounds))
    nbr_idx = jnp.stack(tables, axis=0)

    out_st = SparseTensor(
        features=jnp.zeros((out_capacity, 0), st.features.dtype),
        keys=out_keys, nvalid=n_out, spatial_shape=out_shape,
        batch_size=st.batch_size)
    return out_st, nbr_idx
