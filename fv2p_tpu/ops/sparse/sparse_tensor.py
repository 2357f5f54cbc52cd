"""Sparse voxel tensor for TPU: fixed-capacity, sorted-key representation.

TPU-native re-design of the reference ``spconv.SparseConvTensor``
(``pcdet/ops/spconv/structure.py:21-71``). Instead of a ragged (N, 1+3) int
coordinate list, we keep a *fixed-capacity* array of linearized coordinate
keys, sorted ascending, with ``INVALID_KEY`` (int32 max) padding at the tail.

Key linearization is **z-last**: ``key = ((b * H + y) * W + x) * D + z``.
Rows of one BEV column (b, y, x) are therefore contiguous in sorted order,
which enables an entirely sort-free neighbor lookup: each column carries a
64-bit z-occupancy mask (two uint32 planes) plus the row index of its first
voxel; ``row(b,z,y,x) = start[col] + popcount(bits below z)``. This replaces
the CUDA hash-grid rulebook build (``include/spconv/indice.cu.h``) with
gathers + popcounts — no device sort anywhere on the hot path.

The caller must guarantee ``B * D * H * W < 2**31``.
"""
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

INVALID_KEY = np.iinfo(np.int32).max


@flax.struct.dataclass
class SparseTensor:
    """Fixed-capacity sparse voxel tensor (a pytree).

    Attributes:
        features: (N_cap, C) float array; rows past ``nvalid`` are zeros.
        keys: (N_cap,) int32 sorted linearized coords; invalid = INVALID_KEY.
        nvalid: () int32 number of valid voxels.
        occ0, occ1: (B*H*W,) uint32 per-column z-occupancy bit planes.
        start: (B*H*W,) int32 row index of each column's first voxel.
        spatial_shape: static (D, H, W).
        batch_size: static int.
        sample_cap: static int; when > 0, rows are per-sample blocks of this
            fixed size — sample b's voxels live in rows
            [b*sample_cap, (b+1)*sample_cap) (host-rulebook layout). 0 means
            globally sorted with dynamic per-sample boundaries.
    """
    features: jnp.ndarray
    keys: jnp.ndarray
    nvalid: jnp.ndarray
    occ0: jnp.ndarray = None     # None when lookups are host-precomputed
    occ1: jnp.ndarray = None
    start: jnp.ndarray = None
    spatial_shape: Tuple[int, int, int] = flax.struct.field(
        pytree_node=False, default=(0, 0, 0))
    batch_size: int = flax.struct.field(pytree_node=False, default=1)
    sample_cap: int = flax.struct.field(pytree_node=False, default=0)

    @property
    def capacity(self):
        return self.keys.shape[0]

    @property
    def num_channels(self):
        return self.features.shape[-1]

    def valid_mask(self):
        return self.keys != INVALID_KEY

    def coords(self):
        """Decode keys -> (N_cap, 4) int32 [b, z, y, x] (invalid rows: junk)."""
        return decode_keys(self.keys, self.spatial_shape)

    def lookup(self, b, z, y, x, valid):
        """Row index of voxel (b, z, y, x), or capacity (zero row) if absent.

        All args broadcastable int32 arrays; z-occupancy popcount lookup,
        no sort/search.
        """
        d, h, w = self.spatial_shape
        col = (b * h + y) * w + x
        col = jnp.where(valid, col, 0)
        o0 = jnp.take(self.occ0, col)
        o1 = jnp.take(self.occ1, col)
        zc = jnp.clip(z, 0, d - 1).astype(jnp.uint32)
        in_lo = zc < 32
        bit_lo = jnp.left_shift(jnp.uint32(1), jnp.where(in_lo, zc, 0))
        bit_hi = jnp.left_shift(jnp.uint32(1), jnp.where(in_lo, 0, zc - 32))
        present = jnp.where(in_lo, (o0 & bit_lo) != 0, (o1 & bit_hi) != 0)
        below_lo = jax.lax.population_count(o0 & (bit_lo - 1))
        below_hi = (jax.lax.population_count(o0)
                    + jax.lax.population_count(o1 & (bit_hi - 1)))
        below = jnp.where(in_lo, below_lo, below_hi).astype(jnp.int32)
        row = jnp.take(self.start, col) + below
        return jnp.where(present & valid, row, self.capacity).astype(jnp.int32)


def encode_keys(coords_bzyx, spatial_shape):
    """(N, 4) int [b, z, y, x] -> (N,) int32 z-last linearized keys."""
    d, h, w = spatial_shape
    b, z, y, x = (coords_bzyx[:, 0], coords_bzyx[:, 1],
                  coords_bzyx[:, 2], coords_bzyx[:, 3])
    return (((b * h + y) * w + x) * d + z).astype(jnp.int32)


def decode_keys(keys, spatial_shape):
    d, h, w = spatial_shape
    z = keys % d
    col = keys // d
    x = col % w
    y = (col // w) % h
    b = col // (w * h)
    return jnp.stack([b, z, y, x], axis=1)


def _pack_planes(grid_cols_d):
    """(cols, D) bool -> (occ0, occ1) uint32 planes via unrolled shifts."""
    d = grid_cols_d.shape[1]
    occ0 = jnp.zeros((grid_cols_d.shape[0],), jnp.uint32)
    occ1 = jnp.zeros((grid_cols_d.shape[0],), jnp.uint32)
    for z in range(d):
        bit = grid_cols_d[:, z].astype(jnp.uint32)
        if z < 32:
            occ0 = occ0 | (bit << np.uint32(z))
        else:
            occ1 = occ1 | (bit << np.uint32(z - 32))
    return occ0, occ1


def _start_from_planes(occ0, occ1):
    counts = (jax.lax.population_count(occ0)
              + jax.lax.population_count(occ1)).astype(jnp.int32)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])


def _build_column_index(col, z, valid, num_cols, d):
    """Per-voxel bits -> column occupancy planes + start offsets.

    TPU scatters SERIALIZE on (potentially) colliding indices, so instead of
    scatter-adding bits per column we scatter ones at unique (col, z) cells
    (``unique_indices=True`` keeps it vectorized) and pack the planes with
    static shifts. Voxels must be unique. Returns (occ0, occ1, start).
    """
    cell = col * d + z
    tgt = jnp.where(valid, cell, num_cols * d)  # out-of-range drops
    grid = jnp.zeros((num_cols * d,), bool).at[tgt].set(
        True, mode='drop', unique_indices=True)
    occ0, occ1 = _pack_planes(grid.reshape(num_cols, d))
    return occ0, occ1, _start_from_planes(occ0, occ1)


def from_coords(coords_bzyx, features, spatial_shape, batch_size,
                valid_mask=None):
    """Build a SparseTensor from (possibly unsorted, padded) coords+features.

    Sorting is done WITHOUT a sort: each voxel's sorted rank is computed from
    the column occupancy index (start + popcount-below), then features/keys
    are scattered to their ranks.
    """
    n_cap = coords_bzyx.shape[0]
    d, h, w = (int(s) for s in spatial_shape)
    num_cols = int(batch_size) * h * w
    if valid_mask is None:
        valid_mask = jnp.ones((n_cap,), bool)

    b, z = coords_bzyx[:, 0], coords_bzyx[:, 1]
    y, x = coords_bzyx[:, 2], coords_bzyx[:, 3]
    col = (b * h + y) * w + x
    occ0, occ1, start = _build_column_index(col, z, valid_mask, num_cols, d)

    # rank of each voxel = start[col] + popcount(bits below z)
    colc = jnp.where(valid_mask, col, 0)
    o0 = jnp.take(occ0, colc)
    o1 = jnp.take(occ1, colc)
    zc = z.astype(jnp.uint32)
    in_lo = zc < 32
    bit_lo = jnp.left_shift(jnp.uint32(1), jnp.where(in_lo, zc, 0))
    bit_hi = jnp.left_shift(jnp.uint32(1), jnp.where(in_lo, 0, zc - 32))
    below = jnp.where(
        in_lo, jax.lax.population_count(o0 & (bit_lo - 1)),
        jax.lax.population_count(o0)
        + jax.lax.population_count(o1 & (bit_hi - 1))).astype(jnp.int32)
    rank = jnp.take(start, colc) + below
    rank = jnp.where(valid_mask, rank, n_cap)

    keys_in = encode_keys(coords_bzyx, spatial_shape)
    keys = jnp.full((n_cap + 1,), INVALID_KEY, jnp.int32).at[rank].set(
        jnp.where(valid_mask, keys_in, INVALID_KEY), mode='drop',
        unique_indices=True)[:n_cap]
    feats = jnp.zeros((n_cap + 1, features.shape[-1]), features.dtype).at[rank].set(
        jnp.where(valid_mask[:, None], features, 0.0), mode='drop',
        unique_indices=True)[:n_cap]
    nvalid = jnp.sum(valid_mask.astype(jnp.int32))
    return SparseTensor(features=feats, keys=keys, nvalid=nvalid,
                        occ0=occ0, occ1=occ1, start=start,
                        spatial_shape=(d, h, w), batch_size=int(batch_size))


def from_host_coords(coords_bzyx_per_sample, valid, features_flat,
                     spatial_shape, batch_size):
    """SparseTensor from host-sorted per-sample coords (no occ index).

    coords_bzyx_per_sample: (B, cap, 3) int32 (z, y, x), already in z-last
    key order per sample; valid: (B, cap); features_flat: (B*cap, C).
    """
    b, cap = coords_bzyx_per_sample.shape[:2]
    batch_col = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None, None], (b, cap, 1))
    coords4 = jnp.concatenate(
        [batch_col, coords_bzyx_per_sample], axis=-1).reshape(b * cap, 4)
    keys = encode_keys(coords4, spatial_shape)
    vflat = valid.reshape(b * cap)
    keys = jnp.where(vflat, keys, INVALID_KEY)
    feats = jnp.where(vflat[:, None], features_flat, 0.0)
    return SparseTensor(features=feats, keys=keys,
                        nvalid=jnp.sum(vflat.astype(jnp.int32)),
                        spatial_shape=tuple(int(x) for x in spatial_shape),
                        batch_size=int(batch_size), sample_cap=int(cap))


def from_occupancy_grid(grid_flat, capacity, spatial_shape, batch_size,
                        feat_dtype=jnp.float32):
    """Build an (empty-feature) SparseTensor from a flat bool occupancy grid.

    grid_flat: (B*H*W*D,) bool in z-last raster order (flat index == key).
    Active cells become rows in key order; no sort (cumsum ranking).
    """
    d, h, w = (int(s) for s in spatial_shape)
    num_cols = int(batch_size) * h * w

    rank = jnp.cumsum(grid_flat.astype(jnp.int32)) - 1
    n = grid_flat.shape[0]
    flat_keys = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    tgt = jnp.where(grid_flat & (rank < capacity), rank, capacity)
    keys = jnp.full((capacity + 1,), INVALID_KEY, jnp.int32).at[tgt].set(
        flat_keys, mode='drop', unique_indices=True)[:capacity]
    nvalid = jnp.minimum(jnp.sum(grid_flat.astype(jnp.int32)), capacity)

    # pack occupancy planes from the grid: (cols, D)
    gcol = grid_flat.reshape(num_cols, d)
    zbits = jnp.arange(d, dtype=jnp.uint32)
    lo = jnp.where(zbits < 32, jnp.left_shift(jnp.uint32(1),
                                              jnp.minimum(zbits, 31)), 0)
    hi = jnp.where(zbits >= 32, jnp.left_shift(jnp.uint32(1), zbits - 32), 0)
    occ0 = jnp.sum(jnp.where(gcol, lo[None, :], 0), axis=1, dtype=jnp.uint32)
    occ1 = jnp.sum(jnp.where(gcol, hi[None, :], 0), axis=1, dtype=jnp.uint32)
    counts = (jax.lax.population_count(occ0)
              + jax.lax.population_count(occ1)).astype(jnp.int32)
    start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])

    return SparseTensor(
        features=jnp.zeros((capacity, 0), feat_dtype), keys=keys,
        nvalid=nvalid, occ0=occ0, occ1=occ1, start=start,
        spatial_shape=(d, h, w), batch_size=int(batch_size))


def to_dense_zfolded(st: SparseTensor):
    """Sparse -> dense BEV with the z axis folded into channels.

    Implements HeightCompression semantics (reference
    ``height_compression.py:20-25``): torch does (N, C, D, H, W) ->
    (N, C*D, H, W), i.e. output channel index = c * D + z. We produce NHWC
    (B, H, W, C*D) — the TPU-preferred layout.
    """
    d, h, w = st.spatial_shape
    c = st.num_channels
    coords = st.coords()
    b, z, y, x = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    flat_sp = (b * h + y) * w + x
    flat_sp = jnp.where(st.valid_mask(), flat_sp, st.batch_size * h * w)
    dense = jnp.zeros((st.batch_size * h * w + 1, d, c), st.features.dtype)
    dense = dense.at[flat_sp, z].set(st.features, mode='drop')
    dense = dense[:-1].reshape(st.batch_size, h, w, d, c)
    dense = dense.transpose(0, 1, 2, 4, 3).reshape(st.batch_size, h, w, c * d)
    return dense
