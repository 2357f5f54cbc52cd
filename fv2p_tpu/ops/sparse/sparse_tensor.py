"""Sparse voxel tensor for TPU: fixed-capacity, sorted-key representation.

TPU-native re-design of the reference ``spconv.SparseConvTensor``
(``pcdet/ops/spconv/structure.py:21-71``). Instead of a ragged (N, 1+3) int
coordinate list, we keep a *fixed-capacity* array of linearized coordinate
keys, sorted ascending, with ``INVALID_KEY`` (int32 max) padding at the tail.
Sorted keys make neighbor lookup a vectorized binary search
(``jnp.searchsorted``) — the XLA replacement for the CUDA hash-grid rulebook
build (``include/spconv/indice.cu.h``).

Key linearization: ``key = ((b * D + z) * H + y) * W + x`` over the
(z, y, x) spatial shape; the caller must guarantee ``B * D * H * W < 2**31``.
"""
from typing import Tuple

import flax.struct
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
        spatial_shape: static (D, H, W).
        batch_size: static int.
    """
    features: jnp.ndarray
    keys: jnp.ndarray
    nvalid: jnp.ndarray
    spatial_shape: Tuple[int, int, int] = flax.struct.field(pytree_node=False)
    batch_size: int = flax.struct.field(pytree_node=False)

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


def encode_keys(coords_bzyx, spatial_shape):
    """(N, 4) int [b, z, y, x] -> (N,) int32 linearized keys."""
    d, h, w = spatial_shape
    b, z, y, x = (coords_bzyx[:, 0], coords_bzyx[:, 1],
                  coords_bzyx[:, 2], coords_bzyx[:, 3])
    return (((b * d + z) * h + y) * w + x).astype(jnp.int32)


def decode_keys(keys, spatial_shape):
    d, h, w = spatial_shape
    x = keys % w
    y = (keys // w) % h
    z = (keys // (w * h)) % d
    b = keys // (w * h * d)
    return jnp.stack([b, z, y, x], axis=1)


def from_coords(coords_bzyx, features, spatial_shape, batch_size,
                valid_mask=None):
    """Build a SparseTensor from (possibly unsorted, padded) coords+features.

    Args:
        coords_bzyx: (N_cap, 4) int32; rows where ``valid_mask`` is False are
            ignored (their key becomes INVALID_KEY and sorts to the tail).
        features: (N_cap, C).
        valid_mask: (N_cap,) bool; default: all valid.
    """
    n_cap = coords_bzyx.shape[0]
    keys = encode_keys(coords_bzyx, spatial_shape)
    if valid_mask is None:
        valid_mask = jnp.ones((n_cap,), bool)
    keys = jnp.where(valid_mask, keys, INVALID_KEY)
    order = jnp.argsort(keys)
    keys = keys[order]
    features = jnp.where(valid_mask[order][:, None], features[order], 0.0)
    nvalid = jnp.sum(valid_mask.astype(jnp.int32))
    return SparseTensor(features=features, keys=keys, nvalid=nvalid,
                        spatial_shape=tuple(int(s) for s in spatial_shape),
                        batch_size=int(batch_size))


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
