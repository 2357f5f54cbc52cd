"""Pallas rotated-overlap kernel vs the XLA clipper (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from fv2p_tpu.ops.pallas import rotated_iou
from fv2p_tpu.utils import box_utils, iou3d


def _random_boxes(n, seed):
    rng = np.random.RandomState(seed)
    b = np.zeros((n, 7), np.float32)
    b[:, :2] = rng.uniform(0, 30, (n, 2))
    b[:, 2] = rng.uniform(-2, 0, n)
    b[:, 3:6] = rng.uniform(1.0, 5.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_pallas_overlap_matches_xla():
    a = _random_boxes(40, 0)
    b = _random_boxes(30, 1)
    ca = iou3d._bev_corners_ccw(jnp.asarray(a))
    cb = iou3d._bev_corners_ccw(jnp.asarray(b))
    got = np.asarray(rotated_iou.overlap_matrix(ca, cb, block_n=16, block_m=16))
    ref = np.asarray(iou3d.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_overlap_padding_and_degenerate():
    a = _random_boxes(10, 2)
    a[3, 3:6] = 0.0  # zero-size box
    b = a.copy()
    ca = iou3d._bev_corners_ccw(jnp.asarray(a))
    got = np.asarray(rotated_iou.overlap_matrix(ca, ca, block_n=8, block_m=8))
    assert np.isfinite(got).all()
    # self-overlap equals own area for non-degenerate boxes
    for i in range(10):
        if i == 3:
            continue
        np.testing.assert_allclose(got[i, i], a[i, 3] * a[i, 4], rtol=1e-4)
