"""Pallas FPS kernel: interpret-mode equivalence with the scan FPS,
including validity masks and the batch dispatcher's wraparound padding."""
import jax
import jax.numpy as jnp
import numpy as np

from fv2p_tpu.ops import pointops
from fv2p_tpu.ops.pallas.fps import fps_pallas


def test_fps_pallas_matches_scan():
    rng = np.random.RandomState(0)
    B, N, K = 3, 400, 128
    pts = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 50)
    valid = np.ones((B, N), bool)
    valid[1, 250:] = False
    valid[2, 300:] = False
    valid = jnp.asarray(valid)

    got = np.asarray(fps_pallas(pts, valid, K, interpret=True))
    ref = np.asarray(jax.vmap(
        lambda p, v: pointops.farthest_point_sample(p, v, K))(pts, valid))
    np.testing.assert_array_equal(got, ref)


def test_fps_pallas_all_invalid_row():
    """A row with zero valid points must select index 0 everywhere (in-range)
    on both the kernel and the XLA scan path (ADVICE r1: the kernel used to
    return the out-of-range index n)."""
    rng = np.random.RandomState(2)
    B, N, K = 2, 64, 16
    pts = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    valid = np.ones((B, N), bool)
    valid[1, :] = False
    valid = jnp.asarray(valid)

    got = np.asarray(fps_pallas(pts, valid, K, interpret=True))
    ref = np.asarray(jax.vmap(
        lambda p, v: pointops.farthest_point_sample(p, v, K))(pts, valid))
    assert (got >= 0).all() and (got < N).all()
    np.testing.assert_array_equal(got[1], np.zeros(K, np.int32))
    np.testing.assert_array_equal(got, ref)


def test_batch_dispatcher_wraparound():
    rng = np.random.RandomState(1)
    B, N, K = 2, 64, 32
    pts = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    valid = np.ones((B, N), bool)
    valid[0, 10:] = False          # only 10 valid points < K=32
    valid = jnp.asarray(valid)

    out = np.asarray(pointops.farthest_point_sample_batch(pts, valid, K))
    ref = np.asarray(jax.vmap(
        lambda p, v: pointops.farthest_point_sample(p, v, K))(pts, valid))
    np.testing.assert_array_equal(out, ref)
    # wraparound: positions >= 10 repeat the first selections cyclically
    np.testing.assert_array_equal(out[0, 10:20], out[0, :10])
