"""Exact 3-NN search: the memory-bounded chunked-scan formulation
(pointops.three_nn) must match a brute-force numpy oracle exactly —
indices, distances, and lowest-index tie-breaking (reference
pointnet2_batch/src/interpolate_gpu.cu three_nn semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from fv2p_tpu.ops import pointops


def _brute_3nn(src, valid, query):
    d2 = ((query[:, None, :] - src[None, :, :]) ** 2).sum(-1)
    d2 = np.where(valid[None, :], d2, 1e10)
    idx = np.argsort(d2, axis=-1, kind='stable')[:, :3]
    return np.take_along_axis(d2, idx, axis=-1), idx


def test_three_nn_exact_vs_bruteforce():
    rng = np.random.RandomState(0)
    N, M = 777, 513                        # non-multiples of the chunk size
    src = rng.randn(N, 3).astype(np.float32) * 10
    query = rng.randn(M, 3).astype(np.float32) * 10
    valid = rng.rand(N) > 0.2

    d_ref, i_ref = _brute_3nn(src, valid, query)
    d_got, i_got = jax.jit(
        lambda s, v, q: pointops.three_nn(s, v, q, src_chunk=256)
    )(jnp.asarray(src), jnp.asarray(valid), jnp.asarray(query))
    np.testing.assert_array_equal(np.asarray(i_got), i_ref)
    np.testing.assert_allclose(np.asarray(d_got), d_ref, rtol=1e-4, atol=1e-4)


def test_three_nn_tie_breaking_lowest_index():
    # duplicate source points: ties must resolve to the lowest index
    src = np.array([[1, 0, 0], [1, 0, 0], [0, 0, 0], [0, 0, 0], [5, 5, 5],
                    [1, 0, 0]], np.float32)
    query = np.array([[0.4, 0, 0]], np.float32)
    valid = np.ones(len(src), bool)
    _, idx = pointops.three_nn(jnp.asarray(src), jnp.asarray(valid),
                               jnp.asarray(query), src_chunk=2)
    np.testing.assert_array_equal(np.asarray(idx)[0], [2, 3, 0])


def test_three_nn_under_vmap_matches_single():
    rng = np.random.RandomState(1)
    B, N, M = 2, 300, 100
    src = rng.randn(B, N, 3).astype(np.float32)
    query = rng.randn(B, M, 3).astype(np.float32)
    valid = rng.rand(B, N) > 0.3

    d_b, i_b = jax.vmap(
        lambda s, v, q: pointops.three_nn(s, v, q, src_chunk=128)
    )(jnp.asarray(src), jnp.asarray(valid), jnp.asarray(query))
    for b in range(B):
        d_ref, i_ref = _brute_3nn(src[b], valid[b], query[b])
        np.testing.assert_array_equal(np.asarray(i_b[b]), i_ref)


def test_interpolate_level_blocked_matches_flat():
    """The decoder's per-sample blocked 3-NN path (host-rulebook layout,
    SparseTensor.sample_cap > 0) must produce the same interpolation as the
    batch-flat masked scan it replaces."""
    from fv2p_tpu.models.backbones_3d.pfe.residual_v2p_decoder import \
        _interpolate_level
    from fv2p_tpu.ops.sparse.sparse_tensor import from_host_coords

    rng = np.random.RandomState(3)
    b, cap, c, k = 3, 200, 8, 64
    shape = (16, 32, 32)
    coords = np.zeros((b, cap, 3), np.int64)
    valid = np.zeros((b, cap), bool)
    feats = rng.randn(b * cap, c).astype(np.float32)
    for i in range(b):
        nv = rng.randint(cap // 2, cap)
        zyx = rng.randint(0, 16, size=(nv, 3))
        key = (zyx[:, 1] * shape[2] + zyx[:, 2]) * shape[0] + zyx[:, 0]
        order = np.argsort(np.unique(key))
        key_u = np.unique(key)[order]
        z = key_u % shape[0]
        yx = key_u // shape[0]
        coords[i, :len(key_u)] = np.stack(
            [z, yx // shape[2], yx % shape[2]], axis=-1)
        valid[i, :len(key_u)] = True

    st = from_host_coords(jnp.asarray(coords, jnp.int32), jnp.asarray(valid),
                          jnp.asarray(feats), shape, b)
    assert st.sample_cap == cap
    kp = rng.uniform(0, 1.6, size=(b, k, 3)).astype(np.float32)
    args = (1, (0.1, 0.1, 0.1), (0, 0, 0, 1.6, 1.6, 1.6), jnp.asarray(kp), b)

    blocked = _interpolate_level(st, *args)
    flat = _interpolate_level(st.replace(sample_cap=0), *args)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(flat),
                               rtol=1e-5, atol=1e-5)


def test_ball_query_group_onehot_matches_gather():
    """The MXU one-hot slot-selection formulation must reproduce the gather
    formulation exactly (each one-hot row has a single nonzero, so the
    matmul IS the gather), including backfill of empty slots and zeroed
    neighborless queries."""
    rng = np.random.RandomState(3)
    m, n, c = 37, 96, 13
    centers = rng.randn(m, 3).astype(np.float32)
    xyz = rng.randn(n, 3).astype(np.float32)
    feats = rng.randn(n, c).astype(np.float32)
    valid = rng.rand(n) > 0.2
    # make some centers neighborless
    centers[:4] += 100.0

    for radius, ns in [(0.7, 8), (1.5, 16)]:
        ga = pointops.ball_query_group(
            jnp.asarray(centers), jnp.asarray(xyz), jnp.asarray(valid),
            jnp.asarray(feats), radius, ns, via='gather')
        oh = pointops.ball_query_group(
            jnp.asarray(centers), jnp.asarray(xyz), jnp.asarray(valid),
            jnp.asarray(feats), radius, ns, via='onehot')
        for a, b_, name in zip(ga, oh, ('xyz', 'feats', 'any')):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-5, atol=1e-5, err_msg=name)


def test_ball_query_group_precomputed_d2():
    rng = np.random.RandomState(4)
    m, n, c = 11, 64, 5
    centers = rng.randn(m, 3).astype(np.float32)
    xyz = rng.randn(n, 3).astype(np.float32)
    feats = rng.randn(n, c).astype(np.float32)
    valid = np.ones(n, bool)
    d2 = ((centers[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    a = pointops.ball_query_group(
        jnp.asarray(centers), jnp.asarray(xyz), jnp.asarray(valid),
        jnp.asarray(feats), 1.0, 8)
    b_ = pointops.ball_query_group(
        jnp.asarray(centers), jnp.asarray(xyz), jnp.asarray(valid),
        jnp.asarray(feats), 1.0, 8, d2=jnp.asarray(d2))
    for x, y in zip(a, b_):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)


def test_three_nn_pallas_kernel_matches_exact():
    """The Pallas 3NN kernel (interpret mode on CPU) must agree with the
    XLA exact path on indices, including lowest-index tie-breaking on
    duplicated points; distances may differ only by the matmul-vs-
    elementwise rounding (the kernel form matches the CUDA reference)."""
    from fv2p_tpu.ops.pallas.three_nn import three_nn_pallas

    rng = np.random.RandomState(7)
    src = rng.randn(700, 3).astype(np.float32) * 10
    q = rng.randn(300, 3).astype(np.float32) * 10
    valid = rng.rand(700) > 0.15
    d_ref, i_ref = pointops.three_nn(
        jnp.asarray(src), jnp.asarray(valid), jnp.asarray(q))
    d_k, i_k = three_nn_pallas(
        jnp.asarray(src), jnp.asarray(valid), jnp.asarray(q),
        bm=128, bn=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_k), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-3)

    # exact ties from duplicated points
    src2 = np.repeat(rng.randn(60, 3).astype(np.float32), 4, axis=0)
    q2 = src2[::5] + 1e-6
    d_ref, i_ref = pointops.three_nn(
        jnp.asarray(src2), jnp.ones(len(src2), bool), jnp.asarray(q2))
    d_k, i_k = three_nn_pallas(
        jnp.asarray(src2), jnp.ones(len(src2), bool), jnp.asarray(q2),
        bm=128, bn=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_k), np.asarray(i_ref))
