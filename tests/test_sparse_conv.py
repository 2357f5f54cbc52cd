import jax
import jax.numpy as jnp
import numpy as np

from fv2p_tpu.ops.sparse import conv as sconv
from fv2p_tpu.ops.sparse import rulebook, sparse_tensor


def _random_sparse(rng, batch=2, shape=(8, 12, 10), n=40, cap=64, c=5):
    """Random active voxels with unique coords per batch."""
    d, h, w = shape
    lin = rng.choice(d * h * w, size=(batch, n // batch), replace=False)
    coords = []
    for b in range(batch):
        z, rem = lin[b] // (h * w), lin[b] % (h * w)
        y, x = rem // w, rem % w
        coords.append(np.stack([np.full_like(z, b), z, y, x], 1))
    coords = np.concatenate(coords).astype(np.int32)
    nv = coords.shape[0]
    coords_p = np.zeros((cap, 4), np.int32)
    coords_p[:nv] = coords
    feats = np.zeros((cap, c), np.float32)
    feats[:nv] = rng.randn(nv, c).astype(np.float32)
    valid = np.arange(cap) < nv
    st = sparse_tensor.from_coords(
        jnp.asarray(coords_p), jnp.asarray(feats), shape, batch,
        valid_mask=jnp.asarray(valid))
    dense = np.zeros((batch, d, h, w, c), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]] = feats[:nv]
    return st, dense


def _dense_conv3d(dense, w_kio, kernel, stride, padding):
    """Oracle: XLA dense 3D conv. w_kio: (K, Cin, Cout) row-major taps."""
    kd, kh, kw = kernel
    cin, cout = w_kio.shape[1], w_kio.shape[2]
    w = w_kio.reshape(kd, kh, kw, cin, cout)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(w), window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    return np.asarray(out)


def test_subm_conv_matches_dense_masked():
    rng = np.random.RandomState(0)
    st, dense = _random_sparse(rng)
    k = 27
    w = rng.randn(k, 5, 7).astype(np.float32) * 0.1

    nbr = rulebook.subm_rulebook(st, 3)
    out = sconv.sparse_conv_apply(st.features, nbr, jnp.asarray(w))
    out = np.asarray(out)

    ref = _dense_conv3d(dense, w, (3, 3, 3), (1, 1, 1), (1, 1, 1))
    coords = np.asarray(st.coords())
    valid = np.asarray(st.valid_mask())
    for i in np.where(valid)[0]:
        b, z, y, x = coords[i]
        np.testing.assert_allclose(out[i], ref[b, z, y, x], rtol=1e-4, atol=1e-4)
    # padded rows produce zeros after masking in the module path
    assert np.allclose(out[~valid], out[~valid])  # finite
    assert np.isfinite(out).all()


def test_strided_conv_matches_dense():
    rng = np.random.RandomState(1)
    st, dense = _random_sparse(rng, shape=(9, 12, 10))
    k = 27
    w = rng.randn(k, 5, 6).astype(np.float32) * 0.1

    out_st, nbr, inv = rulebook.downsample_rulebook(st, 3, 2, 1, out_capacity=512)
    out = np.asarray(sconv.sparse_conv_apply(st.features, nbr, jnp.asarray(w)))

    ref = _dense_conv3d(dense, w, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    assert out_st.spatial_shape == ref.shape[1:4]

    out_coords = np.asarray(out_st.coords())
    out_valid = np.asarray(out_st.valid_mask())
    hit = np.zeros(ref.shape[:4], bool)
    for i in np.where(out_valid)[0]:
        b, z, y, x = out_coords[i]
        np.testing.assert_allclose(out[i], ref[b, z, y, x], rtol=1e-4, atol=1e-4)
        hit[b, z, y, x] = True
    # every nonzero dense output cell must be in the active set
    nz = np.abs(ref).max(-1) > 1e-6
    assert not (nz & ~hit).any()


def test_asymmetric_kernel_stride():
    """conv_out pattern: kernel (3,1,1), stride (2,1,1), pad 0."""
    rng = np.random.RandomState(2)
    st, dense = _random_sparse(rng, shape=(9, 6, 5), n=30, cap=40, c=4)
    w = rng.randn(3, 4, 8).astype(np.float32) * 0.2

    out_st, nbr, inv = rulebook.downsample_rulebook(
        st, (3, 1, 1), (2, 1, 1), (0, 0, 0), out_capacity=40)
    out = np.asarray(sconv.sparse_conv_apply(st.features, nbr, jnp.asarray(w)))
    ref = _dense_conv3d(dense, w, (3, 1, 1), (2, 1, 1), (0, 0, 0))
    assert out_st.spatial_shape == ref.shape[1:4]
    out_coords = np.asarray(out_st.coords())
    for i in np.where(np.asarray(out_st.valid_mask()))[0]:
        b, z, y, x = out_coords[i]
        np.testing.assert_allclose(out[i], ref[b, z, y, x], rtol=1e-4, atol=1e-4)


def test_height_compression_layout():
    """to_dense_zfolded must match torch (N,C,D,H,W)->(N,C*D,H,W) channel order."""
    shape, batch, c = (2, 3, 4), 1, 3
    coords = np.array([[0, 1, 2, 3], [0, 0, 0, 0]], np.int32)
    feats = np.array([[1., 2., 3.], [4., 5., 6.]], np.float32)
    st = sparse_tensor.from_coords(jnp.asarray(coords), jnp.asarray(feats),
                                   shape, batch)
    dense = np.asarray(sparse_tensor.to_dense_zfolded(st))  # (B,H,W,C*D)
    assert dense.shape == (1, 3, 4, 6)
    # voxel at z=1,y=2,x=3 feat c -> channel c*D+1
    np.testing.assert_allclose(dense[0, 2, 3, [1, 3, 5]], [1., 2., 3.])
    np.testing.assert_allclose(dense[0, 0, 0, [0, 2, 4]], [4., 5., 6.])


def test_masked_batchnorm_ignores_padding():
    x = np.zeros((8, 4), np.float32)
    x[:5] = np.random.RandomState(0).randn(5, 4)
    mask = np.arange(8) < 5
    bn = sconv.MaskedBatchNorm()
    vars_ = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask),
                    use_running_average=False)
    y, new_vars = bn.apply(vars_, jnp.asarray(x), jnp.asarray(mask),
                           use_running_average=False, mutable=['batch_stats'])
    y = np.asarray(y)
    # valid rows normalized to ~zero mean unit var
    np.testing.assert_allclose(y[:5].mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(y[:5].var(0), 1.0, atol=1e-2)
    assert np.allclose(y[5:], 0.0)
    # running stats moved toward batch stats of the *valid* rows
    np.testing.assert_allclose(
        np.asarray(new_vars['batch_stats']['mean']), 0.01 * x[:5].mean(0), atol=1e-6)


def test_gradients_flow_through_sparse_conv():
    rng = np.random.RandomState(3)
    st, _ = _random_sparse(rng, n=20, cap=32)
    nbr = rulebook.subm_rulebook(st, 3)
    w = jnp.asarray(rng.randn(27, 5, 5).astype(np.float32) * 0.1)

    def loss_fn(w, feats):
        out = sconv.sparse_conv_apply(feats, nbr, w)
        return jnp.sum(out ** 2)

    gw, gf = jax.grad(loss_fn, argnums=(0, 1))(w, st.features)
    assert np.isfinite(np.asarray(gw)).all() and np.abs(np.asarray(gw)).sum() > 0
    assert np.isfinite(np.asarray(gf)).all()


def test_custom_vjp_matches_autodiff():
    """Scatter-free backward (inverse rulebook) must equal XLA autodiff."""
    rng = np.random.RandomState(7)
    st, _ = _random_sparse(rng, shape=(9, 12, 10))
    out_st, nbr, inv = rulebook.downsample_rulebook(st, 3, 2, 1, out_capacity=128)
    w = jnp.asarray(rng.randn(27, 5, 6).astype(np.float32) * 0.1)

    def loss_auto(w_, f_):
        return jnp.sum(sconv.sparse_conv_apply(f_, nbr, w_) ** 2)

    def loss_custom(w_, f_):
        return jnp.sum(sconv.sparse_conv_apply(f_, nbr, w_, inv_idx=inv) ** 2)

    ga = jax.grad(loss_auto, (0, 1))(w, st.features)
    gc = jax.grad(loss_custom, (0, 1))(w, st.features)
    for a, c in zip(ga, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-4)

    # subm path: mirror-tap inverse
    nbr_s = rulebook.subm_rulebook(st, 3)
    inv_s = jnp.flip(nbr_s, axis=0)
    w2 = jnp.asarray(rng.randn(27, 5, 5).astype(np.float32) * 0.1)

    def l_a(w_, f_):
        return jnp.sum(sconv.sparse_conv_apply(f_, nbr_s, w_) ** 2)

    def l_c(w_, f_):
        return jnp.sum(sconv.sparse_conv_apply(f_, nbr_s, w_, inv_idx=inv_s) ** 2)

    ga = jax.grad(l_a, (0, 1))(w2, st.features)
    gc = jax.grad(l_c, (0, 1))(w2, st.features)
    for a, c in zip(ga, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-4)


def test_sparse_maxpool_matches_dense():
    rng = np.random.RandomState(5)
    st, dense = _random_sparse(rng, shape=(9, 12, 10))
    out_st, nbr, inv = rulebook.downsample_rulebook(st, 3, 2, 1,
                                                    out_capacity=512)
    out = np.asarray(sconv.sparse_maxpool(st.features, nbr))
    # dense oracle: max-pool with -inf empty cells, then zero empties
    d = np.where(np.abs(dense).sum(-1, keepdims=True) > 0, dense, -np.inf)
    ref = jax.lax.reduce_window(
        jnp.asarray(d), -np.inf, jax.lax.max, (1, 3, 3, 3, 1),
        (1, 2, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    ref = np.asarray(jnp.where(jnp.isneginf(ref), 0.0, ref))
    out_coords = np.asarray(out_st.coords())
    for i in np.where(np.asarray(out_st.valid_mask()))[0]:
        b, z, y, x = out_coords[i]
        np.testing.assert_allclose(out[i], ref[b, z, y, x], rtol=1e-5,
                                   atol=1e-5)


def test_sparse_group_shapes():
    rng = np.random.RandomState(6)
    st, _ = _random_sparse(rng, n=20, cap=32)
    nbr = rulebook.subm_rulebook(st, 3)
    g = np.asarray(sconv.sparse_group(st.features, nbr))
    assert g.shape == (27, 32, 5)
    # center tap (k=13) must equal the features themselves on valid rows
    valid = np.asarray(st.valid_mask())
    np.testing.assert_allclose(g[13][valid], np.asarray(st.features)[valid])
