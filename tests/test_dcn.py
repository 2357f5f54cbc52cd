"""DCN bilinear sampling vs a naive numpy oracle (zero padding outside)."""
import jax.numpy as jnp
import numpy as np

from fv2p_tpu.ops import dcn


def _naive_bilinear(x, sy, sx):
    """x: (H, W, C); sy/sx: (S,) -> (S, C), zero outside."""
    h, w, c = x.shape
    out = np.zeros((len(sy), c), np.float32)
    for i, (yy, xx) in enumerate(zip(sy, sx)):
        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
        wy, wx = yy - y0, xx - x0
        for (yi, xi, wgt) in [(y0, x0, (1 - wy) * (1 - wx)),
                              (y0, x0 + 1, (1 - wy) * wx),
                              (y0 + 1, x0, wy * (1 - wx)),
                              (y0 + 1, x0 + 1, wy * wx)]:
            if 0 <= yi < h and 0 <= xi < w:
                out[i] += wgt * x[yi, xi]
    return out


def test_bilinear_sample_matches_naive_incl_borders():
    rng = np.random.RandomState(0)
    h, w, g, cg = 12, 10, 2, 4
    x = rng.rand(1, h, w, g * cg).astype(np.float32)
    s = 64
    sy = rng.uniform(-2, h + 2, (1, g, s)).astype(np.float32)
    sx = rng.uniform(-2, w + 2, (1, g, s)).astype(np.float32)
    # force exact-border cases
    sy[0, 0, :6] = [0.0, h - 1.0, h - 1.5, -0.5, 0.25, h - 0.01]
    sx[0, 0, :6] = [w - 1.0, 0.0, w - 0.5, 0.25, -0.75, w - 0.01]

    xg = jnp.asarray(x.reshape(1, h * w, g, cg).transpose(0, 2, 1, 3))
    quad = dcn.build_quad(xg, h, w)
    got = np.asarray(dcn._bilinear_sample(
        quad, jnp.asarray(sy), jnp.asarray(sx), jnp.ones((1, g, s)), h, w))

    for gi in range(g):
        ref = _naive_bilinear(x[0, :, :, gi * cg:(gi + 1) * cg], sy[0, gi], sx[0, gi])
        np.testing.assert_allclose(got[0, gi], ref, rtol=1e-5, atol=1e-5)


def test_mdeform_zero_offsets_equal_conv():
    """With zero offsets and mask=1, DCN == plain 3x3 conv (reference
    DeformableConvolutionV2PyTorch/test.py zero-offset equivalence)."""
    import jax
    rng = np.random.RandomState(1)
    h, w, c, co = 10, 8, 6, 5
    x = jnp.asarray(rng.rand(1, h, w, c).astype(np.float32))
    wgt = jnp.asarray(rng.rand(9, c, co).astype(np.float32) * 0.2)
    zeros = jnp.zeros((1, h, w, 9))
    ones = jnp.ones((1, h, w, 9))
    got = np.asarray(dcn.modulated_deform_conv(x, zeros, zeros, ones, wgt, 3, 1))

    ref = jax.lax.conv_general_dilated(
        x, np.asarray(wgt).reshape(3, 3, c, co), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_bilinear_custom_vjp_matches_autodiff():
    """The row-scatter backward must equal autodiff through the impl."""
    import jax
    import jax.numpy as jnp
    from fv2p_tpu.ops import dcn
    rng = np.random.RandomState(0)
    b, g, h, w, cg, s = 2, 2, 7, 9, 5, 40
    x = jnp.asarray(rng.randn(b, g, h * w, cg).astype(np.float32))
    sy = jnp.asarray((rng.rand(b, g, s) * 10 - 1.5).astype(np.float32))
    sx = jnp.asarray((rng.rand(b, g, s) * 12 - 1.5).astype(np.float32))

    mod = jnp.asarray((0.2 + rng.rand(b, g, s)).astype(np.float32))

    f_custom = lambda x_, a, c, m: jnp.sum(
        dcn._bilinear_sample(dcn.build_quad(x_, h, w), a, c, m, h, w) ** 2)
    f_auto = lambda x_, a, c, m: jnp.sum(
        dcn._quad_sample_impl(dcn.build_quad(x_, h, w), a, c, m, h, w)[0] ** 2)
    np.testing.assert_allclose(float(f_custom(x, sy, sx, mod)),
                               float(f_auto(x, sy, sx, mod)), rtol=1e-6)
    gc = jax.grad(f_custom, (0, 1, 2, 3))(x, sy, sx, mod)
    ga = jax.grad(f_auto, (0, 1, 2, 3))(x, sy, sx, mod)
    for a, c in zip(ga, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)
