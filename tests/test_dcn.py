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


def test_mdcn_whole_conv_vjp_matches_autodiff():
    """The whole-conv custom VJP (single d(quad) accumulator across all
    taps/chunks) must match autodiff through a reference formulation built
    from _quad_sample_impl."""
    import jax
    rng = np.random.RandomState(7)
    b, h, w, c, co, g = 2, 6, 5, 8, 4, 2
    ks = 3
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    dy = jnp.asarray(0.8 * rng.randn(b, h, w, g * 9).astype(np.float32))
    dx = jnp.asarray(0.8 * rng.randn(b, h, w, g * 9).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, h, w, g * 9).astype(np.float32))
    wgt = jnp.asarray(0.3 * rng.randn(9, c, co).astype(np.float32))

    def ref(x, dy, dx, mask, wgt):
        cg = c // g
        pad = (ks - 1) // 2
        ky, kx = np.meshgrid(np.arange(ks), np.arange(ks), indexing='ij')
        tap_y = jnp.asarray(ky.reshape(-1), jnp.float32) - pad
        tap_x = jnp.asarray(kx.reshape(-1), jnp.float32) - pad
        base_y = jnp.asarray(
            np.repeat(np.arange(h), w).astype(np.float32))
        base_x = jnp.asarray(np.tile(np.arange(w), h).astype(np.float32))
        dyr = dy.reshape(b, h * w, g, 9).transpose(3, 0, 2, 1)
        dxr = dx.reshape(b, h * w, g, 9).transpose(3, 0, 2, 1)
        mr = mask.reshape(b, h * w, g, 9).transpose(3, 0, 2, 1)
        xg = x.reshape(b, h * w, g, cg).transpose(0, 2, 1, 3)
        quad = dcn.build_quad(xg, h, w)
        w_g = wgt.reshape(9, g, cg, co)
        out = 0.0
        for k in range(9):
            sy = base_y[None, None, :] + tap_y[k] + dyr[k]
            sx = base_x[None, None, :] + tap_x[k] + dxr[k]
            sampled = dcn._quad_sample_impl(quad, sy, sx, mr[k], h, w)[0]
            out = out + jnp.einsum('bgnc,gco->bno', sampled, w_g[k])
        return out.reshape(b, h, w, co)

    got = dcn.modulated_deform_conv(x, dy, dx, mask, wgt, ks, g)
    want = ref(x, dy, dx, mask, wgt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    f = lambda *a: jnp.sum(jnp.tanh(
        dcn.modulated_deform_conv(*a, ks, g)) * 0.3)
    fr = lambda *a: jnp.sum(jnp.tanh(ref(*a)) * 0.3)
    gc = jax.grad(f, (0, 1, 2, 3, 4))(x, dy, dx, mask, wgt)
    ga = jax.grad(fr, (0, 1, 2, 3, 4))(x, dy, dx, mask, wgt)
    for name, a, c_ in zip(['x', 'dy', 'dx', 'mask', 'w'], ga, gc):
        np.testing.assert_allclose(np.asarray(c_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
