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
    got = np.asarray(dcn._bilinear_sample(
        xg, jnp.asarray(sy), jnp.asarray(sx), h, w))

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
