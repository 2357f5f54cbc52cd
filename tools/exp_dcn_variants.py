"""Experiments: alternative XLA formulations of modulated deformable conv at
MGAF KITTI shapes (B=4, 200x176, C=256, G=4, K=9). Inference-only timings."""
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 4, 200, 176, 256
G, KS = 4, 3
K = KS * KS
CG = C // G
HW = H * W
DT = jnp.bfloat16


def force(x):
    return float(jnp.sum(jnp.abs(x.astype(jnp.float32))))


def timeit(fn, *args, iters=20):
    out = fn(*args); force(out)
    force(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.time() - t0) / iters


def make_inputs(seed=0):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(k1, (B, H, W, C), DT)
    dy = jax.random.normal(k2, (B, H, W, G * K), DT) * 2.0
    dx = jax.random.normal(k3, (B, H, W, G * K), DT) * 2.0
    mask = jax.nn.sigmoid(jax.random.normal(k4, (B, H, W, G * K), DT))
    wts = jax.random.normal(k1, (K, C, C), DT) * 0.05
    return x, dy, dx, mask, wts


# ---------------------------------------------------------------- current
def current(x, dy, dx, mask, wts):
    from fv2p_tpu.ops.dcn import modulated_deform_conv
    return modulated_deform_conv(x, dy, dx, mask, wts, KS, G)


# ------------------------------------------------- fused all-taps, take_along
def fused_take(x, dy, dx, mask, wts):
    """No scan: one (B,G,S=K*HW) sample set, 4 corner gathers via
    take_along_axis, one big einsum."""
    pad = (KS - 1) // 2
    ky, kx = np.meshgrid(np.arange(KS), np.arange(KS), indexing='ij')
    tap_y = jnp.asarray(ky.reshape(-1), jnp.float32) - pad
    tap_x = jnp.asarray(kx.reshape(-1), jnp.float32) - pad
    base_y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(HW)
    base_x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(HW)

    dyr = dy.astype(jnp.float32).reshape(B, HW, G, K).transpose(0, 2, 3, 1)
    dxr = dx.astype(jnp.float32).reshape(B, HW, G, K).transpose(0, 2, 3, 1)
    m = mask.reshape(B, HW, G, K).transpose(0, 2, 3, 1)       # (B,G,K,HW)

    sy = base_y[None, None, None] + tap_y[None, None, :, None] + dyr
    sx = base_x[None, None, None] + tap_x[None, None, :, None] + dxr
    sy = sy.reshape(B, G, K * HW)
    sx = sx.reshape(B, G, K * HW)

    y0 = jnp.floor(sy); x0 = jnp.floor(sx)
    wy1 = (sy - y0).astype(DT); wx1 = (sx - x0).astype(DT)
    y0i = y0.astype(jnp.int32); x0i = x0.astype(jnp.int32)

    xg = x.reshape(B, HW, G, CG).transpose(0, 2, 1, 3)         # (B,G,HW,CG)
    src = jnp.concatenate([xg, jnp.zeros((B, G, 1, CG), DT)], axis=2)

    def corner(yi, xi):
        ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        idx = jnp.where(ok, yi * W + xi, HW)
        v = jnp.take_along_axis(src, idx[..., None], axis=2)
        return v, ok.astype(DT)

    v00, m00 = corner(y0i, x0i)
    v01, m01 = corner(y0i, x0i + 1)
    v10, m10 = corner(y0i + 1, x0i)
    v11, m11 = corner(y0i + 1, x0i + 1)
    out = (v00 * ((1 - wy1) * (1 - wx1) * m00)[..., None]
           + v01 * ((1 - wy1) * wx1 * m01)[..., None]
           + v10 * (wy1 * (1 - wx1) * m10)[..., None]
           + v11 * (wy1 * wx1 * m11)[..., None])               # (B,G,K*HW,CG)
    out = out * m.reshape(B, G, K * HW)[..., None]
    # (B,G,K,HW,CG) -> (B,HW,K,G*CG)
    out = out.reshape(B, G, K, HW, CG).transpose(0, 3, 2, 1, 4).reshape(
        B, HW, K, C)
    r = jnp.einsum('bnkc,kco->bno', out, wts,
                   preferred_element_type=jnp.float32)
    return r.reshape(B, H, W, C)


# --------------------------------------------- scan over taps, take_along
def scan_take(x, dy, dx, mask, wts):
    """Like current but corners via take_along_axis instead of row-pair
    lax.gather."""
    pad = (KS - 1) // 2
    ky, kx = np.meshgrid(np.arange(KS), np.arange(KS), indexing='ij')
    tap_y = jnp.asarray(ky.reshape(-1), jnp.float32) - pad
    tap_x = jnp.asarray(kx.reshape(-1), jnp.float32) - pad
    base_y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(HW)
    base_x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(HW)

    dyr = dy.astype(jnp.float32).reshape(B, HW, G, K).transpose(3, 0, 2, 1)
    dxr = dx.astype(jnp.float32).reshape(B, HW, G, K).transpose(3, 0, 2, 1)
    m = mask.reshape(B, HW, G, K).transpose(3, 0, 2, 1)        # (K,B,G,HW)

    xg = x.reshape(B, HW, G, CG).transpose(0, 2, 1, 3)
    src = jnp.concatenate([xg, jnp.zeros((B, G, 1, CG), DT)], axis=2)

    def corner(yi, xi):
        ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        idx = jnp.where(ok, yi * W + xi, HW)
        v = jnp.take_along_axis(src, idx[..., None], axis=2)
        return v, ok.astype(DT)

    def tap(carry, inp):
        dy_k, dx_k, m_k, ty, tx, w_k = inp
        sy = base_y[None, None] + ty + dy_k
        sx = base_x[None, None] + tx + dx_k
        y0 = jnp.floor(sy); x0 = jnp.floor(sx)
        wy1 = (sy - y0).astype(DT); wx1 = (sx - x0).astype(DT)
        y0i = y0.astype(jnp.int32); x0i = x0.astype(jnp.int32)
        v00, m00 = corner(y0i, x0i)
        v01, m01 = corner(y0i, x0i + 1)
        v10, m10 = corner(y0i + 1, x0i)
        v11, m11 = corner(y0i + 1, x0i + 1)
        out = (v00 * ((1 - wy1) * (1 - wx1) * m00)[..., None]
               + v01 * ((1 - wy1) * wx1 * m01)[..., None]
               + v10 * (wy1 * (1 - wx1) * m10)[..., None]
               + v11 * (wy1 * wx1 * m11)[..., None])
        out = out * m_k[..., None]
        flat = out.transpose(0, 2, 1, 3).reshape(B, HW, C)
        return carry + jnp.einsum('bnc,co->bno', flat, w_k,
                                  preferred_element_type=jnp.float32), None

    init = jnp.zeros((B, HW, C), jnp.float32)
    out, _ = jax.lax.scan(tap, init, (dyr, dxr, m, tap_y, tap_x, wts))
    return out.reshape(B, H, W, C)


# ------------------------------------------- scan over taps, 2x2 patch gather
def scan_patch(x, dy, dx, mask, wts):
    """One lax.gather of a (2, 2*Cg) patch per sample fetches all four
    bilinear corners (rows y0,y0+1 x cols x0,x0+1): half the gather count of
    the row-pair formulation. Border handling: starts are pre-clamped so the
    patch fits; a slot remap keeps the true corner in its place (the
    out-of-range corner's weight is already zero)."""
    pad = (KS - 1) // 2
    ky, kx = np.meshgrid(np.arange(KS), np.arange(KS), indexing='ij')
    tap_y = jnp.asarray(ky.reshape(-1), jnp.float32) - pad
    tap_x = jnp.asarray(kx.reshape(-1), jnp.float32) - pad
    base_y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(HW)
    base_x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(HW)

    dyr = dy.astype(jnp.float32).reshape(B, HW, G, K).transpose(3, 0, 2, 1)
    dxr = dx.astype(jnp.float32).reshape(B, HW, G, K).transpose(3, 0, 2, 1)
    m = mask.reshape(B, HW, G, K).transpose(3, 0, 2, 1)        # (K,B,G,HW)

    # (BG, H, W*CG) source so a (2, 2*CG) slice is a 2x2 spatial patch
    xs = x.reshape(B, HW, G, CG).transpose(0, 2, 1, 3).reshape(
        B * G, H, W * CG)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1))

    def tap(carry, inp):
        dy_k, dx_k, m_k, ty, tx, w_k = inp
        sy = base_y[None, None] + ty + dy_k                     # (B,G,HW)
        sx = base_x[None, None] + tx + dx_k
        y0 = jnp.floor(sy); x0 = jnp.floor(sx)
        wy1 = (sy - y0).astype(DT); wx1 = (sx - x0).astype(DT)
        y0i = y0.astype(jnp.int32); x0i = x0.astype(jnp.int32)

        yc = jnp.clip(y0i, 0, H - 2).reshape(B * G, HW)
        xc = jnp.clip(x0i, 0, W - 2).reshape(B * G, HW)
        starts = jnp.stack([yc, xc * CG], axis=-1)              # (BG,HW,2)
        patch = jax.vmap(lambda arr, st: jax.lax.gather(
            arr, st, dnums, slice_sizes=(2, 2 * CG)))(xs, starts)
        patch = patch.reshape(B, G, HW, 2, 2, CG)

        # slot remap at borders (clamped start shifts the true corner)
        sh_y_hi = (y0i > H - 2)[..., None, None]                # y0 in slot 1
        sh_y_lo = (y0i < 0)[..., None, None]                    # y1 in slot 0
        sh_x_hi = (x0i > W - 2)[..., None]
        sh_x_lo = (x0i < 0)[..., None]

        p00 = jnp.where(sh_y_hi, patch[..., 1, :, :], patch[..., 0, :, :])
        p10 = jnp.where(sh_y_lo, patch[..., 0, :, :], patch[..., 1, :, :])
        v00 = jnp.where(sh_x_hi, p00[..., 1, :], p00[..., 0, :])
        v01 = jnp.where(sh_x_lo, p00[..., 0, :], p00[..., 1, :])
        v10 = jnp.where(sh_x_hi, p10[..., 1, :], p10[..., 0, :])
        v11 = jnp.where(sh_x_lo, p10[..., 0, :], p10[..., 1, :])

        def ok(yi, xi):
            return (((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
                    .astype(DT))

        m00 = ok(y0i, x0i); m01 = ok(y0i, x0i + 1)
        m10 = ok(y0i + 1, x0i); m11 = ok(y0i + 1, x0i + 1)
        out = (v00 * ((1 - wy1) * (1 - wx1) * m00)[..., None]
               + v01 * ((1 - wy1) * wx1 * m01)[..., None]
               + v10 * (wy1 * (1 - wx1) * m10)[..., None]
               + v11 * (wy1 * wx1 * m11)[..., None])            # (B,G,HW,CG)
        out = out * m_k[..., None]
        flat = out.transpose(0, 2, 1, 3).reshape(B, HW, C)
        return carry + jnp.einsum('bnc,co->bno', flat, w_k,
                                  preferred_element_type=jnp.float32), None

    init = jnp.zeros((B, HW, C), jnp.float32)
    out, _ = jax.lax.scan(tap, init, (dyr, dxr, m, tap_y, tap_x, wts))
    return out.reshape(B, H, W, C)


def main():
    args = make_inputs()
    fns = {
        'current (scan + row-pair gather)': current,
        'fused taps + take_along_axis': fused_take,
        'scan taps + take_along_axis': scan_take,
        'scan taps + 2x2 patch gather': scan_patch,
    }
    outs = {}
    for name, fn in fns.items():
        f = jax.jit(fn)
        try:
            t = timeit(f, *args)
        except Exception as e:
            print('%-36s FAILED: %s' % (name, e))
            continue
        outs[name] = np.asarray(f(*args), np.float32)
        print('%-36s %8.2fms' % (name, t * 1e3))
    ref = outs.get('current (scan + row-pair gather)')
    for name, o in outs.items():
        if ref is not None and name != 'current (scan + row-pair gather)':
            err = np.max(np.abs(o - ref)) / (np.max(np.abs(ref)) + 1e-9)
            print('  max rel err vs current [%s]: %.2e' % (name, err))


if __name__ == '__main__':
    main()
