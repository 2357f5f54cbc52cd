"""Bisect the MGAF XLA compile-time pathology (BENCH_r03: 620 s) down to the
DCN tap-loop lowering and measure candidate re-lowerings.

MGAF has 4 DCN convs at eval: 3 DCNBEVBackbone deblocks (G=1) + the head's
FeatureAdaption (G=4). Times a cold TPU compile (persistent cache disabled)
of the FORWARD-only program for each variant at each real shape.

Usage: FV2P_JAX_CACHE_DIR= python tools/exp_dcn_compile.py [variant ...]
"""
import functools
import os
import sys
import time
from pathlib import Path

os.environ.setdefault('FV2P_JAX_CACHE_DIR', '')
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from fv2p_tpu.ops import dcn

# (label, B, H, W, C, G) — the four MGAF eval DCN sites at batch 4
SHAPES = [
    ('deblock1', 4, 200, 176, 128, 1),
    ('deblock2', 4, 100, 88, 256, 1),
    ('deblock3', 4, 50, 44, 256, 1),
    ('head_fa', 4, 200, 176, 256, 4),
]


def variant_current(quad, dy, dx, m, w_g, tap_y, tap_x, h, w):
    """The shipped lowering: lax.scan over taps, lax.map chunking inside."""
    return dcn._mdcn_fwd_impl(quad, dy, dx, m, w_g, tap_y, tap_x, h, w)[0]


def variant_scan_nochunk(quad, dy, dx, m, w_g, tap_y, tap_x, h, w):
    """scan over taps, whole-HW sample per tap (no inner lax.map)."""
    k, b, g, hw = dy.shape
    base_y, base_x = dcn._base_yx(h, w)

    def tap_body(carry, inputs):
        dy_k, dx_k, m_k, ty, tx, w_k = inputs
        sy = base_y[None, None, :] + ty + dy_k
        sx = base_x[None, None, :] + tx + dx_k
        sampled = dcn._quad_sample_impl(quad, sy, sx, m_k, h, w)[0]
        out_k = jnp.einsum('bgnc,gco->bno', sampled, w_k,
                           preferred_element_type=jnp.float32)
        return carry + out_k, None

    init = jnp.zeros((b, hw, w_g.shape[-1]), jnp.float32)
    out, _ = jax.lax.scan(tap_body, init, (dy, dx, m, tap_y, tap_x, w_g))
    return out


def variant_unroll(quad, dy, dx, m, w_g, tap_y, tap_x, h, w):
    """Python-unrolled taps (9 gathers + 9 einsums, no loop constructs)."""
    k, b, g, hw = dy.shape
    base_y, base_x = dcn._base_yx(h, w)
    out = jnp.zeros((b, hw, w_g.shape[-1]), jnp.float32)
    for i in range(k):
        sy = base_y[None, None, :] + tap_y[i] + dy[i]
        sx = base_x[None, None, :] + tap_x[i] + dx[i]
        sampled = dcn._quad_sample_impl(quad, sy, sx, m[i], h, w)[0]
        out = out + jnp.einsum('bgnc,gco->bno', sampled, w_g[i],
                               preferred_element_type=jnp.float32)
    return out


def variant_onegather(quad, dy, dx, m, w_g, tap_y, tap_x, h, w):
    """All K taps' coords concatenated: ONE take_along_axis of K*HW rows,
    then one einsum over the K axis."""
    k, b, g, hw = dy.shape
    base_y, base_x = dcn._base_yx(h, w)
    sy = base_y[None, None, None, :] + tap_y[:, None, None, None] + dy
    sx = base_x[None, None, None, :] + tap_x[:, None, None, None] + dx
    # (K,B,G,HW) -> (B,G,K*HW)
    sy = sy.transpose(1, 2, 0, 3).reshape(b, g, k * hw)
    sx = sx.transpose(1, 2, 0, 3).reshape(b, g, k * hw)
    mm = m.transpose(1, 2, 0, 3).reshape(b, g, k * hw)
    sampled = dcn._quad_sample_impl(quad, sy, sx, mm, h, w)[0]
    cg = quad.shape[-1] // 4
    sampled = sampled.reshape(b, g, k, hw, cg)
    return jnp.einsum('bgknc,kgco->bno', sampled, w_g,
                      preferred_element_type=jnp.float32)


VARIANTS = {
    'current': variant_current,
    'scan_nochunk': variant_scan_nochunk,
    'unroll': variant_unroll,
    'onegather': variant_onegather,
}


def run_one(fn, b, h, w, c, g, dtype=jnp.bfloat16):
    k = 9
    cg = c // g
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype)
    dy = jnp.asarray(rng.normal(size=(b, h, w, g * k)), jnp.float32)
    dx = jnp.asarray(rng.normal(size=(b, h, w, g * k)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(b, h, w, g * k)), dtype)
    wts = jnp.asarray(rng.normal(size=(k, c, c)) * 0.05, dtype)

    def full(x, dy, dx, mask, wts):
        hw = h * w
        dyr = dy.astype(jnp.float32).reshape(b, hw, g, k).transpose(3, 0, 2, 1)
        dxr = dx.astype(jnp.float32).reshape(b, hw, g, k).transpose(3, 0, 2, 1)
        mr = mask.reshape(b, hw, g, k).transpose(3, 0, 2, 1)
        xg = x.reshape(b, hw, g, cg).transpose(0, 2, 1, 3)
        quad = dcn.build_quad(xg, h, w)
        ky, kx = np.meshgrid(np.arange(3), np.arange(3), indexing='ij')
        ty = jnp.asarray(ky.reshape(-1), jnp.float32) - 1
        tx = jnp.asarray(kx.reshape(-1), jnp.float32) - 1
        w_g = wts.reshape(k, g, cg, c)
        out = fn(quad, dyr, dxr, mr, w_g, ty, tx, h, w)
        return jnp.sum(out)

    jf = jax.jit(full)
    t0 = time.time()
    lowered = jf.lower(x, dy, dx, mask, wts)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    t0 = time.time()
    val = float(compiled(x, dy, dx, mask, wts))
    t_run1 = time.time() - t0
    # steady-state latency
    t0 = time.time()
    for _ in range(5):
        r = compiled(x, dy, dx, mask, wts)
    _ = float(r)
    t_run = (time.time() - t0) / 5
    return t_lower, t_compile, t_run, val


def main():
    names = sys.argv[1:] or list(VARIANTS)
    print(f'# device={jax.devices()[0].device_kind}')
    for name in names:
        fn = VARIANTS[name]
        for label, b, h, w, c, g in SHAPES:
            tl, tc, tr, val = run_one(fn, b, h, w, c, g)
            print(f'{name:14s} {label:9s} lower={tl:6.2f}s compile={tc:7.2f}s '
                  f'run={tr*1000:7.2f}ms val={val:.4g}', flush=True)


if __name__ == '__main__':
    main()
