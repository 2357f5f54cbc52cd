"""Minimal repro: axon TPU kernel fault in a vmapped clip-mode lax.gather.

Context: the MGAF-3DSSD full-resolution bf16 eval program deterministically
killed the TPU worker ("kernel fault") once the DCN offset conv had trained
(non-zero) weights, while the SAME compiled program ran clean with
zero-offset weights, and a CPU replay of the crashing weights showed every
intermediate finite and every gather index in-bounds by construction
(`fv2p_tpu/ops/dcn.py:_quad_sample_impl`). Bisect trail (2026-08-19):

  - module prefix through backbone_2d ............................ OK
  - + dense head ................................................. CRASH
  - head with top-k decode replaced by fixed indices ............. CRASH
  - head with DCN offsets clamped to [-16, 16] ................... CRASH
  - head with FeatureAdaption (DCN) -> identity .................. OK
  - head with the row gather re-lowered via jnp.take_along_axis .. OK

i.e. the fault is in how the axon runtime executes the vmapped
`jax.lax.gather(GatherDimensionNumbers(offset_dims=(1,),
collapsed_slice_dims=(0,), start_index_map=(0,)), mode='clip')` lowering of
the quad-row gather at DCN shapes, for certain index/data patterns that
fractional (trained) offsets produce and integer (zero) offsets do not.
`jnp.take_along_axis` computes the identical result and runs clean;
`fv2p_tpu/ops/dcn.py` now uses it unconditionally.

This script replays both lowerings at the exact failing shapes with
synthetic fractional offsets. If the fault is data-specific beyond
"fractional offsets", the synthetic variant may pass — the definitive
repro is the bisect above (tools/smoke_flagship_res.py on a trained
checkpoint with the old lowering).

Usage: python tools/repro_axon_gather_fault.py [--lowering {vmap,taa}]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--lowering', choices=['vmap', 'taa'], default='vmap')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    # MGAF full-res head shapes: B=4, G=4 deformable groups, BEV 200x176,
    # Cg = 768/4 = 192 channels per group, K=9 taps chunked to 4400 samples
    b, g, h, w, cg = 4, 4, 200, 176, 192
    bg = b * g
    hq, wq = h + 1, w + 1
    s = 4400  # per-chunk sample count picked by dcn._pick_chunks(35200)

    key = jax.random.PRNGKey(0)
    kq, ky, kx = jax.random.split(key, 3)
    quad = jax.random.normal(kq, (bg, hq * wq + 1, 4 * cg), jnp.bfloat16)
    # fractional sample coords like a trained DCN produces (offsets ~ +-4)
    sy = jax.random.uniform(ky, (bg, s), jnp.float32, -4.0, h + 4.0)
    sx = jax.random.uniform(kx, (bg, s), jnp.float32, -4.0, w + 4.0)

    def cells(sy, sx):
        y0i = jnp.floor(sy).astype(jnp.int32)
        x0i = jnp.floor(sx).astype(jnp.int32)
        ok = ((y0i >= -1) & (y0i <= h - 1) & (x0i >= -1) & (x0i <= w - 1))
        return jnp.where(ok, (y0i + 1) * wq + (x0i + 1), hq * wq)

    if args.lowering == 'vmap':
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))

        @jax.jit
        def run(quad, sy, sx):
            cell = cells(sy, sx)
            return jax.vmap(lambda arr, idx: jax.lax.gather(
                arr, idx[:, None], dnums, slice_sizes=(1, 4 * cg),
                mode='clip'))(quad, cell)
    else:
        @jax.jit
        def run(quad, sy, sx):
            cell = cells(sy, sx)
            return jnp.take_along_axis(quad, cell[..., None], axis=1)

    for i in range(50):
        sy_i = sy + 0.01 * i
        out = run(quad, sy_i, sx)
        out.block_until_ready()
    print(f'{args.lowering}: 50 iterations OK on', jax.devices()[0].device_kind)


if __name__ == '__main__':
    main()
