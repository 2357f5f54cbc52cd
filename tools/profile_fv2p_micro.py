"""Micro-benchmarks of the FV2P eval pipeline's hot pieces at KITTI eval
shapes (B=4, 16384 keypoints, 100 RoIs, 512 pooled points) to locate where
the decoder's 133ms and the RoI head's 298ms go."""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from fv2p_tpu.ops import pointops
from fv2p_tpu.utils import iou3d
from fv2p_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

B, K, R, S, GRID = 4, 16384, 100, 512, 6


def force(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32))))


def timeit(name, fn, *args, iters=20):
    out = fn(*args); force(out)
    force(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    t = (time.time() - t0) / iters
    print('%-44s %8.2fms' % (name, t * 1e3))
    return t


def main():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(B, 18000, 3).astype(np.float32) * 15)
    pts_valid = jnp.ones((B, 18000), bool)

    # FPS
    timeit('fps 18000->16384 (B=4)',
           jax.jit(lambda p, v: pointops.farthest_point_sample_batch(p, v, K)),
           pts, pts_valid)

    # 3NN interpolate per level (caps at n_cap=16000: dilation-aware)
    kp = jnp.asarray(rng.randn(B, K, 3).astype(np.float32) * 15)
    for n_src, ch, tag in [(22400, 16, 'x_conv1'), (13600, 32, 'x_conv2'),
                           (6720, 64, 'x_conv3'), (6016, 64, 'x_conv4')]:
        src = jnp.asarray(rng.randn(B, n_src, 3).astype(np.float32) * 15)
        sv = jnp.ones((B, n_src), bool)
        f = jnp.asarray(rng.randn(B, n_src, ch).astype(np.float32))
        timeit(f'3nn interp {tag} ({n_src}x{ch} -> 16384)',
               jax.jit(jax.vmap(pointops.three_nn_interpolate)),
               src, sv, f, kp)

    # proposal NMS: 140800 anchors -> pre 9000 -> post 100
    n_anchor = 140800
    boxes = jnp.asarray(np.concatenate([
        rng.uniform(0, 70, (B, n_anchor, 1)), rng.uniform(-40, 40, (B, n_anchor, 1)),
        rng.uniform(-2, 0, (B, n_anchor, 1)),
        np.tile([[3.9, 1.6, 1.56]], (B, n_anchor, 1)).reshape(B, n_anchor, 3),
        rng.uniform(-np.pi, np.pi, (B, n_anchor, 1))], axis=-1).astype(np.float32))
    scores = jnp.asarray(rng.rand(B, n_anchor).astype(np.float32))
    timeit('proposal NMS (140800 -> pre9000 -> post100)',
           jax.jit(jax.vmap(lambda bx, sc: iou3d.nms_rotated(
               bx, sc, 0.85, pre_max=9000, post_max=100))), boxes, scores)

    # roipoint_pool3d: B x (16384 pts, 130 feats, 100 rois, 512 samples)
    feats = jnp.asarray(rng.randn(B, K, 130).astype(np.float32))
    rois = jnp.asarray(np.concatenate([
        rng.uniform(0, 70, (B, R, 1)), rng.uniform(-40, 40, (B, R, 1)),
        rng.uniform(-2, 0, (B, R, 1)),
        np.tile([[3.9, 1.6, 1.56]], (B, R, 1)).reshape(B, R, 3),
        rng.uniform(-np.pi, np.pi, (B, R, 1))], axis=-1).astype(np.float32))

    def pool(pts3, f, roi_set):
        return pointops.roipoint_pool3d(
            pts3, f, jnp.ones(pts3.shape[0], bool), roi_set[:, :7], S,
            (0.0, 0.0, 0.0))
    timeit('roipoint_pool3d (100 rois x 512 of 16384)',
           jax.jit(jax.vmap(pool)), kp, feats, rois)

    # points_in_rotated_boxes alone
    timeit('  points_in_rotated_boxes (100x16384)',
           jax.jit(jax.vmap(lambda p, r: iou3d.points_in_rotated_boxes(
               p, r[:, :7]))), kp, rois)
    # first_k_hits alone
    hits = jnp.asarray(rng.rand(B * R, K) < 0.02)
    timeit('  _first_k_hits k=512 (400 x 16384)',
           jax.jit(lambda h: pointops._first_k_hits(h, S)), hits)

    # SA ball query at grid points: BR x (512 pts) -> 216 centers, 2 radii
    br = B * R
    pooled_xyz = jnp.asarray(rng.randn(br, S, 3).astype(np.float32))
    pooled_f = jnp.asarray(rng.randn(br, S, 128).astype(np.float32))
    centers = jnp.asarray(rng.randn(br, GRID ** 3, 3).astype(np.float32))
    pv = jnp.ones((br, S), bool)
    for rad, ns in [(0.8, 16), (1.6, 32)]:
        timeit(f'ball_query_group r={rad} ns={ns} (400x216x512)',
               jax.jit(jax.vmap(lambda c, x, v, f: pointops.ball_query_group(
                   c, x, v, f, rad, ns))), centers, pooled_xyz, pv, pooled_f)

    # BEV bilinear pooling: B x (200,176,512) at 100*216 pts
    bev = jnp.asarray(rng.randn(B, 200, 176, 512).astype(np.float32))
    xi = jnp.asarray(rng.uniform(0, 175, (B, R * GRID ** 3)).astype(np.float32))
    yi = jnp.asarray(rng.uniform(0, 199, (B, R * GRID ** 3)).astype(np.float32))
    timeit('bilinear BEV pool (4 x 21600 pts x 512ch)',
           jax.jit(jax.vmap(pointops.bilinear_interpolate_bev)), bev, xi, yi)


if __name__ == '__main__':
    main()
