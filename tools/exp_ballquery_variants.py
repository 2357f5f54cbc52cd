"""Experiment: where does ball_query_group's 34/59ms go at FV2P RoI-head
shapes (400 rois x 216 centers x 512 points), and faster formulations.

Pieces: d2 | first_k | gather+mask. Variants: shared-d2 across radii,
top_k-based first_k, argmin-free slot assembly.
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from fv2p_tpu.ops import pointops
from fv2p_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

BR, M, N, C = 400, 216, 512, 128


def force(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(name, fn, *args, iters=20):
    out = fn(*args); force(out)
    force(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    t = (time.time() - t0) / iters
    print('%-52s %8.2fms' % (name, t * 1e3))
    return out


def main():
    rng = np.random.RandomState(0)
    centers = jnp.asarray(rng.randn(BR, M, 3).astype(np.float32))
    xyz = jnp.asarray(rng.randn(BR, N, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(BR, N, C).astype(np.float32))
    valid = jnp.ones((BR, N), bool)

    # full current op
    for rad, ns in [(0.8, 16), (1.6, 32)]:
        timeit(f'full ball_query_group r={rad} ns={ns}',
               jax.jit(jax.vmap(lambda c, x, v, f, _r=rad, _n=ns:
                                pointops.ball_query_group(c, x, v, f, _r, _n))),
               centers, xyz, valid, feats)

    # d2 alone
    def d2_only(c, x):
        return jnp.sum(jnp.square(c[:, None, :] - x[None, :, :]), axis=-1)
    timeit('d2 broadcast (400x216x512)', jax.jit(jax.vmap(d2_only)),
           centers, xyz)

    def d2_mm(c, x):
        cross = c @ x.T
        return (jnp.sum(jnp.square(c), -1)[:, None] - 2 * cross
                + jnp.sum(jnp.square(x), -1)[None, :])
    timeit('d2 matmul f32-default', jax.jit(jax.vmap(d2_mm)), centers, xyz)

    # first_k alone (on a fixed random hit mask ~2% density)
    hits = jnp.asarray(rng.rand(BR, M, N) < 0.05)
    for k in (16, 32):
        timeit(f'_first_k_hits k={k} (400x216x512) [searchsorted]',
               jax.jit(jax.vmap(lambda h, _k=k: pointops._first_k_hits(h, _k))),
               hits)

        def topk_first(h, _k=k):
            iota = jnp.arange(N, dtype=jnp.int32)
            masked = jnp.where(h, iota, N)
            vals, _ = jax.lax.top_k(-masked, _k)
            idx = -vals
            return jnp.where(idx < N, idx, -1)
        timeit(f'_first_k via top_k k={k}', jax.jit(jax.vmap(topk_first)), hits)

        def cumsum_onehot(h, _k=k):
            # slot s of row m = index i where cumsum==s+1 and h; build by
            # matmul: onehot (N x k) = (csum == s+1 & h); idx = iota @ onehot
            cs = jnp.cumsum(h.astype(jnp.int32), axis=-1)
            sel = (cs[..., None] == jnp.arange(1, _k + 1)[None, None, :]) & h[..., None]
            iota = jnp.arange(N, dtype=jnp.int32)
            idx = jnp.einsum('mns,n->ms', sel.astype(jnp.int32), iota)
            has = jnp.sum(sel, axis=1) > 0
            return jnp.where(has, idx, -1)
        timeit(f'_first_k via onehot-matmul k={k}',
               jax.jit(jax.vmap(cumsum_onehot)), hits)

    # gather alone
    idx16 = jnp.asarray(rng.randint(0, N, (BR, M, 16)).astype(np.int32))
    idx32 = jnp.asarray(rng.randint(0, N, (BR, M, 32)).astype(np.int32))

    def gath(x, f, idx):
        rows = jnp.concatenate([x, f], axis=-1)[idx]
        return rows
    timeit('gather rows ns=16', jax.jit(jax.vmap(gath)), xyz, feats, idx16)
    timeit('gather rows ns=32', jax.jit(jax.vmap(gath)), xyz, feats, idx32)

    # one-hot matmul gather: (M, ns, N) x (N, 3+C) on the MXU
    def gath_mm(x, f, idx):
        rows_src = jnp.concatenate([x, f], axis=-1)        # (N, 3+C)
        onehot = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)  # (M, ns, N)
        return jnp.einsum('msn,nc->msc', onehot,
                          rows_src.astype(jnp.bfloat16))
    timeit('gather via onehot-matmul ns=16', jax.jit(jax.vmap(gath_mm)),
           xyz, feats, idx16)
    timeit('gather via onehot-matmul ns=32', jax.jit(jax.vmap(gath_mm)),
           xyz, feats, idx32)


if __name__ == '__main__':
    main()
