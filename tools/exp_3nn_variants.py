"""Experiment: exact-3NN formulations on TPU at FV2P decoder shapes.

Variants:
  cur        - current chunked scan: HIGHEST matmul d2 + 3x argmin + lax.sort merge
  bsub       - broadcast-subtract d2 (no matmul; exact f32 on VPU)
  net        - HIGHEST matmul d2 + compare-exchange merge network (no lax.sort)
  bsub_net   - both
  chunkN     - chunk-size sweep on the best variant
  approx     - approx_min_k k=8 (reference point, not exact)
All exact variants are checked for index agreement against `cur`.
"""
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from fv2p_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

_BIG = 1e10
B, M = 4, 16384


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
    print('%-40s %8.2fms' % (name, t * 1e3))
    return out


def chunk_top3(d2, base):
    iota = jnp.arange(d2.shape[-1], dtype=jnp.int32)[None, :]
    idxs, ds = [], []
    for _ in range(3):
        i = jnp.argmin(d2, axis=-1).astype(jnp.int32)
        ds.append(jnp.min(d2, axis=-1))
        idxs.append(i + base)
        d2 = jnp.where(iota == i[:, None], _BIG, d2)
    return jnp.stack(ds, axis=-1), jnp.stack(idxs, axis=-1)


def merge_sorted3(bd, bi, cd, ci):
    """Merge two ascending 3-lists (per row) into the ascending best-3.

    Compare-exchange network. Tie-break: prefer the side with the LOWER
    index when distances are equal (matches stable sort over concat when
    indices on each side are locally ascending but interleaved globally).
    """
    def cmpx(d_a, i_a, d_b, i_b):
        # returns (min-side, max-side) with lowest-index-on-tie
        take_a = (d_a < d_b) | ((d_a == d_b) & (i_a <= i_b))
        lo_d = jnp.where(take_a, d_a, d_b)
        lo_i = jnp.where(take_a, i_a, i_b)
        hi_d = jnp.where(take_a, d_b, d_a)
        hi_i = jnp.where(take_a, i_b, i_a)
        return lo_d, lo_i, hi_d, hi_i

    a0d, a1d, a2d = bd[:, 0], bd[:, 1], bd[:, 2]
    a0i, a1i, a2i = bi[:, 0], bi[:, 1], bi[:, 2]
    b0d, b1d, b2d = cd[:, 0], cd[:, 1], cd[:, 2]
    b0i, b1i, b2i = ci[:, 0], ci[:, 1], ci[:, 2]

    # out0 = min(a0, b0); loser plays against next
    o0d, o0i, xd, xi = cmpx(a0d, a0i, b0d, b0i)
    # after taking o0 the remaining candidates for o1 are: loser x, and the
    # head of the list o0 came from. Track both lists' heads explicitly:
    # if o0 was a0 -> heads (a1, b0-loser==x? no)...
    # Simpler: o0 from one side; candidates for o1: x vs (next of o0's side).
    took_a = (a0d < b0d) | ((a0d == b0d) & (a0i <= b0i))
    n1d = jnp.where(took_a, a1d, b1d)
    n1i = jnp.where(took_a, a1i, b1i)
    n2d = jnp.where(took_a, a2d, b2d)
    n2i = jnp.where(took_a, a2i, b2i)
    # x is the other side's head; its tail heads:
    t1d = jnp.where(took_a, b1d, a1d)
    t1i = jnp.where(took_a, b1i, a1i)
    # o1 = min(x, n1)
    o1d, o1i, yd, yi = cmpx(xd, xi, n1d, n1i)
    x_won = (xd < n1d) | ((xd == n1d) & (xi <= n1i))
    # if x won: candidates for o2: n1 (=y) vs t1 ; else: x-loser(y=x? no y==x) ...
    c1d = yd
    c1i = yi
    c2d = jnp.where(x_won, t1d, n2d)
    c2i = jnp.where(x_won, t1i, n2i)
    o2d, o2i, _, _ = cmpx(c1d, c1i, c2d, c2i)
    return (jnp.stack([o0d, o1d, o2d], axis=-1),
            jnp.stack([o0i, o1i, o2i], axis=-1))


def make_three_nn(d2_mode='matmul', merge='sort', src_chunk=2048):
    def three_nn(src_xyz, src_valid, query_xyz):
        n = src_xyz.shape[0]
        sc = min(src_chunk, n)
        n_chunks = (n + sc - 1) // sc
        pad = n_chunks * sc - n
        inv_valid = jnp.where(src_valid, 0.0, _BIG)
        s_xyz = jnp.pad(src_xyz, ((0, pad), (0, 0)))
        s_inv = jnp.pad(inv_valid, (0, pad), constant_values=_BIG)
        q_sq = jnp.sum(jnp.square(query_xyz), axis=-1)
        m = query_xyz.shape[0]

        def step(carry, chunk):
            best_d, best_i = carry
            cs_xyz, cs_inv, base = chunk
            if d2_mode == 'matmul':
                cross = jax.lax.dot_general(
                    query_xyz, cs_xyz.T, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST)
                d2 = (q_sq[:, None] - 2.0 * cross
                      + jnp.sum(jnp.square(cs_xyz), axis=-1)[None, :]) + cs_inv[None]
            else:
                diff = query_xyz[:, None, :] - cs_xyz[None, :, :]
                d2 = jnp.sum(jnp.square(diff), axis=-1) + cs_inv[None]
            cd, ci = chunk_top3(d2, base)
            if merge == 'sort':
                alld = jnp.concatenate([best_d, cd], axis=-1)
                alli = jnp.concatenate([best_i, ci], axis=-1)
                sd, si = jax.lax.sort((alld, alli), num_keys=1, is_stable=True)
                return (sd[:, :3], si[:, :3]), None
            nd, ni = merge_sorted3(best_d, best_i, cd, ci)
            return (nd, ni), None

        init = (jnp.full((m, 3), _BIG, query_xyz.dtype),
                jnp.zeros((m, 3), jnp.int32))
        chunks = (s_xyz.reshape(n_chunks, sc, 3),
                  s_inv.reshape(n_chunks, sc),
                  jnp.arange(n_chunks, dtype=jnp.int32) * sc)
        (best_d, best_i), _ = jax.lax.scan(step, init, chunks)
        return jnp.maximum(best_d, 0.0), jnp.clip(best_i, 0, n - 1)
    return three_nn


def main():
    rng = np.random.RandomState(0)
    for n_src in [22400, 13600, 6720]:
        print(f'--- n_src={n_src}')
        src = jnp.asarray(rng.randn(B, n_src, 3).astype(np.float32) * 15)
        sv = jnp.ones((B, n_src), bool)
        kp = jnp.asarray(rng.randn(B, M, 3).astype(np.float32) * 15)

        ref = None
        for name, kw in [
            ('cur (matmul+sort, 2048)', dict()),
            ('bsub (2048)', dict(d2_mode='bsub')),
            ('net (2048)', dict(merge='net')),
            ('bsub_net (2048)', dict(d2_mode='bsub', merge='net')),
            ('bsub_net (4096)', dict(d2_mode='bsub', merge='net', src_chunk=4096)),
            ('bsub_net (8192)', dict(d2_mode='bsub', merge='net', src_chunk=8192)),
            ('matmul_net (8192)', dict(merge='net', src_chunk=8192)),
        ]:
            fn = jax.jit(jax.vmap(make_three_nn(**kw)))
            out = timeit(name, fn, src, sv, kp)
            if ref is None:
                ref = jax.device_get(out)
            else:
                o = jax.device_get(out)
                agree = float(np.mean(o[1] == ref[1]))
                if agree < 1.0:
                    print(f'    !! index agreement {agree:.6f}')

        # approx reference point
        def approx(s, v, q):
            inv = jnp.where(v, 0.0, _BIG)
            d2 = (jnp.sum(jnp.square(q), -1)[:, None] - 2.0 * q @ s.T
                  + jnp.sum(jnp.square(s), -1)[None, :]) + inv[None]
            vals, idx = jax.lax.approx_min_k(d2, k=8, recall_target=0.99,
                                             aggregate_to_topk=True)
            return jnp.maximum(vals[:, :3], 0.0), idx[:, :3]
        timeit('approx_min_k k=8', jax.jit(jax.vmap(approx)), src, sv, kp)


if __name__ == '__main__':
    main()
