"""Micro-benchmarks of the CenterAF head's pieces at MGAF KITTI shapes
(B=4, 200x176 BEV) to find where the 173ms goes."""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import flax.linen as nn

from fv2p_tpu.ops.dcn import FeatureAdaption

B, H, W = 4, 200, 176
DT = jnp.bfloat16


def force(x):
    return float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32))))


def timeit(fn, *args, iters=30):
    out = fn(*args); force(out)
    force(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.time() - t0) / iters


def bench_module(name, mod, x):
    v = jax.jit(lambda r, x: mod.init(r, x))(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda v, x: mod.apply(v, x))
    t = timeit(f, v, x)
    print('%-32s %8.2fms' % (name, t * 1e3))


class SharedConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=DT)(x)
        x = nn.BatchNorm(use_running_average=True)(x)
        return nn.relu(x)


class FusedHeads(nn.Module):
    @nn.compact
    def __call__(self, x):
        m = nn.Conv(768, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=DT)(x)
        m = nn.BatchNorm(use_running_average=True)(m)
        m = nn.relu(m)
        outs = []
        for i, oc in enumerate([1, 2, 1, 3, 24, 1]):
            outs.append(nn.Conv(oc, (1, 1), dtype=DT)(
                m[..., i * 128:(i + 1) * 128]).astype(jnp.float32))
        return outs


class Adapt(nn.Module):
    @nn.compact
    def __call__(self, x):
        return FeatureAdaption(256, 3, deformable_groups=4, compute_dtype=DT)(x)


def main():
    key = jax.random.PRNGKey(0)
    x768 = jax.random.normal(key, (B, H, W, 768), DT)
    x256 = jax.random.normal(key, (B, H, W, 256), DT)

    bench_module('shared conv 768->256 3x3', SharedConv(), x768)
    bench_module('FeatureAdaption (MDCN) 256ch', Adapt(), x256)
    bench_module('fused heads 256->768 3x3+1x1s', FusedHeads(), x256)


if __name__ == '__main__':
    main()
