"""Per-stage inference timing for the flagship MGAF-3DSSD pipeline on the
real TPU. Each stage is jitted cumulatively (vfe -> +backbone3d -> +bev ->
full) so stage cost = difference of consecutive cumulative times. Scalar
fetch is used as the synchronization barrier (axon's block_until_ready does
not synchronize)."""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

import __graft_entry__ as ge


def force(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, 'dtype') and jnp.issubdtype(l.dtype, jnp.inexact)]
    return float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves[:3]))


def timeit(fn, *args, iters=20):
    out = fn(*args); force(out)          # compile
    force(fn(*args))                     # warm cache
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.time() - t0) / iters


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument('--model', choices=['mgaf', 'fv2p'], default='mgaf')
    parser.add_argument('--batch_size', type=int, default=4)
    args = parser.parse_args()

    batch_size = args.batch_size
    if args.model == 'fv2p':
        cfg, model, variables, batch = ge._flagship(
            batch_size=batch_size, n_cap=16000, n_fill=14000,
            compute_dtype=jnp.bfloat16,
            cfg_path='tools/cfgs/kitti_models/FV2P/fv2p.yaml',
            n_points=18000)
    else:
        cfg, model, variables, batch = ge._flagship(
            batch_size=batch_size, n_cap=16000, n_fill=14000,
            compute_dtype=jnp.bfloat16)
    batch.pop('gt_boxes')

    import dataclasses

    import flax.linen as nn

    # a detector subclass that stops after the first `prefix_k` modules;
    # module names (and hence param paths) match the full model, and flax
    # ignores the unused extra params during apply.
    seen_names = []

    class PrefixDetector(type(model)):
        prefix_k: int = 0

        @nn.compact
        def __call__(self, batch_dict, *, train=False):
            mods = self.build_module_list()
            if not seen_names:
                seen_names.extend(type(m).__name__ for m in mods)
            for m in mods[:self.prefix_k]:
                batch_dict = m(batch_dict, train=train)
            return batch_dict

    fields = {f.name: getattr(model, f.name)
              for f in dataclasses.fields(model)
              if f.name not in ('parent', 'name', 'prefix_k')}

    def run_prefix(k):
        prefix_model = PrefixDetector(prefix_k=k, **fields)
        return jax.jit(lambda v, b: prefix_model.apply(v, dict(b), train=False))

    # trace once (k=0) to discover module names
    run_prefix(0)(variables, dict(batch))
    names = list(seen_names)
    modules = names
    print('modules:', names)

    @jax.jit
    def full(variables, batch):
        return model.apply(variables, dict(batch), train=False)

    prev = 0.0
    for k in range(1, len(modules) + 1):
        try:
            t = timeit(run_prefix(k), variables, dict(batch))
        except Exception as e:
            print(f'prefix {k} ({names[k-1]}): FAILED {type(e).__name__}: {e}')
            continue
        print('after %-28s cum=%7.2fms  stage=%7.2fms'
              % (names[k - 1], t * 1e3, (t - prev) * 1e3))
        prev = t

    t = timeit(full, variables, dict(batch))
    print('full pipeline (incl. decode+NMS): %7.2fms  stage=%7.2fms'
          % (t * 1e3, (t - prev) * 1e3))
    print('scans/sec/chip: %.2f' % (batch_size / t))


if __name__ == '__main__':
    main()
