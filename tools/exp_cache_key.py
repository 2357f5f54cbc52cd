"""Compute the persistent-compile-cache key of the bench programs WITHOUT
compiling, and compare against the committed warm-cache entry names.

This answers, in ~2 min instead of a 25-min cold compile, whether the next
driver bench will warm-hit — and, run twice, whether the key is even stable
across processes on this backend (VERDICT r4 weak #2: MGAF missed a cache
harvested minutes earlier; FV2P hit in the same bench process).

Usage:  python tools/exp_cache_key.py [mgaf|fv2p|both]
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CFGS = {
    'mgaf': ('tools/cfgs/kitti_models/MGAF-3DSSD/mgaf-3dssd.yaml', 0),
    'fv2p': ('tools/cfgs/kitti_models/FV2P/fv2p.yaml', 18000),
}


def compute_key(name):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax._src import cache_key as ck

    import __graft_entry__ as ge
    cfg_path, n_points = CFGS[name]
    cfg, model, variables, batch = ge._flagship(
        batch_size=4, n_cap=16000, n_fill=14000,
        compute_dtype=jnp.bfloat16, cfg_path=cfg_path, n_points=n_points)
    batch.pop('gt_boxes')

    def infer(variables, batch):
        out = model.apply(variables, dict(batch), train=False)
        return out['pred_boxes'], out['pred_scores'], out['pred_labels']

    lowered = jax.jit(infer).lower(variables, batch)
    mod = lowered.compiler_ir()          # stablehlo mlir module
    exe_args = lowered._lowering.compile_args
    backend = jax.devices()[0].client
    devices = np.array([[jax.devices()[0]]])
    # reproduce jax._src.interpreters.pxla: executable_devices+compile options
    from jax._src.interpreters import pxla
    co = exe_args.get('compile_options') if isinstance(exe_args, dict) else None
    if co is None:
        # build the options the same way UnloadedMeshExecutable does
        import jax._src.compiler as jcompiler
        co = jcompiler.get_compile_options(
            num_replicas=1, num_partitions=1,
            device_assignment=devices)
    key = ck.get(mod, devices, co, backend)
    return key


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'both'
    names = ['mgaf', 'fv2p'] if which == 'both' else [which]
    committed = {p.name for p in (REPO / 'artifacts' / 'bench_cache').iterdir()}
    rc = 0
    for n in names:
        key = compute_key(n)
        fname = f'jit_infer-{key}-cache'
        hit = fname in committed
        print(f'{n}: key={key[:20]}... committed_hit={hit}')
        if not hit:
            rc = 1
    inf = sorted(f for f in committed if f.startswith('jit_infer'))
    print('committed jit_infer entries:', [f[10:30] for f in inf])
    return rc


if __name__ == '__main__':
    sys.exit(main())
