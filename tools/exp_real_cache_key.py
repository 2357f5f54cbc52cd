"""Print the REAL persistent-cache key of a bench program by hooking jax's
own ``_cache_read`` — the exact key the driver bench will look up — and
abort before the (25-min, for MGAF) compile starts on a miss.

Usage:  python tools/exp_real_cache_key.py [mgaf|fv2p]
Prints: REAL_KEY <module_name> <key> and whether artifacts/bench_cache has it.
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CFGS = {
    'mgaf': ('tools/cfgs/kitti_models/MGAF-3DSSD/mgaf-3dssd.yaml', 0),
    'fv2p': ('tools/cfgs/kitti_models/FV2P/fv2p.yaml', 18000),
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else 'mgaf'

    from fv2p_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    from jax._src import compiler

    committed = {p.name for p in (REPO / 'artifacts' / 'bench_cache').iterdir()}
    orig = compiler._cache_read

    def spy(module_name, cache_key, compile_options, backend,
            executable_devices):
        if 'infer' in module_name:
            fname = f'{module_name}-{cache_key}-cache'
            print(f'REAL_KEY {module_name} {cache_key} '
                  f'committed_hit={fname in committed}', flush=True)
            import os
            os._exit(0)          # don't fall through into the compile
        return orig(module_name, cache_key, compile_options, backend,
                    executable_devices)

    compiler._cache_read = spy

    import __graft_entry__ as ge
    cfg_path, n_points = CFGS[name]
    cfg, model, variables, batch = ge._flagship(
        batch_size=4, n_cap=16000, n_fill=14000,
        compute_dtype=jnp.bfloat16, cfg_path=cfg_path, n_points=n_points)
    batch.pop('gt_boxes')

    @jax.jit
    def infer(variables, batch):
        out = model.apply(variables, dict(batch), train=False)
        return out['pred_boxes'], out['pred_scores'], out['pred_labels']

    infer(variables, batch)
    print('NO infer cache lookup happened (cache disabled?)')
    return 1


if __name__ == '__main__':
    sys.exit(main())
