"""Does the cache key of a bench program depend on what was traced/compiled
before it in the same process?  Runs MGAF-infer then FV2P-infer in bench.py
order in ONE process (like bench.py / the harvest do), captures the REAL key
via a ``compiler._cache_read`` hook, and aborts each compile on miss.  Also
dumps each lowered module text for diffing against single-program runs.

Usage: python tools/exp_key_order.py [outdir]
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CFGS = [
    ('mgaf', 'tools/cfgs/kitti_models/MGAF-3DSSD/mgaf-3dssd.yaml', 0),
    ('fv2p', 'tools/cfgs/kitti_models/FV2P/fv2p.yaml', 18000),
]
import os
if os.environ.get('ONLY'):
    CFGS = [c for c in CFGS if c[0] == os.environ['ONLY']]


class _Abort(Exception):
    pass


def main():
    outdir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path('/tmp/keyorder')
    outdir.mkdir(parents=True, exist_ok=True)

    from fv2p_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    from jax._src import compiler

    import __graft_entry__ as ge

    committed = {p.name for p in (REPO / 'artifacts' / 'bench_cache').iterdir()}
    orig = compiler._cache_read
    seen = {}

    def spy(module_name, cache_key, compile_options, backend,
            executable_devices):
        if 'infer' in module_name:
            seen[module_name] = cache_key
            raise _Abort(cache_key)
        return orig(module_name, cache_key, compile_options, backend,
                    executable_devices)

    compiler._cache_read = spy

    for name, cfg_path, n_points in CFGS:
        cfg, model, variables, batch = ge._flagship(
            batch_size=4, n_cap=16000, n_fill=14000,
            compute_dtype=jnp.bfloat16, cfg_path=cfg_path, n_points=n_points)
        batch.pop('gt_boxes')

        def infer(variables, batch):
            out = model.apply(variables, dict(batch), train=False)
            return out['pred_boxes'], out['pred_scores'], out['pred_labels']

        jitted = jax.jit(infer)
        (outdir / f'{name}.mlir').write_text(jitted.lower(variables, batch).as_text())
        key = None
        try:
            jitted(variables, batch)
        except Exception as e:
            inner = e
            while inner is not None and not isinstance(inner, _Abort):
                inner = inner.__cause__ or inner.__context__
            if inner is None:
                raise
            key = str(inner.args[0])
        fname = f'{key}-cache'
        print(f'{name}: key={key} committed={fname in committed}', flush=True)


if __name__ == '__main__':
    main()
