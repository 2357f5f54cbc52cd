"""Stage-wise ablation of the MGAF-3DSSD infer-program compile time.

BENCH_r03 measured 620 s of XLA compile for the full MGAF eval program while
the isolated DCN forward compiles in ~3 s — this tool bisects where the time
goes by compiling cumulative prefixes of the module pipeline (cache disabled).

MEASURED 2026-08-20 (round 4), real v5e chip, cold cache: backbone 0.7 s,
bev 35.0 s, head 22.8 s, full_nodcn 18.7 s, full 19.8 s — the r3 pathology
does NOT reproduce against the current axon runtime; the whole program is
back in the 20-35 s band (r2 levels), DCN included. The 620 s spike was a
property of the 2026-08-19 runtime build, not of the program. The guard
that keeps this from silently recurring is tools/verify_warm_cache.py's
<60 s bound, run against the committed cache from a clean process.

Usage: python tools/exp_mgaf_compile.py [stage ...]
  stages: backbone bev head full full_nodcn
"""
import os
import sys
import time
from pathlib import Path

os.environ.setdefault('FV2P_JAX_CACHE_DIR', '')
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import flax.linen as nn
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from fv2p_tpu.models.detectors.detector3d_template import MGAF3DSSD

CFG = 'tools/cfgs/kitti_models/MGAF-3DSSD/mgaf-3dssd.yaml'


class AblatedMGAF(MGAF3DSSD):
    n_modules: int = 99
    post: bool = True

    @nn.compact
    def __call__(self, batch_dict, *, train: bool = False):
        for module in self.build_module_list()[:self.n_modules]:
            batch_dict = module(batch_dict, train=train)
        if self.post:
            batch_dict.update(self.post_processing_withfgscores(batch_dict))
        return {k: v for k, v in batch_dict.items()
                if isinstance(v, jnp.ndarray)
                and jnp.issubdtype(v.dtype, jnp.floating)}


def run_stage(name, n_modules, post, use_dcn=True):
    import fv2p_tpu.config as config
    from fv2p_tpu.datasets import dataset_meta_from_cfg
    raw = config.EasyDict()
    config.cfg_from_yaml_file(str(ge.REPO / CFG), raw)
    if not use_dcn:
        raw.MODEL.BACKBONE_2D.USE_DCN = False
        raw.MODEL.DENSE_HEAD.USE_DCN = False
    meta = dataset_meta_from_cfg(raw.DATA_CONFIG, 'train')
    from fv2p_tpu.config import StaticConfig
    model = AblatedMGAF(model_cfg=StaticConfig(raw.MODEL), num_class=1,
                        class_names=('Car',), dataset_meta=meta,
                        compute_dtype=jnp.bfloat16,
                        n_modules=n_modules, post=post)
    batch = ge._synthetic_batch(meta, 4, 16000, 14000, with_gt=False,
                                host_rulebooks=True,
                                backbone='VoxelResBackBone8x')
    init_fn = jax.jit(lambda rng, b: model.init(rng, b, train=False))
    variables = init_fn(jax.random.PRNGKey(0), dict(batch))

    def infer(variables, batch):
        return model.apply(variables, dict(batch), train=False)

    jf = jax.jit(infer)
    t0 = time.time()
    lowered = jf.lower(variables, batch)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    # the axon backend DEFERS the real compile/load to the first execution:
    # .compile() returns in ~20 s while the first run of the full MGAF
    # program takes 600-1550 s (measured r5, tools/exp_first_exec.py) — the
    # r4 conclusion 'the spike does not reproduce' timed only .compile() and
    # was wrong. First-exec time is the number that matters.
    t0 = time.time()
    out = compiled(variables, batch)
    s = sum(float(jnp.sum(jnp.abs(v.astype(jnp.float32))))
            for v in list(out.values())[:2])
    t_first = time.time() - t0
    t0 = time.time()
    out = compiled(variables, batch)
    sum(float(jnp.sum(jnp.abs(v.astype(jnp.float32))))
        for v in list(out.values())[:2])
    t_steady = time.time() - t0
    print(f'{name:12s} lower={t_lower:6.2f}s compile={t_compile:8.2f}s '
          f'first_exec={t_first:8.2f}s steady={t_steady:6.2f}s',
          flush=True)


STAGES = {
    # module list for MGAF: [vfe, backbone_3d, map_to_bev, backbone_2d, dense_head]
    'backbone': dict(n_modules=2, post=False),
    'bev': dict(n_modules=4, post=False),
    'head': dict(n_modules=5, post=False),
    'full': dict(n_modules=5, post=True),
    'full_nodcn': dict(n_modules=5, post=True, use_dcn=False),
}


def main():
    names = sys.argv[1:] or list(STAGES)
    print(f'# device={jax.devices()[0].device_kind}')
    for name in names:
        run_stage(name, **STAGES[name])


if __name__ == '__main__':
    main()
