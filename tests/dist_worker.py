"""Worker process for the multi-process data-parallel test.

Launched by tests/test_distributed.py with the dist_train.sh coordinator
contract (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) and
4 virtual CPU devices per process. Forms the global 8-device mesh with
``jax.distributed.initialize``, runs ONE data-parallel train step on a
deterministic tiny-MGAF batch, and prints the metrics as one JSON line —
the parent asserts both ranks agree with the single-process 8-device run
(reference DDP surface: ``common_utils.py:125-165`` + dist_train.sh).
"""
import json
import os
import sys
from pathlib import Path

_DEV_PER_PROC = int(os.environ.get('DIST_DEVICES_PER_PROC', '4'))
xla_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags +
        f' --xla_force_host_platform_device_count={_DEV_PER_PROC}').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

jax.config.update('jax_platforms', 'cpu')

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from fv2p_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def run_one_step(global_batch_size=8):
    """Build the model, run one DP train step over all global devices.

    DIST_MODE=flagship uses the real mgaf-3dssd.yaml topology with reduced
    caps (tests/flagship_mesh.py); default is the tiny-MGAF config.
    Returns {'loss': float, 'grad_norm': float, 'param_sum': float}. Pure
    function of the fixed seeds — identical across ranks and process counts.
    """
    import numpy as np

    import __graft_entry__ as ge
    from fv2p_tpu.config import EasyDict
    from fv2p_tpu.datasets import dataset_meta_from_cfg
    from fv2p_tpu.models import build_network
    from fv2p_tpu.parallel import (make_dp_train_step, make_mesh,
                                   replicate_global, shard_batch_global)
    from fv2p_tpu.train_utils.optimization import build_optimizer
    from fv2p_tpu.train_utils.train_state import create_train_state

    mode = os.environ.get('DIST_MODE')
    if mode in ('flagship', 'fv2p_flagship'):
        from tests.flagship_mesh import build_flagship_reduced
        _, model, batch_np = build_flagship_reduced(
            split='train', batch_size=len(jax.devices()), with_gt=True,
            flagship='fv2p' if mode == 'fv2p_flagship' else 'mgaf')
    else:
        from tests.test_mgaf_model import TINY_DATA_CFG, TINY_MODEL_CFG
        meta = dataset_meta_from_cfg(TINY_DATA_CFG, 'train')
        model = build_network(TINY_MODEL_CFG, num_class=1,
                              class_names=['Car'], dataset_meta=meta)
        batch = ge._synthetic_batch(meta, batch_size=global_batch_size,
                                    n_cap=64, n_fill=48, with_gt=True,
                                    max_objs=10)
        batch_np = {k: np.asarray(v) for k, v in batch.items()}
    rngs = {'params': jax.random.PRNGKey(0),
            'sampling': jax.random.PRNGKey(1),
            'dropout': jax.random.PRNGKey(2)}
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=True))(
            rngs, jax.tree_util.tree_map(lambda v: v[:1], batch_np))
    variables = jax.tree_util.tree_map(np.asarray, variables)
    optim_cfg = EasyDict({
        'OPTIMIZER': 'adam_onecycle', 'LR': 0.003, 'WEIGHT_DECAY': 0.01,
        'MOMENTUM': 0.9, 'MOMS': [0.95, 0.85], 'PCT_START': 0.4,
        'DIV_FACTOR': 10, 'GRAD_NORM_CLIP': 10,
    })
    state = create_train_state(model, variables, build_optimizer(optim_cfg, 100))

    mesh = make_mesh(jax.devices())
    state = replicate_global(mesh, jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, 'shape') else x, state))
    step = make_dp_train_step(model, mesh)
    sharded = shard_batch_global(mesh, batch_np)
    # AOT-compile before touching any collective, then meet at a pure
    # coordination-service barrier: the first Gloo execution has a ~30 s
    # key-exchange window, far shorter than the compile-time skew between
    # ranks on a loaded host (observed flake: GetKeyValue DEADLINE_EXCEEDED
    # while the other rank was still compiling).
    compiled = step.lower(state, sharded).compile()
    from jax._src import distributed
    if distributed.global_state.client is not None:
        distributed.global_state.client.wait_at_barrier(
            'fv2p_dist_precompile', timeout_in_ms=1_200_000)
    new_state, metrics = compiled(state, sharded)
    psum = sum(float(jax.numpy.sum(jax.numpy.abs(x.astype(jax.numpy.float32))))
               for x in jax.tree_util.tree_leaves(new_state.params))
    return {'loss': float(metrics['loss']),
            'grad_norm': float(metrics['grad_norm']),
            'param_sum': psum}


def main():
    jax.distributed.initialize(
        coordinator_address=os.environ['JAX_COORDINATOR_ADDRESS'],
        num_processes=int(os.environ['JAX_NUM_PROCESSES']),
        process_id=int(os.environ['JAX_PROCESS_ID']))
    n = int(os.environ['JAX_NUM_PROCESSES']) * _DEV_PER_PROC
    assert len(jax.devices()) == n, jax.devices()
    out = run_one_step()
    out['process_id'] = jax.process_index()
    out['n_devices'] = len(jax.devices())
    print('DIST_RESULT ' + json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
