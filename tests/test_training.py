"""Training stack tests: OneCycle schedule parity, single-device train step,
and 8-virtual-device data-parallel step."""
import jax
import jax.numpy as jnp
import numpy as np

from fv2p_tpu.train_utils import optimization
from fv2p_tpu.train_utils.train_state import create_train_state, make_train_step
from tests.jitu import jinit


def _ref_annealing_cos(start, end, pct):
    return end + (start - end) / 2 * (np.cos(np.pi * pct) + 1)


def test_one_cycle_schedule_matches_reference():
    total, lr_max, div, pct_start = 100, 0.01, 10.0, 0.4
    sched = optimization.one_cycle_lr_schedule(lr_max, div, pct_start, total)
    a1 = int(total * pct_start)
    low = lr_max / div
    for step in [0, 10, 39, 40, 41, 70, 99]:
        if step < a1:
            expect = _ref_annealing_cos(low, lr_max, step / a1)
        else:
            expect = _ref_annealing_cos(lr_max, low / 1e4, (step - a1) / (total - a1))
        got = float(sched(step))
        assert abs(got - expect) < 1e-7, (step, got, expect)


def test_one_cycle_mom_schedule():
    sched = optimization.one_cycle_mom_schedule((0.95, 0.85), 0.4, 100)
    assert abs(float(sched(0)) - 0.95) < 1e-6
    assert abs(float(sched(40)) - 0.85) < 1e-2
    assert abs(float(sched(99)) - 0.95) < 1e-2


def _tiny_setup():
    from tests.test_mgaf_model import TINY_MODEL_CFG, make_batch
    from fv2p_tpu.models import build_network
    from fv2p_tpu.config import EasyDict

    batch, meta = make_batch()
    model = build_network(TINY_MODEL_CFG, num_class=1, class_names=['Car'],
                         dataset_meta=meta)
    variables = jinit(model, jax.random.PRNGKey(0), dict(batch), train=True)
    optim_cfg = EasyDict({
        'OPTIMIZER': 'adam_onecycle', 'LR': 0.003, 'WEIGHT_DECAY': 0.01,
        'MOMENTUM': 0.9, 'MOMS': [0.95, 0.85], 'PCT_START': 0.4,
        'DIV_FACTOR': 10, 'GRAD_NORM_CLIP': 10,
    })
    tx = optimization.build_optimizer(optim_cfg, total_steps=10)
    state = create_train_state(model, variables, tx)
    return model, state, batch


def test_train_step_updates_params():
    model, state, batch = _tiny_setup()
    step = jax.jit(make_train_step(model))
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics['loss']))
    assert np.isfinite(float(metrics['grad_norm']))
    # params changed
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    # a second step also runs (donated state compatible)
    state2, m2 = step(new_state, batch)
    assert np.isfinite(float(m2['loss']))


def test_data_parallel_step_8dev():
    from fv2p_tpu.parallel import make_dp_train_step, make_mesh, shard_batch
    from tests.test_mgaf_model import TINY_MODEL_CFG, make_batch
    from fv2p_tpu.models import build_network
    from fv2p_tpu.config import EasyDict
    from fv2p_tpu.train_utils.optimization import build_optimizer

    assert len(jax.devices()) == 8
    batch, meta = make_batch(batch_size=8, n_cap=64)
    model = build_network(TINY_MODEL_CFG, num_class=1, class_names=['Car'],
                         dataset_meta=meta)
    variables = jinit(model, jax.random.PRNGKey(0), dict(batch), train=True)
    optim_cfg = EasyDict({
        'OPTIMIZER': 'adam_onecycle', 'LR': 0.003, 'WEIGHT_DECAY': 0.01,
        'MOMENTUM': 0.9, 'MOMS': [0.95, 0.85], 'PCT_START': 0.4,
        'DIV_FACTOR': 10, 'GRAD_NORM_CLIP': 10,
    })
    state = create_train_state(model, variables, build_optimizer(optim_cfg, 10))

    mesh = make_mesh()
    step = make_dp_train_step(model, mesh)
    sharded = shard_batch(mesh, batch)
    new_state, metrics = step(state, sharded)
    assert np.isfinite(float(metrics['loss']))
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0

    # DDP equivalence: the DP loss is the pmean of per-device losses, each
    # normalized by its LOCAL foreground counts — exactly the reference's
    # DDP loss-averaging semantics (NOT a global-batch single-device loss,
    # which normalizes by global counts). Verify against per-shard
    # single-device steps on the same sub-batches.
    single_step = jax.jit(make_train_step(model))
    shard_losses = []
    for i in range(8):
        sub = {k: (v[i:i + 1] if not isinstance(v, dict)
                   else {kk: vv[i:i + 1] for kk, vv in v.items()})
               for k, v in batch.items()}
        _, m_i = single_step(state, sub)
        shard_losses.append(float(m_i['loss']))
    np.testing.assert_allclose(float(metrics['loss']),
                               np.mean(shard_losses), rtol=1e-4)


def test_overfit_sanity_loss_decreases():
    """Learning-sanity gate (VERDICT r1): repeated steps on one planted-object
    batch must cut the loss substantially — params merely *changing* is not
    evidence the detector can learn."""
    from fv2p_tpu.config import EasyDict
    from fv2p_tpu.models import build_network
    from tests.test_mgaf_model import TINY_MODEL_CFG, make_batch

    batch, meta = make_batch()
    model = build_network(TINY_MODEL_CFG, num_class=1, class_names=['Car'],
                         dataset_meta=meta)
    variables = jinit(model, jax.random.PRNGKey(0), dict(batch), train=True)
    optim_cfg = EasyDict({'OPTIMIZER': 'adam', 'LR': 0.003,
                          'WEIGHT_DECAY': 0.0, 'GRAD_NORM_CLIP': 10})
    state = create_train_state(
        model, variables, optimization.build_optimizer(optim_cfg, 100))
    step = jax.jit(make_train_step(model))

    first = None
    for _ in range(40):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics['loss'])
    last = float(metrics['loss'])
    assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)
