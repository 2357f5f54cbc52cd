"""Train state + jitted train/eval step factories.

Replaces the reference's imperative loop body (``tools/train_utils/
train_utils.py:9-67``: forward, backward, clip, step) with a pure function
``state, batch -> state, metrics`` suitable for jit / shard_map."""
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state as flax_train_state

from ..models.detectors.detector3d_template import compute_training_loss


class TrainState(flax_train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, variables, tx):
    return TrainState.create(
        apply_fn=model.apply, params=variables['params'], tx=tx,
        batch_stats=variables.get('batch_stats', {}))


def make_train_step(model, axis_name=None):
    """Build the per-device train step. If ``axis_name`` is set, gradients and
    metrics are pmean-ed over that mesh axis (data parallelism; the reference
    relies on DDP allreduce, ``tools/train.py:166``)."""

    def train_step(state, batch):
        # per-step deterministic rngs for roi sampling / dropout (two-stage
        # heads; reference seeds torch's global generator per worker)
        base = jax.random.fold_in(jax.random.PRNGKey(13), state.step)
        rngs = {'sampling': jax.random.fold_in(base, 0),
                'dropout': jax.random.fold_in(base, 1)}

        def loss_fn(params):
            out, mutated = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                dict(batch), train=True, mutable=['batch_stats'], rngs=rngs)
            loss, tb = compute_training_loss(model, out)
            return loss, (tb, mutated['batch_stats'])

        (loss, (tb, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            tb = jax.lax.pmean(tb, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)

        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        metrics = dict(tb)
        metrics['grad_norm'] = optax.global_norm(grads)
        return state, metrics

    return train_step


def make_eval_step(model):
    def eval_step(variables, batch):
        return model.apply(variables, dict(batch), train=False)

    return eval_step
