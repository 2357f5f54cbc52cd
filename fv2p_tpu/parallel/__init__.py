"""Multi-chip scaling (TPU-native replacement for the reference's NCCL DDP,
``tools/train.py:164-166`` / ``common_utils.py:125-165``).

Data parallelism over a 1-D ``jax.sharding.Mesh``: every batch array has the
sample axis leading, so the batch shards as P('data') while params/opt-state
stay replicated. The per-device step runs the full model on its local
sub-batch via ``shard_map`` (no cross-device sorts inside the sparse engine)
and gradients ride ICI through ``jax.lax.pmean`` — the XLA analogue of DDP's
allreduce. Multi-host extends the same mesh over DCN via
``jax.distributed.initialize``."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(devices=None):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_spec(batch):
    """PartitionSpec pytree: shard every batch array along its sample axis
    (all batch leaves, including nested rulebook tables, are B-leading)."""
    return jax.tree_util.tree_map(lambda _: P(DATA_AXIS), batch)


def replicate_spec(tree):
    return jax.tree_util.tree_map(lambda _: P(), tree)


def shard_batch(mesh, batch):
    """Device-put a host batch with samples sharded across the mesh."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(lambda v: jax.device_put(v, sharding), batch)


def shard_batch_global(mesh, batch):
    """Multi-process-safe sharding: every process holds the FULL global batch
    (numpy) and contributes only its addressable shards. Works identically in
    single-process mode, so callers need no process-count branching."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def put(v):
        v = np.asarray(v)
        return jax.make_array_from_callback(v.shape, sharding,
                                            lambda idx: v[idx])

    return jax.tree_util.tree_map(put, batch)


def replicate_global(mesh, tree):
    """Replicate host values over a (possibly multi-process) mesh. Every
    process must pass identical values (same seeds), as NCCL DDP assumes."""
    sharding = NamedSharding(mesh, P())

    def put(v):
        v = np.asarray(v)
        return jax.make_array_from_callback(v.shape, sharding,
                                            lambda idx: v[idx])

    return jax.tree_util.tree_map(put, tree)


def make_dp_train_step(model, mesh):
    """Jitted data-parallel train step over the mesh.

    Per-device: full model forward/backward on the local sub-batch;
    cross-device: pmean of grads/metrics/batch-stats inside shard_map.
    """
    from jax import shard_map

    from ..train_utils.train_state import make_train_step

    per_device_step = make_train_step(model, axis_name=DATA_AXIS)

    def step(state, batch):
        sharded = shard_map(
            per_device_step, mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: P(), state),
                      batch_spec(batch)),
            out_specs=(jax.tree_util.tree_map(lambda _: P(), state), P()),
            check_vma=False)
        return sharded(state, batch)

    return jax.jit(step)


def make_dp_eval_step(model, mesh):
    from jax import shard_map

    def per_device(variables, batch):
        return model.apply(variables, dict(batch), train=False)

    def step(variables, batch):
        sharded = shard_map(
            per_device, mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: P(), variables),
                      batch_spec(batch)),
            out_specs=P(DATA_AXIS),
            check_vma=False)
        return sharded(variables, batch)

    return jax.jit(step)
